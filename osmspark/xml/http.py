"""XML-over-HTTP source (reference S9): fetch OSM XML by URL, decode
through the same page pipeline as file-backed XML.

Mirrors the reference's http source (``lib/xmlParser.js:198-224``:
``http.get`` → buffer the body → parse; a non-200 status becomes an
error delivered to the callback — here a raised :class:`XmlHttpError`),
tested like ``test/xmlHttpTest.js:10-60`` against a local http server.

Two shapes:

* ``xml_pages_from_http`` — DRIVER-side fetch of a small URL list →
  in-memory pages DataFrame (url, html). The reference's exact use case
  (one API URL); feeds every ``*_from_xml_pages`` decoder unchanged.
* ``xml_pages_from_http_distributed`` — the 10^6-URL shape: URLs are a
  DataFrame, the fetch runs executor-side in ``mapInPandas`` (each task
  fetches its partition's URLs), so download bandwidth scales with the
  cluster and no payload ever passes through the driver. Failed URLs
  surface per-row (``error`` column) instead of failing the job —
  at scale a poisoned URL must not kill a million-fetch stage.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["XmlHttpError", "fetch_xml", "xml_pages_from_http",
           "xml_pages_from_http_distributed"]

_TIMEOUT_S = 30


class XmlHttpError(RuntimeError):
    """Non-200 response or transport failure fetching an XML URL."""


def fetch_xml(url: str, timeout: float = _TIMEOUT_S) -> bytes:
    """GET ``url`` → body bytes; non-200 → XmlHttpError (reference
    contract: the parser never sees a partial/error body)."""
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            status = getattr(resp, "status", 200)
            if status != 200:
                raise XmlHttpError(f"unexpected status {status} for {url}")
            return resp.read()
    except urllib.error.HTTPError as e:
        raise XmlHttpError(f"unexpected status {e.code} for {url}") from e
    except urllib.error.URLError as e:
        raise XmlHttpError(f"fetch failed for {url}: {e.reason}") from e


def xml_pages_from_http(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Driver-side fetch → (url, html) pages frame for the XML decoders."""
    rows = [{"url": u, "html": fetch_xml(u)} for u in urls]
    return spark.createDataFrame(pd.DataFrame(rows),
                                 schema="url string, html binary")


def xml_pages_from_http_distributed(url_df: DataFrame,
                                    timeout: float = _TIMEOUT_S) -> DataFrame:
    """Executor-side fetch over a (url) DataFrame → (url, html, error).

    Rows with ``error IS NULL`` feed the decoders; the rest carry the
    failure reason for retry/quarantine — per-partition parallel, no
    driver bottleneck."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for u in pdf["url"]:
                try:
                    out.append({"url": u, "html": fetch_xml(u, timeout),
                                "error": None})
                except XmlHttpError as e:
                    out.append({"url": u, "html": None, "error": str(e)})
            if out:
                yield pd.DataFrame(out)

    return url_df.select("url").mapInPandas(
        fetch, "url string, html binary, error string")
