"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

BASELINE.json input_hint: ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``. Each page's ``html`` is a valid OSM PBF byte
stream; ``text`` is the canonical extracted text the engine must reproduce
byte-identically from ``html``.

Page 0 embeds the byte-exact reference golden fixture
(``osm-read test/test.pbf``, 558 B — shipped as package data with
provenance noted in FIXTURES.md); page 1 embeds ``manyNodes.pbf`` (3000
nodes). All other pages are seeded synthetic DenseNodes/Ways/Relations
payloads whose coordinates cluster around a fixed set of "cities" with a
Zipf-ish weight so dense grid cells (skew!) exist at every scale.

Generation is itself distributed: ``write_pages`` fans the page-index range
out via ``spark.range(n).mapInPandas`` so a 10^12-row table would be
synthesized by the cluster, not the driver.
"""

from __future__ import annotations

import datetime as dt
from importlib import resources

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import model
from .pbf.encode import build_dense_nodes_block, build_file
from .pbf.source import decode_page, render_text

__all__ = ["CITIES", "golden_pbf_bytes", "many_nodes_pbf_bytes",
           "page_payload", "pages_pandas", "write_pages", "read_pages"]

# (name, lat, lon, weight) — weights deliberately skewed: city 0 draws ~38%
# of all nodes so per-cell tile/join skew is real at every SF.
CITIES: list[tuple[str, float, float, float]] = [
    ("london", 51.5074, -0.1278, 0.38),
    ("paris", 48.8566, 2.3522, 0.17),
    ("nyc", 40.7128, -74.0060, 0.12),
    ("tokyo", 35.6895, 139.6917, 0.09),
    ("berlin", 52.5200, 13.4050, 0.06),
    ("moscow", 55.7558, 37.6173, 0.05),
    ("sydney", -33.8688, 151.2093, 0.04),
    ("saopaulo", -23.5505, -46.6333, 0.03),
    ("cairo", 30.0444, 31.2357, 0.025),
    ("nairobi", -1.2921, 36.8219, 0.02),
    ("reykjavik", 64.1466, -21.9426, 0.01),
    ("ushuaia", -54.8019, -68.3030, 0.005),
]
_CITY_LAT = np.array([c[1] for c in CITIES])
_CITY_LON = np.array([c[2] for c in CITIES])
_CITY_W = np.array([c[3] for c in CITIES])
_CITY_W = _CITY_W / _CITY_W.sum()

_BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
_BASE_TS_MS = 1735689600000  # 2025-01-01T00:00:00Z


def _data_bytes(name: str) -> bytes:
    return (resources.files("osmspark") / "data" / name).read_bytes()


def golden_pbf_bytes() -> bytes:
    """Byte-exact reference golden fixture (osm-read test/test.pbf)."""
    return _data_bytes("osm_golden.pbf")


def many_nodes_pbf_bytes() -> bytes:
    return _data_bytes("many_nodes.pbf")


def page_payload(page_idx: int, nodes_per_page: int, seed: int = 42) -> bytes:
    """Deterministic PBF payload for one page (pure function of args)."""
    if page_idx == 0:
        return golden_pbf_bytes()
    if page_idx == 1:
        return many_nodes_pbf_bytes()
    rng = np.random.default_rng([seed, page_idx])
    n = nodes_per_page
    city = rng.choice(len(CITIES), size=n, p=_CITY_W)
    lat = np.clip(_CITY_LAT[city] + rng.normal(0, 0.02, n), -89.9, 89.9)
    lon = _CITY_LON[city] + rng.normal(0, 0.02, n)
    lon = ((lon + 180.0) % 360.0) - 180.0
    ids = np.int64(page_idx) * np.int64(10_000_000) + np.arange(1, n + 1, dtype=np.int64)
    ts = _BASE_TS_MS + (np.int64(page_idx) * 1000 + np.arange(n, dtype=np.int64)) * 1000
    tags = [
        {"name": f"poi-{page_idx}-{i}", "amenity": ("cafe", "pub", "bank")[i % 3]}
        if i % 8 == 0 else {}
        for i in range(n)
    ]
    n_ways = max(1, n // 50)
    ways = []
    for w in range(n_ways):
        start = (w * 47) % max(1, n - 6)
        ways.append({
            "id": int(ids[0]) + 5_000_000 + w,
            "refs": [int(x) for x in ids[start : start + 5]],
            "tags": {"highway": ("residential", "service", "primary")[w % 3]},
            "info": {"version": 1 + w % 5, "timestamp_ms": int(ts[0]),
                     "changeset": 1000 + w, "uid": 70 + w % 9,
                     "user": f"mapper{w % 9}"},
        })
    relations = [{
        "id": int(ids[0]) + 6_000_000,
        "members": [("node", int(ids[0]), ""), ("way", ways[0]["id"], "outer")],
        "tags": {"type": "route", "route": "bus"},
        "info": {"version": 2, "timestamp_ms": int(ts[0]),
                 "changeset": 999, "uid": 7, "user": "relmapper"},
    }]
    block = build_dense_nodes_block(
        ids, lat, lon,
        timestamps_ms=ts,
        versions=(rng.integers(1, 6, n)).astype(np.int64),
        changesets=np.int64(page_idx) * 100 + (np.arange(n, dtype=np.int64) % 97),
        uids=(np.arange(n, dtype=np.int64) % 211) + 1,
        users=[f"user{i % 211}" for i in range(n)],
        tags=tags,
        ways=ways,
        relations=relations,
    )
    return build_file([block], writingprogram="osmspark-synth")


def _page_row(page_idx: int, nodes_per_page: int, seed: int) -> dict:
    html = page_payload(page_idx, nodes_per_page, seed)
    return {
        "url": f"https://fixture.test/doc/{page_idx}",
        "warc_ts": _BASE_TS + dt.timedelta(seconds=int(page_idx)),
        "html": html,
        # the engine must reproduce this byte-identically from html
        "text": render_text(decode_page(html)),
        "lang": "en",
    }


def pages_pandas(n_pages: int, nodes_per_page: int = 200, seed: int = 42,
                 start: int = 0) -> pd.DataFrame:
    rows = [_page_row(i, nodes_per_page, seed) for i in range(start, start + n_pages)]
    return pd.DataFrame(rows, columns=[f.name for f in model.PAGES_SCHEMA.fields])


def write_pages(spark: SparkSession, path: str, n_pages: int,
                nodes_per_page: int = 200, seed: int = 42,
                partitions: int | None = None) -> None:
    """Distributed deterministic synthesis → parquet at ``path``.

    Fan-out via spark.range: each executor builds its own page range, so
    synthesis scales with the cluster exactly like the real decode does.
    """
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            idxs = pdf["id"].to_numpy()
            yield pd.DataFrame([_page_row(int(i), nodes_per_page, seed) for i in idxs],
                               columns=[f.name for f in model.PAGES_SCHEMA.fields])

    (spark.range(0, n_pages, numPartitions=parts)
          .mapInPandas(gen, model.PAGES_SCHEMA)
          .write.mode("overwrite").parquet(path))


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(model.PAGES_SCHEMA).parquet(path)
