"""Spark-facing XML extraction — same entity schemas as the PBF path.

Pages whose payload column holds OSM XML bytes decode through
``parse_osm_xml`` inside ``mapInPandas``; the output schemas are identical
to ``osmspark.pbf.source`` so the cross-format parity suite
(reference ``test/xmlPbfTest.js`` runs one assertion set against both
formats) can diff the two DataFrames directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import model
from .decode import parse_osm_xml

__all__ = ["nodes_from_xml_pages", "ways_from_xml_pages",
           "relations_from_xml_pages", "bounds_from_xml_pages"]

_INFO_KEYS = ("version", "timestamp_ms", "changeset", "uid", "user", "visible")


def _lineage(url: str, row_idx: int) -> dict:
    # XML has no blocks/groups; document order is the only order.
    return {"url": url, "block_idx": 0, "group_idx": 0, "row_idx": row_idx}


def _extract(kind: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["html"]):
                doc = parse_osm_xml(bytes(payload))
                for i, e in enumerate(doc[kind]):
                    if kind == "bounds":
                        rows.append({"url": url, **e})
                        continue
                    base = {**_lineage(url, i), "id": e["id"],
                            "id_str": e["id_str"], "tags": e["tags"],
                            **{k: e[k] for k in _INFO_KEYS}}
                    if kind == "ways":
                        base["node_refs"] = e["refs"]
                        base["node_refs_str"] = e["refs_str"]
                        base["center_lat"] = e["center_lat"]
                        base["center_lon"] = e["center_lon"]
                    elif kind == "relations":
                        base["members"] = e["members"]
                    else:
                        base["lat"] = e["lat"]
                        base["lon"] = e["lon"]
                    rows.append(base)
            if rows:
                yield pd.DataFrame(rows)
    return fn


def nodes_from_xml_pages(pages: DataFrame) -> DataFrame:
    return pages.select("url", "html").mapInPandas(_extract("nodes"), model.NODE_SCHEMA)


def ways_from_xml_pages(pages: DataFrame) -> DataFrame:
    return pages.select("url", "html").mapInPandas(_extract("ways"), model.WAY_SCHEMA)


def relations_from_xml_pages(pages: DataFrame) -> DataFrame:
    return pages.select("url", "html").mapInPandas(_extract("relations"), model.RELATION_SCHEMA)


def bounds_from_xml_pages(pages: DataFrame) -> DataFrame:
    return pages.select("url", "html").mapInPandas(_extract("bounds"), model.BOUNDS_SCHEMA)
