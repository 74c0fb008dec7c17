"""Geoparsing — pull coordinates out of web-page payloads.

The webtext→geospatial bridge of this engine: the decode surface
(`osmspark/pbf`, `osmspark/xml`) emits geotagged ENTITIES; real crawl
pages also carry coordinates in their MARKUP — the geotagging meta
standard (``<meta name="geo.position" content="lat;lon">``, also ICBM)
that geo-crawlers index. This extracts them and lands the documents on
the engine's grid, where every spatial operator (tiles, hot spots,
PIP, kNN) applies to DOCUMENTS exactly as to decoded nodes.

Engine-exactness: the pattern anchors fixed-point decimal literals
(``-?\\d+\\.\\d+``), which Spark and DuckDB parse to identical doubles
(shortest-round-trip decimal→binary is IEEE-defined); cell assignment
is the repo-wide ``floor(x/cell)`` on those doubles. The regex uses
only literal/class/quantifier constructs with identical semantics in
Java regex (Spark) and RE2 (DuckDB).

Scale shape: ``regexp_extract_all`` + ``posexplode_outer`` is one
JVM-side projection (no Python, no shuffle); the tile rollup is one
combinable census. Tag order within a page is document order
(posexplode over the match array) — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["extract_geotags", "geotag_tile_counts"]

_GEO_PAT = (r'<meta name="geo\.position" '
            r'content="(-?\d+\.\d+);(-?\d+\.\d+)">')


def extract_geotags(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "html_text",
                    cell_deg: float = 0.5) -> DataFrame:
    """One row per geo.position meta tag per page, in document order,
    with the grid cell attached. Pages without a tag emit no row
    (geoparse is a filter, not an enrichment — use a left join back
    to keep them). Output: (doc_id, tag_pos, lat, lon, cell_x,
    cell_y).
    """
    matches = F.regexp_extract_all(F.col(text_col), F.lit(_GEO_PAT),
                                   F.lit(0))
    t = (docs.select(F.col(id_col).alias("doc_id"),
                     F.posexplode(matches).alias("tag_pos", "m")))
    lat = F.regexp_extract(F.col("m"), _GEO_PAT, 1).cast("double")
    lon = F.regexp_extract(F.col("m"), _GEO_PAT, 2).cast("double")
    inv = F.lit(1.0 / cell_deg)
    return t.select(
        "doc_id", "tag_pos", lat.alias("lat"), lon.alias("lon"),
        F.floor(lon * inv).cast("long").alias("cell_x"),
        F.floor(lat * inv).cast("long").alias("cell_y"))


def geotag_tile_counts(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "html_text",
                       cell_deg: float = 0.5) -> DataFrame:
    """Per-cell geotagged-document census: tag count + DISTINCT page
    count per grid cell (a page tagging the same cell twice is one
    page). Integer-only — the doc-density raster every geo-crawl
    pipeline builds before sampling. Output: (cell_x, cell_y,
    n_tags, n_docs).
    """
    tags = extract_geotags(docs, id_col=id_col, text_col=text_col,
                           cell_deg=cell_deg)
    per_doc = (tags.groupBy("cell_x", "cell_y", "doc_id")
               .agg(F.count(F.lit(1)).alias("c")))
    return (per_doc.groupBy("cell_x", "cell_y")
            .agg(F.sum("c").cast("long").alias("n_tags"),
                 F.count(F.lit(1)).alias("n_docs")))
