"""Spark schemas for the decoded OSM entity tables (SURVEY.md §1.4).

Matches the reference's logical row model (marook/osm-read,
``lib/pbfParser.js:376-391`` nodes, ``:443-473`` ways, ``:486-531``
relations) with two deliberate improvements documented in SURVEY.md §7.4:
ids are true int64 (the reference stringifies through JS doubles,
``lib/pbfParser.js:539-541``) with a string parity column, and emission
order is carried as (block_idx, group_idx, row_idx) lineage columns since
Spark DataFrames are unordered.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# ---- lineage columns shared by all entity tables --------------------------
_LINEAGE = [
    T.StructField("url", T.StringType(), False),
    T.StructField("block_idx", T.IntegerType(), False),
    T.StructField("group_idx", T.IntegerType(), False),
    T.StructField("row_idx", T.IntegerType(), False),
]

_INFO = [
    T.StructField("version", T.IntegerType(), True),
    T.StructField("timestamp_ms", T.LongType(), True),
    T.StructField("changeset", T.LongType(), True),
    T.StructField("uid", T.StringType(), True),
    T.StructField("user", T.StringType(), True),
    T.StructField("visible", T.BooleanType(), True),
]

NODE_SCHEMA = T.StructType(
    _LINEAGE
    + [
        T.StructField("id", T.LongType(), False),
        T.StructField("id_str", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
    + _INFO
)

WAY_SCHEMA = T.StructType(
    _LINEAGE
    + [
        T.StructField("id", T.LongType(), False),
        T.StructField("id_str", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("node_refs", T.ArrayType(T.LongType()), False),
        T.StructField("node_refs_str", T.ArrayType(T.StringType()), False),
    ]
    + _INFO
    + [
        # XML-only Overpass extension (xmlParser.js:105-112)
        T.StructField("center_lat", T.DoubleType(), True),
        T.StructField("center_lon", T.DoubleType(), True),
    ]
)

MEMBER_STRUCT = T.StructType(
    [
        # nullable=True: Arrow StructArray.from_arrays produces nullable
        # children and Spark does not enforce struct-field nullness anyway
        T.StructField("ref", T.StringType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)

RELATION_SCHEMA = T.StructType(
    _LINEAGE
    + [
        T.StructField("id", T.LongType(), False),
        T.StructField("id_str", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("members", T.ArrayType(MEMBER_STRUCT), False),
    ]
    + _INFO
)

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("writingprogram", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("required_features", T.ArrayType(T.StringType()), False),
        T.StructField("optional_features", T.ArrayType(T.StringType()), False),
        T.StructField("bbox_left", T.LongType(), True),
        T.StructField("bbox_right", T.LongType(), True),
        T.StructField("bbox_top", T.LongType(), True),
        T.StructField("bbox_bottom", T.LongType(), True),
    ]
)

BOUNDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("minlat", T.DoubleType(), False),
        T.StructField("minlon", T.DoubleType(), False),
        T.StructField("maxlat", T.DoubleType(), False),
        T.StructField("maxlon", T.DoubleType(), False),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), False),
    ]
)

# Per-row bad-record channel (SURVEY §2.4's Spark mapping of the
# reference's error callback, lib/pbfParser.js:41-47): one row per
# failed blob — the job itself succeeds.
QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("error", T.StringType(), False),
    ]
)


def to_arrow_schema(spark_schema: T.StructType) -> pa.Schema:
    """Arrow schema matching what Spark expects back from mapInArrow."""
    from pyspark.sql.pandas.types import to_arrow_schema as _cvt

    return _cvt(spark_schema)
