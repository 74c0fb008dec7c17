"""Raster map algebra — cell-wise combination of two raster layers
(the GIS "local" operator family: difference, ratio, normalized
difference). The canonical change-detection query: this period's
per-tile counts vs last period's, emitted as one aligned raster.

The reference (marook/osm-read) decodes entities; tile layers built
from them (tiles.raster_tile_counts) are combined here — consumer-side
raster analytics, Spark-native.

Spark-first shape: a single full-outer equi-join on the (zoom, x, y)
tile key with zero-fill on both sides — missing cells are value 0, the
sparse-raster convention, so the output cell set is the UNION of the
two layers' cells and no count silently disappears. Both inputs are
post-aggregation tile tables (≤ 4^zoom rows), so the join is orders of
magnitude below the point tables that produced them; at planet scale
both sides pre-partition on the tile key (the tile_counts output
partitioning), making this join shuffle-free when co-partitioned.

Determinism: counts are int64; ``diff`` is exact; ``ratio`` and
``ndiff`` are a SINGLE IEEE division of two exact integers (NULL where
the denominator is 0) — bit-identical regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["raster_algebra"]


def raster_algebra(a: DataFrame, b: DataFrame,
                   keys: tuple[str, ...] = ("zoom", "tile_x", "tile_y"),
                   value_col: str = "n_points") -> DataFrame:
    """(keys…, n_a, n_b, diff, ratio, ndiff) over the union of cells.

    ``diff`` = n_a − n_b (exact int64); ``ratio`` = n_a / n_b (NULL
    when n_b = 0); ``ndiff`` = (n_a − n_b) / (n_a + n_b) (NULL when
    both are 0 — the NDVI-style normalized difference in [−1, 1]).
    """
    ka = a.select(*keys, F.col(value_col).cast("long").alias("n_a"))
    kb = b.select(*keys, F.col(value_col).cast("long").alias("n_b"))
    j = (ka.join(kb, list(keys), "full_outer")
         .select(*keys,
                 F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
                 F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b")))
    n_a, n_b = F.col("n_a"), F.col("n_b")
    return j.select(
        *keys, "n_a", "n_b",
        (n_a - n_b).alias("diff"),
        F.when(n_b != 0, n_a.cast("double") / n_b.cast("double"))
        .alias("ratio"),
        F.when(n_a + n_b != 0,
               (n_a - n_b).cast("double") / (n_a + n_b).cast("double"))
        .alias("ndiff"))
