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

__all__ = ["raster_algebra", "regrid_cells"]


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


def _floordiv_sql(a: str, b: int) -> str:
    """Sign-correct integer floor division as dialect-neutral SQL
    (C-style ``%`` truncates toward zero on BOTH engines, so the
    non-negative remainder is ``((a % b) + b) % b``)."""
    r = f"((({a}) % {b}) + {b}) % {b}"
    return f"CAST((({a}) - ({r})) / {b} AS BIGINT)"


def regrid_cells(cells: DataFrame, src_deg: float, dst_deg: float,
                 value_col: str = "n", cx_col: str = "cell_x",
                 cy_col: str = "cell_y") -> DataFrame:
    """Exact area-weighted regridding between two lat/lon cell grids —
    the raster "resample to a new grid" / areal-interpolation
    primitive (census reapportionment, climate regridding): each
    source cell's value spreads over the target cells it overlaps in
    proportion to overlap AREA, under the standard uniform-density
    assumption.

    Exactness: both grid pitches must be exact multiples of 1e-6°
    (validated); all geometry then runs in integer µdeg — overlap
    widths are min/max differences, the per-pair weight is the exact
    integer product value·ox·oy summed in decimal(38,0), and each
    target cell takes ONE integral division ``num div s²`` at the
    end (a single floor per OUTPUT cell, so mass loss is < 1 unit
    per target cell; Σ out ≤ Σ in, equality when the source grid
    refines the target — test-pinned). Negative cell indices use the
    sign-correct floor division (C-style ``%`` is truncation).

    Scale shape: one bounded explode (≤ (s/d + 2)² target candidates
    per source cell — the ratio of pitches, a constant) + one
    combinable groupBy on the target key. Same sparse-raster
    convention as raster_algebra: only overlapped target cells
    appear.
    """
    s = round(src_deg * 1e6)
    d = round(dst_deg * 1e6)
    if not (abs(s - src_deg * 1e6) < 1e-6 and s > 0
            and abs(d - dst_deg * 1e6) < 1e-6 and d > 0):
        raise ValueError("grid pitches must be positive exact "
                         "multiples of 1e-6 degrees")

    def lo(axis: str) -> str:
        return f"({axis} * {s})"

    base = cells.select(F.col(cx_col).alias("sx"),
                        F.col(cy_col).alias("sy"),
                        F.col(value_col).cast("long").alias("v"))
    tx0 = F.expr(_floordiv_sql(lo("sx"), d))
    tx1 = F.expr(_floordiv_sql(f"(sx + 1) * {s} - 1", d))
    ty0 = F.expr(_floordiv_sql(lo("sy"), d))
    ty1 = F.expr(_floordiv_sql(f"(sy + 1) * {s} - 1", d))
    e = (base.withColumn("tx0", tx0).withColumn("tx1", tx1)
         .withColumn("ty0", ty0).withColumn("ty1", ty1)
         .select("sx", "sy", "v", "ty0", "ty1",
                 F.explode(F.sequence("tx0", "tx1")).alias("tx"))
         .select("sx", "sy", "v", "tx",
                 F.explode(F.sequence("ty0", "ty1")).alias("ty")))
    ox = (F.least((F.col("sx") + 1) * s, (F.col("tx") + 1) * d)
          - F.greatest(F.col("sx") * s, F.col("tx") * d))
    oy = (F.least((F.col("sy") + 1) * s, (F.col("ty") + 1) * d)
          - F.greatest(F.col("sy") * s, F.col("ty") * d))
    num = (e.select("tx", "ty",
                    (F.col("v").cast("decimal(38,0)")
                     * (ox * oy).cast("decimal(38,0)")).alias("m"))
           .groupBy("tx", "ty")
           .agg(F.sum("m").alias("num")))
    area = F.lit(s).cast("decimal(38,0)") * F.lit(s).cast("decimal(38,0)")
    n_out = ((F.col("num") - F.col("num") % area) / area).cast("long")
    return num.select(F.col("tx").alias("cell_x"),
                      F.col("ty").alias("cell_y"),
                      n_out.alias("n"))
