"""Inverse-distance-weighted (IDW) grid interpolation — the classic
vector→raster surface estimator: sample points carrying a measurement
are interpolated onto grid-cell centers, each estimate the
distance-weighted mean of the samples in the cell's 3×3 neighborhood.

The reference (marook/osm-read) stops at entity decode; IDW is the
consumer-side raster operator a sensor/telemetry pipeline runs on the
decoded points (air quality, speed probes, signal strength).

Spark-first shape — scatter/gather, one shuffle, all codegen:

1. Each sample quantizes to 1e-6° integers and SCATTERS to its own
   cell plus the 8 neighbors (a 9-element literal offset array +
   explode — the kring_smooth idiom, tiles.py:202). The neighborhood
   is bounded, so output fan-out is a constant 9×, never points².
2. Per (target cell, sample): the squared planar distance to the CELL
   CENTER in 1e-6° units is an exact int64 (max 2·(1.5·cell)² ≈
   1.1e12 for 0.5° cells), and the weight is the exact integer
   ``SCALE DIV (1 + d²)`` — the fixed-point rendering of the IDW
   power-2 kernel 1/d². SCALE=10^15 keeps every weight ≥ 888 at 0.5°
   cells, so far samples still contribute (no silent zero-weights).
3. ONE groupBy on the target cell sums ``w·v`` and ``w`` through
   decimal(38,0) (order-insensitive, overflow→NULL never wraps — the
   autocorr.py discipline) and the estimate is a single final
   ``num/den`` double division of two exact integers — bit-identical
   regardless of partitioning, and reproducible by any engine with
   exact integer sums (the DuckDB oracle).

At 10^12 samples the only shuffle key is the grid cell; dense-city
skew on the cell key is the standard tile-agg skew AQE already
handles (salting hooks in tiles.py apply unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["idw_grid"]


def idw_grid(samples: DataFrame, cell_deg: float = 0.5,
             scale: int = 10 ** 15, lat_col: str = "lat",
             lon_col: str = "lon", value_col: str = "value_int",
             ) -> DataFrame:
    """(cell_x, cell_y, n_samples, idw) per populated-neighborhood cell.

    ``value_col`` must be integral (callers fix the measurement's
    precision up front, e.g. ``floor(value*1000)``) so the weighted
    numerator is exact. ``cell_deg``·1e6 must be integral (the cell
    center is then an exact 1e-6° integer).
    """
    cell_e6 = round(cell_deg * 1e6)
    if abs(cell_e6 - cell_deg * 1e6) > 1e-9 or cell_e6 <= 0:
        raise ValueError(f"cell_deg*1e6 must be a positive integer, "
                         f"got {cell_deg}")
    half = cell_e6 // 2

    lat_e6 = F.round(F.col(lat_col) * 1e6).cast("long")
    lon_e6 = F.round(F.col(lon_col) * 1e6).cast("long")
    pts = samples.select(
        lat_e6.alias("y_e6"), lon_e6.alias("x_e6"),
        F.col(value_col).cast("long").alias("v"),
        F.floor(lat_e6 / F.lit(cell_e6)).cast("long").alias("sy"),
        F.floor(lon_e6 / F.lit(cell_e6)).cast("long").alias("sx"))

    offsets = F.array(*[F.struct(F.lit(dx).cast("long").alias("dx"),
                                 F.lit(dy).cast("long").alias("dy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    scat = (pts.withColumn("_o", F.explode(offsets))
            .withColumn("cell_x", F.col("sx") + F.col("_o.dx"))
            .withColumn("cell_y", F.col("sy") + F.col("_o.dy")))

    cx = F.col("cell_x") * F.lit(cell_e6) + F.lit(half)
    cy = F.col("cell_y") * F.lit(cell_e6) + F.lit(half)
    d2 = ((F.col("x_e6") - cx) * (F.col("x_e6") - cx)
          + (F.col("y_e6") - cy) * (F.col("y_e6") - cy))
    w = F.expr(f"CAST({scale} AS BIGINT) DIV (1 + _d2)")
    weighted = (scat.withColumn("_d2", d2).withColumn("_w", w)
                .select("cell_x", "cell_y",
                        F.col("_w").cast("decimal(38,0)").alias("w_d"),
                        (F.col("_w").cast("decimal(38,0)")
                         * F.col("v").cast("decimal(38,0)")).alias("wv_d")))

    return (weighted.groupBy("cell_x", "cell_y")
            .agg(F.count(F.lit(1)).alias("n_samples"),
                 F.sum("wv_d").alias("_num"),
                 F.sum("w_d").alias("_den"))
            .select("cell_x", "cell_y", "n_samples",
                    (F.col("_num").cast("double")
                     / F.col("_den").cast("double")).alias("idw")))
