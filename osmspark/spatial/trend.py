"""Per-cell temporal activity trend — exact OLS over daily counts.

"Which tiles are growing?" — the change-detection companion to the
hot-spot statistics (`autocorr.py` answers WHERE activity clusters;
this answers where it is MOVING). For each grid cell, fit ordinary
least squares y = a + b·x over its (day, event-count) series and
report the slope (events/day) and intercept.

Exactness: with integer day indices x and integer counts y, both OLS
closed forms are ratios of exact integer moments —

    b = (n·Σxy − Σx·Σy) / D        D = n·Σx² − (Σx)²
    a = (Σy·Σx² − Σx·Σxy) / D

so every cross-shuffle sum is int64/decimal(38,0)-exact
(order-insensitive, engine-portable) and each coefficient is ONE float
division of identical exact operands, rounded to 9 dp. NULL when the
cell has a single active day (D = 0).

Scale shape: two stacked combinable aggregations — (cell, day) census
then per-cell moments. One shuffle key each, no window, no Python;
day-skew (a viral tile) stays map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["activity_trend"]

_US_PER_DAY = 86_400_000_000


def activity_trend(points: DataFrame, cell_deg: float = 0.5,
                   ts_col: str = "ts_us", lat_col: str = "lat",
                   lon_col: str = "lon") -> DataFrame:
    """Per-cell OLS trend of daily event counts.

    ``ts_col`` is epoch MICROSECONDS (int64); the day index is the
    integer division by 86.4e9 (floor semantics — Spark's long
    division and DuckDB ``//`` agree on nonnegative epochs).
    Output: (cell_x, cell_y, n_days, n_events, slope, intercept).
    """
    inv = F.lit(1.0 / cell_deg)
    daily = (points
             .groupBy(F.floor(F.col(lon_col) * inv).cast("long")
                      .alias("cell_x"),
                      F.floor(F.col(lat_col) * inv).cast("long")
                      .alias("cell_y"),
                      (F.col(ts_col) / F.lit(_US_PER_DAY)).cast("long")
                      .alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    xd = F.col("day").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    g = (daily.groupBy("cell_x", "cell_y")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("y").alias("n_events"),
              F.sum(xd).alias("sx"),
              F.sum(yd).alias("sy"),
              F.sum(xd * xd).alias("sxx"),
              F.sum(xd * yd).alias("sxy")))
    n_d = F.col("n").cast("decimal(38,0)")
    det = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(det != 0,
                   (n_d * F.col("sxy")
                    - F.col("sx") * F.col("sy")).cast("double")
                   / det.cast("double"))
    intercept = F.when(det != 0,
                       (F.col("sy") * F.col("sxx")
                        - F.col("sx") * F.col("sxy")).cast("double")
                       / det.cast("double"))
    return g.select("cell_x", "cell_y",
                    F.col("n").alias("n_days"),
                    F.col("n_events").cast("long").alias("n_events"),
                    F.round(slope, 9).alias("slope"),
                    F.round(intercept, 9).alias("intercept"))
