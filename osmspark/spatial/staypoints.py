"""Stay-point (dwell) detection over trajectories.

The canonical trajectory-mining primitive (Li et al. 2008, "Mining user
similarity based on location history"): collapse a device's ordered
point stream into the places it STAYED — maximal runs of consecutive
points inside one grid cell, kept when the run is long enough (points
and/or duration). The reference (marook/osm-read) only decodes entity
streams; this is the consumer-side operator a planet-scale GPS/OSM
pipeline runs right after decode.

Spark-first shape: a single gaps-and-islands pass —
``row_number() over (trip ORDER BY ts) - row_number() over
((trip, cell) ORDER BY ts)`` labels each same-cell run with a constant
island id, then one groupBy aggregates each run. The physical plan has
exactly ONE Exchange (pinned by test_plans_new_ops): both windows AND
the run aggregation reuse the hashpartitioning(trip) shuffle — the agg
keys contain trip, so co-location is already satisfied — and the
second window only re-sorts within partitions. At 10^12 points the
only shuffle key is trip_id: skew is bounded by the longest single
trajectory (a device-day is ~10^5 points), never by global hot cells —
dense cities spread across many trips.

Determinism: callers must pass a total per-trip order (``ts`` plus a
tiebreak id column when timestamps can repeat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["detect_staypoints"]


def detect_staypoints(points: DataFrame, trip_col: str = "trip_id",
                      ts_col: str = "ts_us", id_col: str = "id",
                      lat_col: str = "lat", lon_col: str = "lon",
                      cell_deg: float = 0.5, min_points: int = 3,
                      min_duration_us: int | None = None) -> DataFrame:
    """Maximal same-cell runs per trip, filtered to real stays.

    ``ts_col`` must be an integer (e.g. epoch microseconds) so durations
    are exact; coordinates are quantized to 1e-6° integers internally so
    the run centroid is an exact integer mean (floor), immune to
    distributed float-summation order.

    Output: (trip, cell_x, cell_y, n_points, ts_start, ts_end,
    duration_us, centroid_lat_e6, centroid_lon_e6).
    """
    lat_e6 = F.round(F.col(lat_col) * 1e6).cast("long")
    lon_e6 = F.round(F.col(lon_col) * 1e6).cast("long")
    cell_x = F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long")
    cell_y = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
    pts = points.select(
        F.col(trip_col).alias("trip"), F.col(ts_col).alias("ts"),
        F.col(id_col).alias("pid"), lat_e6.alias("lat_e6"),
        lon_e6.alias("lon_e6"), cell_x.alias("cell_x"),
        cell_y.alias("cell_y"))

    w_trip = Window.partitionBy("trip").orderBy("ts", "pid")
    w_cell = Window.partitionBy("trip", "cell_x", "cell_y") \
                   .orderBy("ts", "pid")
    runs = pts.withColumn(
        "island",
        F.row_number().over(w_trip) - F.row_number().over(w_cell))

    agg = (runs.groupBy("trip", "cell_x", "cell_y", "island")
           .agg(F.count(F.lit(1)).alias("n_points"),
                F.min("ts").alias("ts_start"),
                F.max("ts").alias("ts_end"),
                F.sum("lat_e6").alias("_slat"),
                F.sum("lon_e6").alias("_slon"))
           .withColumn("duration_us", F.col("ts_end") - F.col("ts_start"))
           .withColumn("centroid_lat_e6",
                       F.floor(F.col("_slat") / F.col("n_points"))
                       .cast("long"))
           .withColumn("centroid_lon_e6",
                       F.floor(F.col("_slon") / F.col("n_points"))
                       .cast("long")))

    out = agg.filter(F.col("n_points") >= min_points)
    if min_duration_us is not None:
        out = out.filter(F.col("duration_us") >= min_duration_us)
    return out.select(F.col("trip").alias(trip_col), "cell_x", "cell_y",
                      "n_points", "ts_start", "ts_end", "duration_us",
                      "centroid_lat_e6", "centroid_lon_e6")
