"""Origin–destination flow matrix over trajectories.

The standard mobility-analytics rollup: collapse each trip to its first
and last grid cell, then count trips per (origin cell, destination
cell) pair. Together with stay-points (staypoints.py) this is the
consumer layer a planet-scale movement pipeline runs over decoded point
streams; the reference (marook/osm-read) stops at entity decode.

Scale shape: TWO map-side-combinable groupBys and nothing else — the
trip collapse is a ``min(struct(ts, pid, cell…))`` / ``max(struct(…))``
aggregate (never a window over raw points, so a 10^5-point trajectory
contributes two structs to the shuffle, not 10^5 rows), and the flow
count shuffles on the (o, d) cell pair whose cardinality is bounded by
occupied-cell² — in practice the heavy pairs are commuter corridors,
which AQE skew-split handles since each pair's payload is one count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["od_matrix"]


def od_matrix(points: DataFrame, trip_col: str = "trip_id",
              ts_col: str = "ts_us", id_col: str = "id",
              lat_col: str = "lat", lon_col: str = "lon",
              cell_deg: float = 0.5) -> DataFrame:
    """Per (origin cell, destination cell): trip count and total travel
    time (exact int64 micros sum).

    Origin = the cell of the trip's first point in (ts, id) order,
    destination = its last; single-point trips yield a self-flow with
    zero duration.

    Output: (o_cell_x, o_cell_y, d_cell_x, d_cell_y, n_trips,
    total_duration_us).
    """
    cell_x = F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long")
    cell_y = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
    pts = points.select(
        F.col(trip_col).alias("trip"),
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("pid"),
                 cell_x.alias("cx"), cell_y.alias("cy")).alias("s"))
    trips = (pts.groupBy("trip")
             .agg(F.min("s").alias("o"), F.max("s").alias("d")))
    return (trips.groupBy(
                F.col("o.cx").alias("o_cell_x"),
                F.col("o.cy").alias("o_cell_y"),
                F.col("d.cx").alias("d_cell_x"),
                F.col("d.cy").alias("d_cell_y"))
            .agg(F.count(F.lit(1)).alias("n_trips"),
                 F.sum(F.col("d.ts") - F.col("o.ts"))
                 .cast("long").alias("total_duration_us")))
