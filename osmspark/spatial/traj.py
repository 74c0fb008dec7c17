"""Trajectory cleaning + resampling operators.

Two per-trip sequence operators every mobility/GPS ingestion pipeline
runs between decode and analytics (the reference stops at decode —
`lib/pbfParser.js` emits entity rows only):

- :func:`speed_filter` — flag points whose implied speed from the
  previous point is implausible (teleporting GPS fixes); the classic
  pre-map-matching cleaning rule.
- :func:`resample_trips` — linear interpolation of each trajectory
  onto a fixed time grid (the "align all trips to 1-minute ticks"
  primitive feeding OD matrices and co-location joins).

Both are ONE window pass over (trip, ts) — a single Exchange on
trip_id, skew bounded by the longest trajectory, no Python in the row
path. All threshold comparisons are exact int64 (distances floored to
millimeters, times in epoch micros), so an oracle can mirror them
bit-exactly; interpolated coordinates are plain IEEE expressions
mirrored textually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .geometry import EARTH_RADIUS_M

__all__ = ["speed_filter", "resample_trips", "with_bearing"]


def _seg_mm(lat1, lon1, lat2, lon2) -> F.Column:
    """Haversine segment length floored to whole MILLIMETERS (int64) —
    the same construction as geometry.with_way_length_m but at mm
    quantum: mm granularity is ~5 orders below the sphere-vs-ellipsoid
    model error, and the int64 floor makes downstream comparisons and
    sums order-insensitive and engine-exact."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    hav = (F.sin(dphi) * F.sin(dphi)
           + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
           * F.sin(dlam) * F.sin(dlam))
    return F.floor(F.lit(2000.0 * EARTH_RADIUS_M)
                   * F.asin(F.sqrt(hav))).cast("long")


def speed_filter(points: DataFrame, max_speed_mmps: int,
                 trip_col: str = "trip_id", ts_col: str = "ts_us",
                 id_col: str = "id", lat_col: str = "lat",
                 lon_col: str = "lon") -> DataFrame:
    """Implied-speed plausibility flag per point.

    A point is implausible when the segment from its predecessor
    implies ``seg_mm · 10^6 > max_speed_mmps · dt_us`` (i.e. speed
    strictly above ``max_speed_mmps`` mm/s — exact integer cross-
    multiplication, no division). Zero-dt segments with any movement
    are implausible; a trip's first point is always plausible.

    Returns the input keyed columns plus (seg_mm, dt_us, plausible).
    Filtering is left to the caller (``.filter("plausible")``) so
    audit pipelines can count drops per trip first.

    Note this flags against the STORED predecessor, not the previous
    plausible point — the one-pass form (a sequential dependency would
    need per-trip iteration); for GPS glitches (isolated bad fixes)
    the two agree on everything except runs of consecutive bad points.
    """
    w = Window.partitionBy(trip_col).orderBy(ts_col, id_col)
    p_lat = F.lag(lat_col).over(w)
    p_lon = F.lag(lon_col).over(w)
    p_ts = F.lag(ts_col).over(w)
    seg = _seg_mm(p_lat, p_lon, F.col(lat_col), F.col(lon_col))
    dt = F.col(ts_col) - p_ts
    plausible = F.when(p_ts.isNull(), F.lit(True)) \
        .otherwise(seg * F.lit(1_000_000)
                   <= F.lit(int(max_speed_mmps)) * dt)
    return (points
            .withColumn("seg_mm", F.coalesce(seg, F.lit(0).cast("long")))
            .withColumn("dt_us", F.coalesce(dt, F.lit(0).cast("long")))
            .withColumn("plausible", plausible))


def resample_trips(points: DataFrame, step_us: int,
                   trip_col: str = "trip_id", ts_col: str = "ts_us",
                   id_col: str = "id", lat_col: str = "lat",
                   lon_col: str = "lon") -> DataFrame:
    """Linear interpolation of each trip onto the fixed ``step_us``
    time grid: one output row per grid tick k·step inside [t_i, t_i+1)
    for every consecutive point pair (half-open, so ticks are emitted
    exactly once even when a point sits on the grid).

    The tick range is exact integer arithmetic (``ceil(t/step)`` via
    ``(t + step - 1) DIV step`` — timestamps are nonnegative epoch
    micros); the lerp weight ``(k·step − t1)/(t2 − t1)`` and the
    coordinate mix are plain IEEE double expressions an oracle mirrors
    textually. Ticks explode from a ``sequence()`` array per segment —
    per-row codegen, no join.

    Output: (trip, tick, t_us, lat, lon).
    """
    s = int(step_us)
    w = Window.partitionBy(trip_col).orderBy(ts_col, id_col)
    seg = (points
           .select(F.col(trip_col).alias("trip"),
                   F.col(ts_col).alias("t1"),
                   F.col(lat_col).alias("lat1"),
                   F.col(lon_col).alias("lon1"),
                   F.lead(ts_col).over(w).alias("t2"),
                   F.lead(lat_col).over(w).alias("lat2"),
                   F.lead(lon_col).over(w).alias("lon2"))
           .filter(F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))))
    k1 = F.expr(f"(t1 + {s - 1}) DIV {s}")
    k2 = F.expr(f"(t2 + {s - 1}) DIV {s} - 1")
    ticks = F.when(k1 <= k2, F.sequence(k1, k2)) \
             .otherwise(F.array().cast("array<long>"))
    frac = ((F.col("tick") * F.lit(s) - F.col("t1")).cast("double")
            / (F.col("t2") - F.col("t1")).cast("double"))
    return (seg.withColumn("tick", F.explode(ticks))
            .select(F.col("trip").alias(trip_col),
                    "tick",
                    (F.col("tick") * F.lit(s)).alias("t_us"),
                    (F.col("lat1") + (F.col("lat2") - F.col("lat1"))
                     * frac).alias("lat"),
                    (F.col("lon1") + (F.col("lon2") - F.col("lon1"))
                     * frac).alias("lon")))


def with_bearing(points: DataFrame, trip_col: str = "trip_id",
                 ts_col: str = "ts_us", id_col: str = "id",
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Per-segment forward azimuth and turn angle — the heading
    enrichment map matching and driving-behavior models consume.

    For each point with a predecessor in its trip: ``bearing_deg`` =
    initial great-circle bearing FROM the previous point TO this one
    (0° = north, clockwise, [0, 360)), and ``turn_deg`` = signed
    change versus the previous segment's bearing, normalized to
    (−180, 180] (NULL for the first segment). ONE window pass on the
    trip key — the speed_filter/staypoints Exchange discipline; skew
    bounded by the longest trajectory.

    Determinism: bearings are IEEE atan2 expressions ROUNDED TO 9 dp
    before both output and the turn subtraction (the resample_trips
    discipline — last-ulp trig differences across engines sit ~4
    orders below the rounding quantum, so an oracle mirroring the
    expression text reproduces every value hash-exactly). The first
    point of each trip carries NULL bearing (no predecessor), kept —
    not dropped — so row count matches the input.
    """
    w = Window.partitionBy(trip_col).orderBy(ts_col, id_col)
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    lat1, lon1 = F.radians(plat), F.radians(plon)
    lat2, lon2 = F.radians(F.col(lat_col)), F.radians(F.col(lon_col))
    dlon = lon2 - lon1
    # initial bearing: atan2(sin Δλ·cos φ2, cos φ1·sin φ2 − sin φ1·cos φ2·cos Δλ)
    theta = F.atan2(
        F.sin(dlon) * F.cos(lat2),
        F.cos(lat1) * F.sin(lat2) - F.sin(lat1) * F.cos(lat2) * F.cos(dlon))
    bearing = F.round(
        F.pmod(F.degrees(theta) + F.lit(360.0), F.lit(360.0)), 9)
    out = points.withColumn("bearing_deg", bearing)
    prev_b = F.lag("bearing_deg").over(w)
    # normalize Δbearing to (−180, 180]: d − 360·floor((d + 180)/360),
    # computed on the ROUNDED bearings so both engines subtract
    # identical operands
    d = F.col("bearing_deg") - prev_b
    turn = F.round(d - F.lit(360.0)
                   * F.floor((d + F.lit(180.0)) / F.lit(360.0)), 9)
    # the floor maps +180 to −180; flip that single boundary back
    turn = F.when(turn == F.lit(-180.0), F.lit(180.0)).otherwise(turn)
    return out.withColumn("turn_deg", turn)
