"""Geofence enter/exit detection over ordered point streams.

The fleet/telemetry primitive: given per-device ordered observations
and a layer of named fences, emit one row per MEMBERSHIP TRANSITION —
``enter`` when a device's observation is inside a fence its previous
observation was not (or it has no previous observation), ``exit`` when
the previous observation was inside and the current one is not. The
reference (marook/osm-read, lib/pbfParser.js) stops at entity decode;
this is the consumer-side stream operator a planet-scale tracking
pipeline runs on the decoded points.

Spark-first shape — set-diff of containing-fence arrays, NOT a
point×fence join:

1. The fence layer is embedded as a broadcast LITERAL array of structs
   and each point computes its containing-fence id set with
   ``filter()`` + ``transform()`` + ``array_sort()`` — whole-stage
   codegen, zero shuffle, O(|fences|) per row. (For fence layers too
   large to scan per row, pre-bucket fences by covering grid cell and
   equi-join on the point's cell first — same downstream algebra; the
   literal path is right for the common ≤10^4-fence admin/AOI layer.)
2. ONE window shuffle on the trip key orders each device's stream and
   lags the fence set; ``array_except(cur, prev)`` are the fences
   entered, ``array_except(prev, cur)`` the fences exited. A device
   sitting inside k overlapping fences transitions each independently.
3. Both diffs concat into ONE struct array and explode once into
   (trip, ts, id, fence_id, kind) rows — a single window, a single
   Exchange (pinned by test_geofence).

At 10^12 points the only shuffle key is the trip id — skew is bounded
by the longest single device-day, never by hot fences — and the output
is proportional to the number of REAL transitions, not to
points×fences. Determinism: callers pass a total per-trip order
(``ts`` plus an id tiebreak); set diffs are on sorted long arrays.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["geofence_transitions", "fence_dwell_times"]


def geofence_transitions(points: DataFrame,
                         fences: Sequence[dict],
                         trip_col: str = "trip_id", ts_col: str = "ts",
                         id_col: str = "id", lat_col: str = "lat",
                         lon_col: str = "lon") -> DataFrame:
    """(trip, ts, pid, fence_id, kind) membership transitions.

    ``fences``: sequence of dicts with keys ``fence_id`` (long) and
    bbox bounds ``min_lat/max_lat/min_lon/max_lon`` (closed intervals,
    the same boundary rule as spatial.pip.pip_bbox). A device's FIRST
    observation inside a fence is an ``enter`` (the lag default is the
    empty set — identical to the "membership was false before the
    stream began" convention); an ``exit`` is stamped with the ts of
    the first observation OUTSIDE the fence.
    """
    if not fences:
        raise ValueError("geofence_transitions needs >= 1 fence")
    fence_lit = F.array(*[
        F.struct(F.lit(int(f["fence_id"])).cast("long").alias("fid"),
                 F.lit(float(f["min_lat"])).alias("min_lat"),
                 F.lit(float(f["max_lat"])).alias("max_lat"),
                 F.lit(float(f["min_lon"])).alias("min_lon"),
                 F.lit(float(f["max_lon"])).alias("max_lon"))
        for f in fences])

    lat, lon = F.col(lat_col), F.col(lon_col)
    inside = F.filter(
        fence_lit,
        lambda f: (lat >= f["min_lat"]) & (lat <= f["max_lat"])
        & (lon >= f["min_lon"]) & (lon <= f["max_lon"]))
    pts = points.select(
        F.col(trip_col).alias("trip"), F.col(ts_col).alias("ts"),
        F.col(id_col).alias("pid"),
        F.array_sort(F.transform(inside, lambda f: f["fid"]))
        .alias("cur"))

    w = Window.partitionBy("trip").orderBy("ts", "pid")
    lagged = pts.withColumn(
        "prev", F.coalesce(F.lag("cur").over(w),
                           F.array().cast("array<long>")))
    # one struct array per point, one explode: a union of two explode
    # branches would recompute the window per branch (2 Exchanges)
    mk = lambda arr, kind: F.transform(
        arr, lambda fid: F.struct(fid.alias("fence_id"),
                                  F.lit(kind).alias("kind")))
    moved = lagged.select(
        "trip", "ts", "pid",
        F.explode(F.concat(mk(F.array_except("cur", "prev"), "enter"),
                           mk(F.array_except("prev", "cur"), "exit")))
        .alias("_t"))
    return moved.select("trip", "ts", "pid",
                        F.col("_t.fence_id").alias("fence_id"),
                        F.col("_t.kind").alias("kind"))


def fence_dwell_times(points: DataFrame,
                      fences: Sequence[dict],
                      trip_col: str = "trip_id", ts_col: str = "ts",
                      id_col: str = "id", lat_col: str = "lat",
                      lon_col: str = "lon") -> DataFrame:
    """(trip, fence_id, dwell, n_intervals) — total time each device
    spent inside each fence, the billing/exposure metric downstream of
    :func:`geofence_transitions`.

    Left-continuous convention: the interval to the NEXT observation
    is attributed to the fences containing the CURRENT one (a device
    observed inside at t_i "stays" until t_{i+1}); each trip's last
    observation closes no interval. Dwell is an exact integer sum in
    the caller's ts unit — no transition pairing logic, so missing
    exits cannot corrupt totals.

    Same scale shape as the transition operator: codegen fence-set
    per point, ONE trip-keyed window (lead), one explode of the
    containing set, one combinable census keyed (trip, fence).
    """
    if not fences:
        raise ValueError("fence_dwell_times needs >= 1 fence")
    fence_lit = F.array(*[
        F.struct(F.lit(int(f["fence_id"])).cast("long").alias("fid"),
                 F.lit(float(f["min_lat"])).alias("min_lat"),
                 F.lit(float(f["max_lat"])).alias("max_lat"),
                 F.lit(float(f["min_lon"])).alias("min_lon"),
                 F.lit(float(f["max_lon"])).alias("max_lon"))
        for f in fences])
    lat, lon = F.col(lat_col), F.col(lon_col)
    inside = F.filter(
        fence_lit,
        lambda f: (lat >= f["min_lat"]) & (lat <= f["max_lat"])
        & (lon >= f["min_lon"]) & (lon <= f["max_lon"]))
    pts = points.select(
        F.col(trip_col).alias("trip"), F.col(ts_col).alias("ts"),
        F.col(id_col).alias("pid"),
        F.transform(inside, lambda f: f["fid"]).alias("cur"))
    w = Window.partitionBy("trip").orderBy("ts", "pid")
    seg = (pts.withColumn("dt", F.lead("ts").over(w) - F.col("ts"))
           .filter(F.col("dt").isNotNull())
           .select("trip", "dt", F.explode("cur").alias("fence_id")))
    return (seg.groupBy("trip", "fence_id")
            .agg(F.sum("dt").cast("long").alias("dwell"),
                 F.count(F.lit(1)).cast("long").alias("n_intervals")))
