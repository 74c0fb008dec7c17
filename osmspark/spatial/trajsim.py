"""Trajectory similarity — discrete Hausdorff distance between trip
pairs (the classic "how far apart are these two tracks at the worst
point" metric; trajectory clustering and map-matching QA both run on
it). The reference (marook/osm-read, lib/pbfParser.js) stops at entity
decode; this is consumer-side trajectory mining over the decoded
points.

h(A, B) = max_{a∈A} min_{b∈B} d(a, b); the symmetric distance is
max(h(A,B), h(B,A)). Spark-first shape, quadratic on TRIPS never on
points:

1. One pass collapses each trip to a bbox row (4 min/max aggregates) —
   a table with ONE row per trip, orders of magnitude below the point
   table.
2. Candidate pairs come from a bbox-gap prefilter on that tiny table:
   pair (s, t) survives only if the axis-wise gap between their boxes
   is ≤ ``max_dist_deg`` — Hausdorff ≥ bbox gap, so no qualifying pair
   is lost (gap is 0 for overlapping boxes). The trip-level join is
   broadcastable (one row per trip); the POINT tables are then
   equi-joined on the pair key, so point work is Σ|A|·|B| over
   surviving pairs only.
3. Per pair both directions reduce in one aggregation tree:
   min d² per (pair, anchor point) — anchor runs over A's points for
   h(A,B) and B's for h(B,A), unioned with a direction tag before ONE
   groupBy — then max over anchors.

Exactness: coordinates quantize to 1e-6° int64; d² is an exact int64
(≤ 2·(360e6)² < 2^63 even antipodally); min/max of exact integers are
order-insensitive, and the final ``sqrt(d²)·1e-6`` (degrees) is the
only float op — hash-identical on any engine. Planar degrees, same
metric family as knn.py/dwithin_join (geodesic variants go through
dwithin_meters_join's haversine).

Scale: the pair-key shuffle is per trip-pair; a hot pair costs
|A|·|B| rows — bound trip length upstream (staypoints/resampling) the
same way every O(|A|·|B|) trajectory metric requires. ``max_dist_deg``
is the candidate-volume throttle: pairs farther apart than it are
simply absent from the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hausdorff_pairs"]


def hausdorff_pairs(points: DataFrame, max_dist_deg: float,
                    trip_col: str = "trip_id", lat_col: str = "lat",
                    lon_col: str = "lon") -> DataFrame:
    """(trip_a, trip_b, hausdorff_deg) for every trip pair with
    symmetric discrete Hausdorff distance ≤ ``max_dist_deg``,
    trip_a < trip_b. The threshold compares the exact int64 µdeg²
    (h² ≤ (max·1e6)²) — no float in the decision — and
    ``hausdorff_deg`` is the one float op (sqrt·1e-6), bit-identical
    on any engine. The bbox-gap prefilter is pure optimization: a
    brute-force all-pairs oracle must produce the identical set."""
    if max_dist_deg <= 0:
        raise ValueError("max_dist_deg must be positive")
    pts = points.select(
        F.col(trip_col).alias("trip"),
        F.round(F.col(lat_col) * 1e6).cast("long").alias("y"),
        F.round(F.col(lon_col) * 1e6).cast("long").alias("x"))

    box = (pts.groupBy("trip")
           .agg(F.min("y").alias("y0"), F.max("y").alias("y1"),
                F.min("x").alias("x0"), F.max("x").alias("x1")))
    gap_e6 = int(round(max_dist_deg * 1e6))
    a, b = box.alias("a"), box.alias("b")
    # axis gap between boxes; 0 when they overlap. Hausdorff >= the
    # larger axis gap, so filtering on it never drops a qualifying pair.
    gx = F.greatest(F.col("a.x0") - F.col("b.x1"),
                    F.col("b.x0") - F.col("a.x1"), F.lit(0))
    gy = F.greatest(F.col("a.y0") - F.col("b.y1"),
                    F.col("b.y0") - F.col("a.y1"), F.lit(0))
    cand = (a.join(b, F.col("a.trip") < F.col("b.trip"))
            .filter(F.greatest(gx, gy) <= F.lit(gap_e6))
            .select(F.col("a.trip").alias("trip_a"),
                    F.col("b.trip").alias("trip_b")))

    pa = pts.select(F.col("trip").alias("trip_a"),
                    F.col("y").alias("ay"), F.col("x").alias("ax"))
    pb = pts.select(F.col("trip").alias("trip_b"),
                    F.col("y").alias("by"), F.col("x").alias("bx"))
    d2 = ((F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
          + (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")))
    cross = (cand.join(pa, "trip_a").join(pb, "trip_b")
             .select("trip_a", "trip_b",
                     F.col("ay"), F.col("ax"), F.col("by"), F.col("bx"),
                     d2.alias("d2")))
    # both directions through one aggregation tree: anchor = A point
    # (dir 0, min over B) or B point (dir 1, min over A)
    anchored = (cross.select(
        "trip_a", "trip_b", F.lit(0).alias("dir"),
        F.col("ay").alias("ky"), F.col("ax").alias("kx"), "d2")
        .unionByName(cross.select(
            "trip_a", "trip_b", F.lit(1).alias("dir"),
            F.col("by").alias("ky"), F.col("bx").alias("kx"), "d2")))
    inner = (anchored.groupBy("trip_a", "trip_b", "dir", "ky", "kx")
             .agg(F.min("d2").alias("min_d2")))
    return (inner.groupBy("trip_a", "trip_b")
            .agg(F.max("min_d2").alias("_h2"))
            .filter(F.col("_h2") <= F.lit(gap_e6 * gap_e6))
            .select("trip_a", "trip_b",
                    (F.sqrt(F.col("_h2").cast("double")) * F.lit(1e-6))
                    .alias("hausdorff_deg")))
