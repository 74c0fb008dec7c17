"""Within-distance spatial join (ST_DWithin): all (a, b) pairs closer
than a radius, as a grid-bucketed equi-join — the big-big companion to
``knn_join`` (which broadcasts its query side).

Construction:

1. Cell size = the radius. Every point maps to one square grid cell
   ``(floor(lat/r), floor(lon/r))`` — a two-int key computed in
   whole-stage codegen.
2. The A side explodes to its 3×3 cell neighborhood (9 rows); B keeps
   its single cell. Any pair within ``r`` differs by ≤ r in each axis,
   so B's cell is one of A's nine — the candidate set is COMPLETE, and
   because B owns exactly one cell each pair joins exactly once (no
   dedup pass).
3. Equi-join on the two cell ints + the exact ``dist2 <= r²`` refine,
   all in codegen — no Python, no range join, no cross join.

Scale: both sides shuffle once on the cell key (plain hash join); a
dense city cell is a skewed key, which AQE's skew-split handles
(``spark.sql.adaptive.skewJoin``), or salt the exploded side by
splitting B's dense cells. Explode the SMALLER side (9× row inflation
on A; pick A accordingly) — at 100 TB the 9× rides through the shuffle
as compact (id, lat, lon, cx, cy) rows, not full payloads: join ids
first, attach payloads by id afterwards.

Distance is squared planar degrees — same metric and expression shape
as ``knn_join``, so results compare bit-exactly against an oracle
computing ``(a.lat-b.lat)² + (a.lon-b.lon)²``. No meridian wrap (the
driver tables' synthetic lon never straddles ±180; wrap needs a second
shifted-grid pass union'd in, noted here for planet deployments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dwithin_join"]


def dwithin_join(a: DataFrame, b: DataFrame, radius: float,
                 a_id: str = "id", b_id: str = "id",
                 keep_self: bool = True) -> DataFrame:
    """All pairs (a_id, b_id, dist2) with dist2 ≤ radius² (inclusive).

    ``a``/``b``: DataFrames with (id, lat, lon) — pass the same frame
    twice for a self-join; ``keep_self=False`` then drops the trivial
    (x, x) diagonal AND the mirrored (y, x) of every (x, y) pair
    (keeps the ``a_id < b_id`` half). A is the exploded (9×) side —
    pass the smaller input as ``a``.
    """
    r = float(radius)
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    aa = (a.select(F.col(a_id).alias("a_id"),
                   F.col("lat").alias("a_lat"), F.col("lon").alias("a_lon"))
          .withColumn("_dx", F.explode(offs))
          .withColumn("_dy", F.explode(offs))
          .withColumn("cx", (F.floor(F.col("a_lon") / r) + F.col("_dx"))
                      .cast("long"))
          .withColumn("cy", (F.floor(F.col("a_lat") / r) + F.col("_dy"))
                      .cast("long"))
          .drop("_dx", "_dy"))
    bb = (b.select(F.col(b_id).alias("b_id"),
                   F.col("lat").alias("b_lat"), F.col("lon").alias("b_lon"))
          .withColumn("cx", F.floor(F.col("b_lon") / r).cast("long"))
          .withColumn("cy", F.floor(F.col("b_lat") / r).cast("long")))
    d2 = ((F.col("a_lat") - F.col("b_lat"))
          * (F.col("a_lat") - F.col("b_lat"))
          + (F.col("a_lon") - F.col("b_lon"))
          * (F.col("a_lon") - F.col("b_lon")))
    out = (aa.join(bb, ["cx", "cy"], "inner")
           .withColumn("dist2", d2)
           .filter(F.col("dist2") <= F.lit(r * r))
           .select("a_id", "b_id", "dist2"))
    if not keep_self:
        out = out.filter(F.col("a_id") < F.col("b_id"))
    return out
