"""Nearest-segment (map-matching) join: snap points to the closest
polyline segment within a radius — the canonical consumer of assembled
way geometries (GPS→road snapping, address→street assignment). The
reference emits way vertex lists only (``lib/pbfParser.js:443-473``);
every map-matching user builds exactly this on top.

Construction (same grid-bucket family as ``dwithin_join``/``knn_join``
— never an all-pairs shuffle):

1. Polylines explode to segments ``(way_id, pos, ax, ay, bx, by)`` —
   per-row array expressions, no shuffle
   (:func:`explode_segments`; at warehouse scale this IS the layout to
   persist, bucketed by cell).
2. Cell size = the radius. A segment maps to every cell of its
   BOUNDING BOX (a ``sequence×sequence`` explode — for real road
   networks adjacent vertices are near each other, so that's 1-4
   cells; a point maps to its 3×3 neighborhood. Any (point, segment)
   pair within ``r`` has the segment's closest approach inside the
   point's ball, hence the segment bbox within ``r`` of the point per
   axis, hence a shared cell — the candidate set is COMPLETE.
3. Equi-join on the cell ints, exact point-to-segment distance² refine
   (clamped projection, pure codegen doubles — the identical IEEE
   expression the DuckDB oracle evaluates), then one aggregation:
   ``min(struct(dist2, way_id, pos))`` is the argmin WITH the
   deterministic tie-break built in (ties — e.g. a point projecting
   onto the shared vertex of two adjacent collinear segments — break
   to the lowest (way_id, pos)).
4. Unmatched points (nothing within ``r``) surface as
   ``(way_id=-1, pos=-1, dist2=-1.0)`` — never silently dropped.

Scale: both sides shuffle ONCE on the cell key; the segment side rides
through as 6 narrow columns, candidate duplicates (a pair sharing >1
cell) are absorbed by the min aggregation rather than a distinct pass;
dense-city cell skew is AQE skew-join territory, same as dwithin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["explode_segments", "nearest_segment_join"]


def explode_segments(geoms: DataFrame, way_id: str = "way_id",
                     lats_col: str = "lats", lons_col: str = "lons"
                     ) -> DataFrame:
    """(way_id, pos, ax, ay, bx, by) — consecutive vertex pairs of each
    polyline (x = lon, y = lat); rows with < 2 points emit no segments.
    Pure array expressions + explode: narrow, shuffle-free."""
    segs = F.expr(f"""
      CASE WHEN size({lats_col}) < 2 THEN array() ELSE
        transform(sequence(0, size({lats_col}) - 2), i -> named_struct(
          'pos', i,
          'ax', element_at({lons_col}, i + 1),
          'ay', element_at({lats_col}, i + 1),
          'bx', element_at({lons_col}, i + 2),
          'by', element_at({lats_col}, i + 2)))
      END""")
    return (geoms.select(F.col(way_id).alias("way_id"),
                         F.explode(segs).alias("s"))
            .select("way_id", "s.*"))


#: point-to-segment squared distance — one SQL text, used verbatim by
#: the Spark refine AND restatable by an oracle, so both engines run
#: the identical IEEE operation sequence. Degenerate (zero-length)
#: segments fall back to point distance via the CASE guard (CASE
#: short-circuits: the division never executes when len2 = 0).
SEG_DIST2_SQL = """
  CASE WHEN (bx - ax) * (bx - ax) + (by - ay) * (by - ay) = 0.0 THEN
    (px - ax) * (px - ax) + (py - ay) * (py - ay)
  ELSE
    (px - (ax + LEAST(GREATEST(
        ((px - ax) * (bx - ax) + (py - ay) * (by - ay))
        / ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)), 0.0), 1.0)
      * (bx - ax)))
    * (px - (ax + LEAST(GREATEST(
        ((px - ax) * (bx - ax) + (py - ay) * (by - ay))
        / ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)), 0.0), 1.0)
      * (bx - ax)))
    + (py - (ay + LEAST(GREATEST(
        ((px - ax) * (bx - ax) + (py - ay) * (by - ay))
        / ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)), 0.0), 1.0)
      * (by - ay)))
    * (py - (ay + LEAST(GREATEST(
        ((px - ax) * (bx - ax) + (py - ay) * (by - ay))
        / ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)), 0.0), 1.0)
      * (by - ay)))
  END"""


def nearest_segment_join(points: DataFrame, segments: DataFrame,
                         radius: float, point_id: str = "id"
                         ) -> DataFrame:
    """(point_id, way_id, seg_pos, dist2): each point's nearest segment
    within ``radius`` (planar degrees, same convention as knn/dwithin);
    unmatched points get (-1, -1, -1.0).

    ``points``: (id, lat, lon); ``segments``: output of
    :func:`explode_segments` (or any (way_id, pos, ax, ay, bx, by)).
    """
    r = float(radius)
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    pts = (points.select(F.col(point_id).alias("p_id"),
                         F.col("lon").alias("px"), F.col("lat").alias("py"))
           .withColumn("_dx", F.explode(offs))
           .withColumn("_dy", F.explode(offs))
           .withColumn("cx", (F.floor(F.col("px") / r) + F.col("_dx"))
                       .cast("long"))
           .withColumn("cy", (F.floor(F.col("py") / r) + F.col("_dy"))
                       .cast("long"))
           .drop("_dx", "_dy"))
    segs = (segments
            .withColumn("cx", F.explode(F.expr(
                f"sequence(cast(floor(least(ax, bx) / {r!r}) as bigint),"
                f"         cast(floor(greatest(ax, bx) / {r!r}) as bigint))")))
            .withColumn("cy", F.explode(F.expr(
                f"sequence(cast(floor(least(ay, by) / {r!r}) as bigint),"
                f"         cast(floor(greatest(ay, by) / {r!r}) as bigint))"))))
    cand = (pts.join(segs, ["cx", "cy"])
            .withColumn("dist2", F.expr(SEG_DIST2_SQL))
            .filter(F.col("dist2") <= F.lit(r * r)))
    best = (cand.groupBy("p_id")
            .agg(F.min(F.struct("dist2", "way_id", "pos")).alias("m")))
    return (points.select(F.col(point_id).alias("p_id"))
            .join(best, "p_id", "left")
            .select(F.col("p_id").alias(point_id),
                    F.coalesce(F.col("m.way_id"), F.lit(-1)).alias("way_id"),
                    F.coalesce(F.col("m.pos"), F.lit(-1)).alias("seg_pos"),
                    F.coalesce(F.col("m.dist2"), F.lit(-1.0)).alias("dist2")))
