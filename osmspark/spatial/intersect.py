"""Segment-intersection join: all pairs of polyline segments that
intersect (cross, touch, or overlap) — ST_Intersects for line layers.
The road-network / boundary-validation consumer op downstream of
``explode_segments``: crossing detection between layers (roads ×
rivers, admin edges × coastline) or self-intersection checks.

Exactness: coordinates quantize to an integer grid (same contract as
``polygon.py``), so the four orientation cross products are EXACT
int64s and the intersection predicate is pure integer sign logic — no
epsilon, no float ambiguity, bit-identical in any engine (the DuckDB
oracle evaluates the VERBATIM predicate text). Signs are compared
directly (never ``d1*d2 < 0``), so the int64 envelope is just the
cross product itself: extent_q² — the whole globe fits at quantum 100,
a ~2°-extent layer at the OSM quantum 1e7.

Candidate generation (no all-pairs shuffle):

1. Cell size = a layout parameter (pick ≳ the typical segment extent).
   Each segment explodes to every cell of its bounding box.
2. Equi-join on the cell ints. A pair whose segments intersect shares
   the cell containing the intersection point, so the candidate set is
   complete; a pair may share SEVERAL cells, so each pair is tested
   only in its OWNER cell — the lexicographically smallest cell of the
   two bboxes' overlap (``cx = max(a.x0, b.x0) AND cy = max(a.y0,
   b.y0)``) — which makes the output duplicate-free WITHOUT a distinct
   pass.
3. The exact predicate refines in whole-stage codegen.

Scale: both sides shuffle once on the cell key; skewed dense cells are
AQE skew-join territory. Self-joins pass the same frame twice with
``keep_self=False`` to drop the diagonal and mirror pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["segment_intersect_join", "SEG_INTERSECT_SQL"]

#: exact integer segment-intersection predicate over quantized endpoint
#: columns (pax..qby, int64). Shared verbatim with the DuckDB oracle.
#: Standard orientation test: proper crossing = strict sign opposition
#: on both segments; touching/collinear cases via the d=0 + bbox-on-
#: segment checks.
SEG_INTERSECT_SQL = """(
  (
    (((qbx - qax) * (pay - qay) - (qby - qay) * (pax - qax) > 0 AND
      (qbx - qax) * (pby - qay) - (qby - qay) * (pbx - qax) < 0) OR
     ((qbx - qax) * (pay - qay) - (qby - qay) * (pax - qax) < 0 AND
      (qbx - qax) * (pby - qay) - (qby - qay) * (pbx - qax) > 0))
    AND
    (((pbx - pax) * (qay - pay) - (pby - pay) * (qax - pax) > 0 AND
      (pbx - pax) * (qby - pay) - (pby - pay) * (qbx - pax) < 0) OR
     ((pbx - pax) * (qay - pay) - (pby - pay) * (qax - pax) < 0 AND
      (pbx - pax) * (qby - pay) - (pby - pay) * (qbx - pax) > 0))
  )
  OR ((qbx - qax) * (pay - qay) - (qby - qay) * (pax - qax) = 0 AND
      pax BETWEEN LEAST(qax, qbx) AND GREATEST(qax, qbx) AND
      pay BETWEEN LEAST(qay, qby) AND GREATEST(qay, qby))
  OR ((qbx - qax) * (pby - qay) - (qby - qay) * (pbx - qax) = 0 AND
      pbx BETWEEN LEAST(qax, qbx) AND GREATEST(qax, qbx) AND
      pby BETWEEN LEAST(qay, qby) AND GREATEST(qay, qby))
  OR ((pbx - pax) * (qay - pay) - (pby - pay) * (qax - pax) = 0 AND
      qax BETWEEN LEAST(pax, pbx) AND GREATEST(pax, pbx) AND
      qay BETWEEN LEAST(pay, pby) AND GREATEST(pay, pby))
  OR ((pbx - pax) * (qby - pay) - (pby - pay) * (qbx - pax) = 0 AND
      qbx BETWEEN LEAST(pax, pbx) AND GREATEST(pax, pbx) AND
      qby BETWEEN LEAST(pay, pby) AND GREATEST(pay, pby))
)"""


def _cells(df: DataFrame, prefix: str, cell: float, quantum: float
           ) -> DataFrame:
    """Quantize endpoints, attach bbox min-cell, explode bbox cells."""
    q, c = float(quantum), float(cell)
    out = df.select(
        F.col("way_id").alias(f"{prefix}_way"),
        F.col("pos").alias(f"{prefix}_pos"),
        F.expr(f"cast(round(ax * {q!r}) as bigint)").alias(f"{prefix}ax"),
        F.expr(f"cast(round(ay * {q!r}) as bigint)").alias(f"{prefix}ay"),
        F.expr(f"cast(round(bx * {q!r}) as bigint)").alias(f"{prefix}bx"),
        F.expr(f"cast(round(by * {q!r}) as bigint)").alias(f"{prefix}by"),
        F.expr(f"cast(floor(least(ax, bx) / {c!r}) as bigint)")
        .alias(f"{prefix}x0"),
        F.expr(f"cast(floor(greatest(ax, bx) / {c!r}) as bigint)")
        .alias(f"{prefix}x1"),
        F.expr(f"cast(floor(least(ay, by) / {c!r}) as bigint)")
        .alias(f"{prefix}y0"),
        F.expr(f"cast(floor(greatest(ay, by) / {c!r}) as bigint)")
        .alias(f"{prefix}y1"))
    return (out
            .withColumn("cx", F.explode(F.expr(
                f"sequence({prefix}x0, {prefix}x1)")))
            .withColumn("cy", F.explode(F.expr(
                f"sequence({prefix}y0, {prefix}y1)"))))


def segment_intersect_join(a: DataFrame, b: DataFrame, cell: float,
                           quantum: float = 100.0,
                           keep_self: bool = True) -> DataFrame:
    """(a_way, a_pos, b_way, b_pos) for every intersecting segment pair.

    ``a``/``b``: (way_id, pos, ax, ay, bx, by) — ``explode_segments``
    output. ``cell``: candidate grid size in degrees (≳ typical segment
    extent). ``quantum``: the integer grid (see module doc; endpoints
    are rounded to it, so "touching" means touching AT that
    resolution). Pass the same frame twice with ``keep_self=False`` for
    a self-join — keeps (way, pos) < (way, pos) pairs only, dropping
    the diagonal, mirrors, AND the shared-endpoint touches of adjacent
    positions on the same way (always "intersecting", never useful).
    """
    p = _cells(a, "p", cell, quantum)
    s = _cells(b, "q", cell, quantum)
    # the p*/q* endpoint names are unique across the join, so the
    # shared predicate text applies unqualified
    cond = F.expr(SEG_INTERSECT_SQL)
    joined = (p.alias("p").join(s.alias("s"),
                                (F.col("p.cx") == F.col("s.cx"))
                                & (F.col("p.cy") == F.col("s.cy")))
              # owner cell: test each pair exactly once
              .filter((F.col("p.cx") == F.greatest("p.px0", "s.qx0"))
                      & (F.col("p.cy") == F.greatest("p.py0", "s.qy0")))
              .filter(cond))
    out = joined.select(F.col("p.p_way").alias("a_way"),
                        F.col("p.p_pos").alias("a_pos"),
                        F.col("s.q_way").alias("b_way"),
                        F.col("s.q_pos").alias("b_pos"))
    if not keep_self:
        out = out.filter(
            (F.col("a_way") < F.col("b_way"))
            | ((F.col("a_way") == F.col("b_way"))
               & (F.col("a_pos") + 1 < F.col("b_pos"))))
    return out
