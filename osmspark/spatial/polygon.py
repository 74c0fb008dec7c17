"""Ring metrics over assembled way geometries: signed area, winding,
centroid, perimeter — the validity/consumer layer downstream of
``assemble_way_geometries`` (closed OSM ways ARE area features:
buildings, landuse, admin rings; reference emits only the vertex list,
``lib/pbfParser.js:443-473``, and leaves every ring computation to the
caller).

Complements the double-precision helpers in ``geometry.py``
(``with_ring_area`` / ``with_way_centroid`` / ``with_way_length_*``,
whose oracles must replicate the sequential fold order): here every
sum is an exact INTEGER, so results are independent of evaluation
order and the winding sign is never a float-noise coin flip — which
is what multipolygon outer/inner classification
(``assemble_relation_geometries``) needs it for.

Engine-exactness design (what lets a DuckDB oracle match hash-exact):

- Coordinates quantize to an integer grid (``round(deg · quantum)`` as
  int64) and translate to the ring's FIRST vertex. The shoelace sum is
  translation-invariant, so all cross terms are small exact integers
  and the sums are order-independent — no float accumulation order to
  disagree on.
- Derived doubles (area in deg², centroid, perimeter) come from the
  exact integer sums by a SINGLE division each — both engines perform
  the identical IEEE ops on identical inputs, so results are
  bit-identical.
- Overflow envelope (int64): with extent E in degrees and n vertices,
  the centroid numerator is bounded by ~n·2·(E·quantum)³. At the OSM
  quantum 1e7 that covers rings with extent ≲ 0.1° (buildings, blocks,
  parks — the overwhelming mass of closed ways) at any realistic n;
  pass a coarser ``quantum`` for continent-scale rings (1e2 keeps the
  whole globe exact for n ≤ ~10⁵). The operator does not silently
  wrap: pick quantum to the layer, as the decode layout already does
  (``osmspark/spatial/layout.py`` stores 1e-7° int32).

Scale: the whole computation is per-row array expressions
(``transform``/``aggregate`` over the assembled vertex arrays) in
whole-stage codegen — NO shuffle, no Python; at 10^9 ways the only
data movement is the scan.

Semantics:

- The vertex list is treated as an implicitly closed ring (edge n-1→0
  included). An explicitly closed ring (last == first) is handled
  identically — its duplicate edge has zero length and zero cross
  term.
- ``winding``: +1 counter-clockwise (positive signed area in lat/lon
  axes), -1 clockwise, 0 degenerate (zero area: < 3 distinct points or
  collinear).
- ``centroid_*``: polygon centroid (area-weighted); NULL for
  degenerate rings (the formula divides by the signed area).
- ``perim_deg``: sum of per-edge lengths, each rounded to the quantum
  grid (exact integer sum; ROUND of a positive IEEE sqrt is identical
  in both engines).
- Empty geometries (0 assembled points) surface as
  (n_pts=0, winding=0, area 0.0, NULL centroid, perim 0.0) — the
  never-silently-dropped contract of the geometry module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["polygon_metrics"]


def polygon_metrics(geoms: DataFrame, quantum: float = 1e7,
                    way_id: str = "way_id", lats_col: str = "lats",
                    lons_col: str = "lons") -> DataFrame:
    """Per-ring metrics from (way_id, lats: array<double>, lons: ...).

    Returns (way_id, n_pts, is_closed, winding, area_deg2,
    centroid_lat, centroid_lon, perim_deg). ``area_deg2`` is SIGNED
    (ccw positive); take abs() for a magnitude. See module docstring
    for the quantum/overflow contract.
    """
    q = float(quantum)
    df = geoms.select(
        F.col(way_id).alias("way_id"),
        F.expr(f"transform({lons_col}, v -> cast(round(v * {q!r}) as bigint))")
        .alias("xq"),
        F.expr(f"transform({lats_col}, v -> cast(round(v * {q!r}) as bigint))")
        .alias("yq"),
    ).withColumn("n", F.size("xq"))

    # per-edge integer terms over the implicitly closed ring; guard the
    # n=0 case (sequence(0,-1) would DESCEND, not return empty)
    edges = """
      CASE WHEN n = 0 THEN array() ELSE
        transform(sequence(0, n - 1), i -> named_struct(
          'xi', element_at(xq, i + 1) - element_at(xq, 1),
          'yi', element_at(yq, i + 1) - element_at(yq, 1),
          'xj', element_at(xq, ((i + 1) % n) + 1) - element_at(xq, 1),
          'yj', element_at(yq, ((i + 1) % n) + 1) - element_at(yq, 1)))
      END"""
    df = df.withColumn("e", F.expr(edges)).withColumn(
        "t", F.expr("""
          transform(e, s -> named_struct(
            'cross', s.xi * s.yj - s.xj * s.yi,
            'len', cast(round(sqrt(cast((s.xj - s.xi) * (s.xj - s.xi)
                 + (s.yj - s.yi) * (s.yj - s.yi) as double))) as bigint),
            'cxn', (s.xi + s.xj) * (s.xi * s.yj - s.xj * s.yi),
            'cyn', (s.yi + s.yj) * (s.xi * s.yj - s.xj * s.yi)))"""))

    def _isum(field: str) -> F.Column:
        return F.expr(
            f"aggregate(t, cast(0 as bigint), (a, s) -> a + s.{field})")

    df = df.select(
        "way_id", "n", "xq", "yq",
        _isum("cross").alias("a2"), _isum("len").alias("plen"),
        _isum("cxn").alias("cxn"), _isum("cyn").alias("cyn"))

    centroid = """
      CASE WHEN a2 = 0 THEN CAST(NULL AS DOUBLE) ELSE
        (cast(element_at({axis}, 1) as double)
         + cast({num} as double) / cast(3 * a2 as double)) / {q}
      END"""
    return df.select(
        "way_id",
        F.col("n").alias("n_pts"),
        ((F.col("n") >= 4)  # try_: empty arrays yield NULL, not an ANSI
         # out-of-bounds error (FALSE AND NULL = FALSE keeps n=0 rows false)
         & (F.expr("try_element_at(xq, 1)") == F.expr("try_element_at(xq, n)"))
         & (F.expr("try_element_at(yq, 1)") == F.expr("try_element_at(yq, n)")))
        .alias("is_closed"),
        F.expr("CASE WHEN a2 > 0 THEN 1 WHEN a2 < 0 THEN -1 ELSE 0 END")
        .cast("int").alias("winding"),
        (F.col("a2").cast("double") / F.lit(2.0 * q * q))
        .alias("area_deg2"),
        F.expr(centroid.format(axis="yq", num="cyn", q=q))
        .alias("centroid_lat"),
        F.expr(centroid.format(axis="xq", num="cxn", q=q))
        .alias("centroid_lon"),
        (F.col("plen").cast("double") / F.lit(q)).alias("perim_deg"))
