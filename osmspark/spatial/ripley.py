"""Ripley's K function — the multi-scale point-pattern statistic
(clustered vs dispersed vs CSR at each radius).

K̂(r) = (A/n²)·Σ_{i≠j} 1(d_ij ≤ r), evaluated at a radius ladder in one
pass: the pair stage runs the lat-banded ST_DWithin bucket join
(:func:`osmspark.spatial.dwithin.dwithin_meters_join`) ONCE at
max(radii) — candidate generation is a grid equi-join, never all-pairs
— and every smaller radius is a conditional count over the same
surviving pair set (map-side combinable; no second shuffle, no
pair×radius row inflation). The reference (marook/osm-read,
lib/pbfParser.js) stops at entity decode; this is the consumer-side
spatial statistic run on the decoded points.

Exactness: per-radius ordered-pair counts are exact int64 (the join's
mm-rounded haversine ``dist_m`` is the same IEEE expression tree the
DuckDB oracle recomputes brute-force, which also re-proves the banded
cover's completeness at max(radii)); the join runs with ``wrap=True``
so antimeridian pairs are counted — the brute-force oracle's haversine
is wrap-correct, so the grid must be too; K̂ is ONE division of exact
integers by the caller-supplied study area. No edge correction (the
"none" estimator) — border/Ripley corrections need the window geometry
and are out of scope here; document A accordingly.

Scale: one bucket-join shuffle at the largest radius + one global
aggregate. Radius ladders should stay within ~1 order of magnitude —
max(radii) drives the cell size, so a ladder like [1 m … 100 km] makes
every 1 m-scale pair ride a 100 km-cell join; split such ladders into
per-decade calls.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .dwithin import dwithin_meters_join

__all__ = ["ripleys_k"]


def ripleys_k(points: DataFrame, radii_m: Sequence[float],
              area_m2: float, id_col: str = "id") -> DataFrame:
    """(r_m, n_pairs, k_hat) for each radius, ascending.

    ``n_pairs`` counts ORDERED pairs (i ≠ j, both directions — the
    estimator's double sum) with haversine distance ≤ r;
    ``k_hat = area_m2 · n_pairs / n²``. Pass the study-window area in
    m² (no edge correction is applied).
    """
    radii = sorted(float(r) for r in radii_m)
    if not radii or radii[0] <= 0:
        raise ValueError("radii_m must be positive")

    pts = points.select(F.col(id_col).alias("id"), "lat", "lon")
    # a<b half-pairs once at the envelope radius; each smaller radius
    # is a combinable conditional sum over the SAME pair set. The
    # envelope is 1 mm wider than max(radii) so a pair whose mm-ROUNDED
    # dist_m equals the top radius is always present and the
    # dist_m <= r comparison (mirrored by the oracle) is the sole
    # decider — the join's unrounded hav prefilter never clips it.
    pairs = dwithin_meters_join(pts, pts, radii[-1] + 0.001,
                                keep_self=False, wrap=True)
    counts = pairs.agg(*[
        F.coalesce(F.sum(F.when(F.col("dist_m") <= F.lit(r), 2)), F.lit(0))
        .cast("long").alias(f"_c{i}")
        for i, r in enumerate(radii)])
    n_row = pts.agg(F.count(F.lit(1)).cast("long").alias("_n"))

    ladder = F.array(*[
        F.struct(F.lit(r).alias("r_m"), F.col(f"_c{i}").alias("n_pairs"))
        for i, r in enumerate(radii)])
    return (counts.crossJoin(n_row)          # two single-row frames
            .select(F.col("_n"), F.explode(ladder).alias("_e"))
            .select(F.col("_e.r_m").alias("r_m"),
                    F.col("_e.n_pairs").alias("n_pairs"),
                    (F.lit(float(area_m2)) * F.col("_e.n_pairs").cast("double")
                     / (F.col("_n") * F.col("_n")).cast("double"))
                    .alias("k_hat")))
