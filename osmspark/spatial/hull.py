"""Per-group convex hull (ST_ConvexHull as a grouped aggregate) with an
INTEGER-EXACT orientation predicate — deterministic enough to pin
against an independent O(n³) SQL oracle.

Semantics: points quantize to a fixed grid (``scale`` ticks per degree,
the same ``round(x·scale)`` parity pattern as ``layout.py``), duplicates
collapse, and the hull is the STRICT convex hull of the distinct grid
points — collinear boundary points are NOT vertices. Output is the
directed CCW edge set, which has a clean closed-form characterization
an oracle can recompute without running any hull algorithm:

    (a, b) is a CCW hull edge  ⇔  every other point p satisfies
    cross(b−a, p−a) > 0, or cross = 0 with p inside ab's bounding box
    (collinear between — exact on integers).

Degenerate groups degrade consistently in both formulations: a single
distinct point emits no edges; an all-collinear group emits the two
directed edges of its extreme segment (every interior point is
collinear-between for both directions).

Overflow bound: the cross product is int64; with coordinate magnitudes
≤ M ticks it needs 2·(2M)² < 2^63, i.e. M < 1.07e9 — the default
``scale = 1e6`` (≈ 11 cm grid) is safe for the whole globe
(M ≤ 3.6e8); ``scale = 1e7`` (the layout's lossless OSM quantum) is
safe while every group spans < ±107°.

Scale shape: one ``applyInPandas`` over ``groupBy(group)`` — the
standard Spark treatment for a per-group geometric aggregate with
data-dependent control flow (Andrew's monotone chain is inherently
sequential per group, but groups distribute perfectly and the scan is
NumPy-vectorized up to the stack walk). Input rows shrink to
(group, x_q, y_q) ints before the shuffle; hull output is O(h) per
group. Reference scope: osm-read stops at decode (lib/pbfParser.js) —
hulls are consumer-side geometry this engine adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["convex_hull_edges", "hull_metrics"]

_OUT_SCHEMA = ("group_id long, ax_q long, ay_q long, bx_q long, by_q long")


def _hull_ccw(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain, strict turns (collinear popped), CCW.

    ``pts``: (n, 2) int64 [x, y], distinct, lexicographically sorted.
    Returns the hull vertices CCW; 1 row for a single point, 2 for a
    collinear set (the extreme segment's endpoints).
    """
    n = len(pts)
    if n <= 2:
        return pts

    def build(seq):
        stack: list[np.ndarray] = []
        for p in seq:
            while len(stack) >= 2:
                o, a = stack[-2], stack[-1]
                if ((a[0] - o[0]) * (p[1] - o[1])
                        - (a[1] - o[1]) * (p[0] - o[0])) <= 0:
                    stack.pop()
                else:
                    break
            stack.append(p)
        return stack

    lower = build(pts)
    upper = build(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    return np.asarray(hull, dtype=np.int64)


def convex_hull_edges(points: DataFrame, group_col: str = "group_id",
                      lat_col: str = "lat", lon_col: str = "lon",
                      scale: float = 1e6) -> DataFrame:
    """(group_id, ax_q, ay_q, bx_q, by_q): directed CCW hull edges per
    group over the ``scale``-quantized distinct points (x = lon ticks,
    y = lat ticks). See module docstring for exact semantics and the
    int64 overflow bound on ``scale``.
    """
    q = (points.select(
            F.col(group_col).alias("group_id"),
            F.round(F.col(lon_col) * scale).cast("long").alias("x_q"),
            F.round(F.col(lat_col) * scale).cast("long").alias("y_q"))
         .distinct())

    def hull(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf["group_id"].iloc[0]
        pts = np.unique(
            pdf[["x_q", "y_q"]].to_numpy(dtype=np.int64), axis=0)
        h = _hull_ccw(pts)
        m = len(h)
        if m < 2:
            return pd.DataFrame(columns=["group_id", "ax_q", "ay_q",
                                         "bx_q", "by_q"]).astype("int64")
        nxt = np.roll(np.arange(m), -1)
        if m == 2:
            a, b = h, h[::-1]
        else:
            a, b = h, h[nxt]
        return pd.DataFrame({
            "group_id": np.full(len(a), gid, dtype=np.int64),
            "ax_q": a[:, 0], "ay_q": a[:, 1],
            "bx_q": b[:, 0], "by_q": b[:, 1]})

    return q.groupBy("group_id").applyInPandas(hull, _OUT_SCHEMA)


def hull_metrics(points: DataFrame, group_col: str = "group_id",
                 lat_col: str = "lat", lon_col: str = "lon",
                 scale: float = 1e6) -> DataFrame:
    """Activity-space metrics per group: convex-hull area + perimeter
    (the standard mobility "activity space" statistic — the areal
    companion to ``mobility.radius_of_gyration``), composed on the
    CCW edge set of ``convex_hull_edges``.

    - ``area2_q`` — the shoelace sum Σ (ax·by − bx·ay) over the
      directed CCW edges = 2·area in ticks² — an EXACT int64
      (order-insensitive; bound 2·(2M)² < 2^63 as per the module
      docstring), ≥ 0 by the CCW orientation, 0 for collinear groups.
    - ``perim_q`` — Σ floor(√(Δx² + Δy²)) ticks, floored PER EDGE so
      the sum is an integer census (order-insensitive). Δ² can exceed
      2^53, so the √ argument is the nearest-double of the exact
      integer — the same IEEE conversion+sqrt on any engine, hence
      still deterministic cross-engine (and ≤ 1 tick absolute error
      per edge vs exact).
    - ``area_deg2`` — area2_q / (2·scale²), ONE float division of
      exact operands, 9 dp.

    Groups with < 2 distinct points emit no row (no edges — same
    convention as the edge set). A 2-point collinear group closes
    degenerately: area 0, perimeter = 2·segment.
    Output: (group_id, n_edges, area2_q, perim_q, area_deg2).
    """
    e = convex_hull_edges(points, group_col=group_col, lat_col=lat_col,
                          lon_col=lon_col, scale=scale)
    cross = (F.col("ax_q") * F.col("by_q")
             - F.col("bx_q") * F.col("ay_q"))
    dx = (F.col("bx_q") - F.col("ax_q")).cast("double")
    dy = (F.col("by_q") - F.col("ay_q")).cast("double")
    seg = F.floor(F.sqrt(dx * dx + dy * dy)).cast("long")
    g = (e.groupBy("group_id")
         .agg(F.count(F.lit(1)).alias("n_edges"),
              F.sum(cross).alias("area2_q"),
              F.sum(seg).alias("perim_q")))
    return g.select(
        "group_id", "n_edges",
        F.col("area2_q").cast("long").alias("area2_q"),
        F.col("perim_q").cast("long").alias("perim_q"),
        F.round(F.col("area2_q").cast("double")
                / F.lit(2.0 * scale * scale), 9).alias("area_deg2"))
