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

__all__ = ["convex_hull_edges"]

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
