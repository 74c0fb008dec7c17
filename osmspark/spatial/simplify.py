"""Douglas–Peucker polyline simplification over assembled geometries.

The classic consumer op downstream of way-geometry assembly (render
pipelines, tile generalization). Inherently recursive per-geometry —
one of the few operators here that genuinely can't be a SQL expression
— so it runs as an Arrow-batched ``mapInPandas`` over the geometry
table: per-way work is NumPy-vectorized (the argmax over a segment's
interior is one fused kernel), ways are independent rows, and the map
is narrow — NO shuffle; at 10^9 ways this parallelizes embarrassingly
and the only data movement is the scan.

Determinism contract (what the recursive-CTE DuckDB oracle pins):

- split at the interior point with max perpendicular distance; ties
  break to the LOWEST index (np.argmax / list_indexof first-match);
- a point splits iff ``dist > tolerance`` STRICTLY — comparisons are
  division-free (``cross² > tol²·len²``) so both engines evaluate the
  identical IEEE predicate;
- degenerate segments (coincident endpoints) fall back to point
  distance;
- endpoints always kept; rows with < 3 points pass through.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["simplify_polylines"]

_OUT_SCHEMA = "way_id long, pos int, lat double, lon double"


def _dp_keep(lats: np.ndarray, lons: np.ndarray, tol2: float) -> np.ndarray:
    n = len(lats)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        x1, y1 = lons[lo], lats[lo]
        x2, y2 = lons[hi], lats[hi]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        xs = lons[lo + 1:hi]
        ys = lats[lo + 1:hi]
        if len2 == 0.0:
            d = (xs - x1) * (xs - x1) + (ys - y1) * (ys - y1)
            thresh = tol2
        else:
            cr = dx * (ys - y1) - dy * (xs - x1)
            d = cr * cr
            thresh = tol2 * len2
        i = int(np.argmax(d))  # first max → lowest index
        if d[i] > thresh:
            split = lo + 1 + i
            keep[split] = True
            stack.append((lo, split))
            stack.append((split, hi))
    return keep


def simplify_polylines(geoms: DataFrame, tolerance: float,
                       id_col: str = "way_id", lats_col: str = "lats",
                       lons_col: str = "lons") -> DataFrame:
    """Kept vertices per way as (way_id, pos, lat, lon) rows.

    ``geoms`` is the assembled-geometry shape (id + coordinate arrays
    in ref order, e.g. ``assemble_way_geometries`` output). Row-per-
    vertex output keeps the contract scalar-comparable (no array
    formatting ambiguity in the oracle)."""
    tol2 = float(tolerance) * float(tolerance)
    cols = geoms.select(id_col, lats_col, lons_col)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_pos, out_lat, out_lon = [], [], [], []
            for wid, la, lo in zip(pdf[id_col], pdf[lats_col],
                                   pdf[lons_col]):
                la = np.asarray(la, dtype=np.float64)
                lo = np.asarray(lo, dtype=np.float64)
                k = _dp_keep(la, lo, tol2)
                pos = np.flatnonzero(k)
                out_id.append(np.full(len(pos), wid, dtype=np.int64))
                out_pos.append(pos.astype(np.int32))
                out_lat.append(la[pos])
                out_lon.append(lo[pos])
            if not out_id:
                continue
            yield pd.DataFrame({
                "way_id": np.concatenate(out_id),
                "pos": np.concatenate(out_pos),
                "lat": np.concatenate(out_lat),
                "lon": np.concatenate(out_lon)})

    return cols.mapInPandas(run, _OUT_SCHEMA)
