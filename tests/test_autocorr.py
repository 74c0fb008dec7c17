"""Moran's I — osmspark/spatial/autocorr.py.

Pins the sign behavior on crafted lattices (checkerboard → strongly
negative, two homogeneous halves → positive), the exact integer
moments vs a NumPy float reference, and the degenerate NULL cases.
"""

import numpy as np
import pytest

from osmspark.spatial.autocorr import morans_i


def _moran_np(cells):
    xs = np.array([c[2] for c in cells], dtype=float)
    n = len(cells)
    xbar = xs.mean()
    pos = {(c[0], c[1]): i for i, c in enumerate(cells)}
    num = 0.0
    w = 0
    for (cx, cy), i in pos.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            j = pos.get((cx + dx, cy + dy))
            if j is not None:
                num += (xs[i] - xbar) * (xs[j] - xbar)
                w += 1
    den = ((xs - xbar) ** 2).sum()
    return n / w * num / den


def _run(spark, cells):
    df = spark.createDataFrame(cells, "cell_x long, cell_y long, n long")
    return morans_i(df).collect()[0]


def test_checkerboard_is_strongly_negative(spark):
    cells = [(x, y, 10 if (x + y) % 2 == 0 else 1)
             for x in range(4) for y in range(4)]
    r = _run(spark, cells)
    assert r["moran_i"] < -0.9
    assert abs(r["moran_i"] - _moran_np(cells)) < 1e-9
    assert r["w_pairs"] == 2 * (2 * 3 * 4)    # 24 lattice edges, ordered


def test_two_halves_positive(spark):
    cells = [(x, y, 100 if x < 2 else 1)
             for x in range(4) for y in range(4)]
    r = _run(spark, cells)
    assert r["moran_i"] > 0.5
    assert abs(r["moran_i"] - _moran_np(cells)) < 1e-9


def test_constant_values_null(spark):
    cells = [(x, 0, 7) for x in range(5)]
    r = _run(spark, cells)
    assert r["moran_i"] is None          # den = 0
    assert r["den"] == 0


def test_no_adjacency_null(spark):
    cells = [(0, 0, 1), (5, 5, 9)]       # isolated cells
    r = _run(spark, cells)
    assert r["w_pairs"] == 0
    assert r["moran_i"] is None
