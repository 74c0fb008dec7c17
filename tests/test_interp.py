"""idw_grid: exact fixed-point NumPy oracle, neighborhood completeness,
partition-order invariance, and the one-shuffle plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmspark.spatial.interp import idw_grid

CELL = 500_000          # 0.5 deg in 1e-6 deg units
SCALE = 10 ** 15


@pytest.fixture(scope="module")
def samples_pdf():
    rng = np.random.default_rng(11)
    n = 4000
    return pd.DataFrame({
        "lat": rng.uniform(-3, 3, n).round(6),
        "lon": rng.uniform(-3, 3, n).round(6),
        "value_int": rng.integers(0, 100_000, n),
    })


def _brute(pdf):
    y = np.round(pdf["lat"].to_numpy() * 1e6).astype(np.int64)
    x = np.round(pdf["lon"].to_numpy() * 1e6).astype(np.int64)
    v = pdf["value_int"].to_numpy().astype(object)     # exact bigint math
    sx = np.floor_divide(x, CELL)
    sy = np.floor_divide(y, CELL)
    acc: dict[tuple[int, int], list] = {}
    for i in range(len(pdf)):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = int(sx[i] + dx), int(sy[i] + dy)
                ccx = cx * CELL + CELL // 2
                ccy = cy * CELL + CELL // 2
                d2 = (int(x[i]) - ccx) ** 2 + (int(y[i]) - ccy) ** 2
                w = SCALE // (1 + d2)
                e = acc.setdefault((cx, cy), [0, 0, 0])
                e[0] += 1
                e[1] += w * int(v[i])
                e[2] += w
    return {k: (n, float(num) / float(den))
            for k, (n, num, den) in acc.items()}


def test_matches_exact_oracle(spark, samples_pdf):
    got = idw_grid(spark.createDataFrame(samples_pdf)).toPandas()
    exp = _brute(samples_pdf)
    got_map = {(int(r.cell_x), int(r.cell_y)): (int(r.n_samples), r.idw)
               for r in got.itertuples()}
    assert set(got_map) == set(exp)
    for k in exp:
        assert got_map[k][0] == exp[k][0]
        # both sides: exact-integer num/den then ONE IEEE division
        assert got_map[k][1] == exp[k][1], k


def test_partition_order_invariant(spark, samples_pdf):
    a = idw_grid(spark.createDataFrame(samples_pdf)).toPandas()
    shuffled = samples_pdf.sample(frac=1.0, random_state=3)
    b = idw_grid(spark.createDataFrame(shuffled).repartition(13)) \
        .toPandas()
    am = {(r.cell_x, r.cell_y): r.idw for r in a.itertuples()}
    bm = {(r.cell_x, r.cell_y): r.idw for r in b.itertuples()}
    assert am == bm     # decimal sums: bit-identical under any order


def test_single_shuffle_plan(spark, samples_pdf):
    plan = idw_grid(spark.createDataFrame(samples_pdf)) \
        ._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the cell groupBy (plus AQE reuse markers at most)
    assert plan.count("Exchange hashpartitioning") == 1


def test_bad_cell_deg_rejected(spark, samples_pdf):
    with pytest.raises(ValueError):
        idw_grid(spark.createDataFrame(samples_pdf), cell_deg=1 / 3)
