"""Per-cell OLS activity trend — osmspark/spatial/trend.py."""

import numpy as np

from osmspark.spatial.trend import activity_trend

SCHEMA = "ts_us long, lat double, lon double"
US_DAY = 86_400_000_000


def _mk(day_counts, lat=0.1, lon=0.1):
    """day_counts: {day: n_events} -> rows in one cell."""
    rows = []
    for day, n in day_counts.items():
        for i in range(n):
            rows.append((day * US_DAY + i * 1000, lat, lon))
    return rows


def test_slope_matches_numpy(spark):
    dc = {100: 3, 101: 5, 103: 4, 107: 11, 110: 6}
    got = activity_trend(
        spark.createDataFrame(_mk(dc), SCHEMA)).collect()[0]
    xs = np.array(sorted(dc), dtype=float)
    ys = np.array([dc[d] for d in sorted(dc)], dtype=float)
    b, a = np.polyfit(xs, ys, 1)
    assert got["n_days"] == 5 and got["n_events"] == 29
    assert abs(got["slope"] - b) < 1e-9
    assert abs(got["intercept"] - a) < 1e-9


def test_perfect_linear_trend_exact(spark):
    # y = 2x + 3 for x in 0..4 -> slope exactly 2, intercept exactly 3
    dc = {x: 2 * x + 3 for x in range(5)}
    got = activity_trend(
        spark.createDataFrame(_mk(dc), SCHEMA)).collect()[0]
    assert got["slope"] == 2.0
    assert got["intercept"] == 3.0


def test_single_day_null(spark):
    got = activity_trend(
        spark.createDataFrame(_mk({55: 7}), SCHEMA)).collect()[0]
    assert got["slope"] is None and got["intercept"] is None
    assert got["n_days"] == 1 and got["n_events"] == 7


def test_cells_are_independent(spark):
    rows = _mk({10: 1, 11: 2}, lat=0.1, lon=0.1) + \
           _mk({10: 9, 11: 1}, lat=5.1, lon=5.1)
    got = {(r["cell_x"], r["cell_y"]): r for r in activity_trend(
        spark.createDataFrame(rows, SCHEMA)).collect()}
    assert got[(0, 0)]["slope"] == 1.0
    assert got[(10, 10)]["slope"] == -8.0


def test_partitioning_invariance(spark):
    rows = [((100 + (i % 13)) * US_DAY + i, 0.1 * (i % 7), 0.1 * (i % 5))
            for i in range(500)]
    df1 = spark.createDataFrame(rows, SCHEMA).repartition(1)
    df11 = spark.createDataFrame(rows, SCHEMA).repartition(11)
    a = sorted(map(tuple, activity_trend(df1).collect()))
    b = sorted(map(tuple, activity_trend(df11).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# mann_kendall
# ---------------------------------------------------------------------------

import math as _math

from osmspark.spatial.trend import mann_kendall

MSCHEMA = "cell_x long, cell_y long, day long, y long"


def _mk_np(series):
    ys = [y for _, y in sorted(series)]
    n = len(ys)
    s = sum((yj > yi) - (yj < yi)
            for i, yi in enumerate(ys) for yj in ys[i + 1:])
    from collections import Counter
    ties = Counter(ys)
    v18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values())
    if v18 <= 0:
        return s, v18, None
    corr = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    return s, v18, corr / _math.sqrt(v18 / 18.0)


def test_mk_matches_reference(spark):
    series = [(d, (d * 37) % 11 + d // 3) for d in range(15)]
    rows = mann_kendall(spark.createDataFrame(
        [(0, 0, d, y) for d, y in series], MSCHEMA)).collect()
    s, v18, z = _mk_np(series)
    r = rows[0]
    assert (r["s_stat"], r["v18"]) == (s, v18)
    assert abs(r["mk_z"] - z) < 1e-9


def test_mk_monotone_series_max_s(spark):
    rows = mann_kendall(spark.createDataFrame(
        [(0, 0, d, d * 2) for d in range(10)], MSCHEMA)).collect()
    r = rows[0]
    assert r["s_stat"] == 45  # all 45 pairs increasing
    assert r["mk_z"] > 3.0


def test_mk_constant_series_null(spark):
    rows = mann_kendall(spark.createDataFrame(
        [(0, 0, d, 7) for d in range(8)], MSCHEMA)).collect()
    r = rows[0]
    assert r["s_stat"] == 0 and r["v18"] == 0 and r["mk_z"] is None


def test_mk_decreasing_negative(spark):
    rows = mann_kendall(spark.createDataFrame(
        [(0, 0, d, 100 - d) for d in range(12)], MSCHEMA)).collect()
    assert rows[0]["s_stat"] == -66 and rows[0]["mk_z"] < -3.0


def test_mk_cells_independent(spark):
    data = [(0, 0, d, d) for d in range(6)] + \
           [(5, 5, d, 10 - d) for d in range(6)]
    rows = {(r["cell_x"], r["cell_y"]): r for r in mann_kendall(
        spark.createDataFrame(data, MSCHEMA)).collect()}
    assert rows[(0, 0)]["s_stat"] == 15
    assert rows[(5, 5)]["s_stat"] == -15
