"""emerging_hotspots: full Python re-derivation (brute Gi*, M-K,
class cascade) on a crafted cube plus targeted class-structure pins."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from osmspark.spatial.emerging import emerging_hotspots

# 4×3 lattice × 6 bins. Base load 10 everywhere; a ramping hot corner,
# a one-bin spike (new_hot), a fading block, a cold trench.
CUBE = {}
for x in range(4):
    for y in range(3):
        for t in range(6):
            v = 10
            if (x, y) == (0, 0):
                v += 4 * t            # ramp → hot + uptrend
            if (x, y) == (3, 2) and t == 5:
                v += 40               # last-bin spike
            if (x, y) == (1, 1):
                v += 20 - 3 * t       # fading
            if (x, y) == (2, 0):
                v = 1                 # persistent trench
            CUBE[(x, y, t)] = v


def _gi_z(crit=1.0):
    n = len(CUBE)
    s = sum(CUBE.values())
    q = sum(v * v for v in CUBE.values())
    out = {}
    for (cx, cy, tb) in CUBE:
        w = lsum = 0
        for (ax, ay, at), v in CUBE.items():
            if max(abs(ax - cx), abs(ay - cy), abs(at - tb)) <= 1:
                w += 1
                lsum += v
        b = n * q - s * s
        c = n * w - w * w
        if n > 1 and c > 0 and b > 0:
            out[(cx, cy, tb)] = round(
                (n * lsum - s * w)
                / (math.sqrt(b) * math.sqrt(c / (n - 1))), 9)
    return out


def _mk(series):
    ys = [y for _, y in sorted(series)]
    n = len(ys)
    s = sum((ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n) for j in range(i + 1, n))
    ties = defaultdict(int)
    for y in ys:
        ties[y] += 1
    v18 = n * (n - 1) * (2 * n + 5) \
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    if v18 <= 0:
        return None
    corr = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    return round(corr / math.sqrt(v18 / 18.0), 9)


def _classify(crit=1.0):
    z = _gi_z()
    cells = defaultdict(list)
    for (cx, cy, tb), v in z.items():
        cells[(cx, cy)].append((tb, v))
    out = {}
    for cell, series in cells.items():
        zs = [v for _, v in series]
        n_bins = len(zs)
        n_hot = sum(v >= crit for v in zs)
        n_cold = sum(v <= -crit for v in zs)
        last_z = max(series)[1]
        mk = _mk(series)
        up = mk is not None and mk >= crit
        down = mk is not None and mk <= -crit
        if last_z >= crit and n_hot == 1:
            p = "new_hot"
        elif last_z >= crit and n_cold > 0:
            p = "oscillating_hot"
        elif last_z >= crit and 10 * n_hot >= 9 * n_bins and up:
            p = "intensifying_hot"
        elif last_z >= crit and 10 * n_hot >= 9 * n_bins and down:
            p = "diminishing_hot"
        elif last_z >= crit and 10 * n_hot >= 9 * n_bins:
            p = "persistent_hot"
        elif last_z >= crit:
            p = "sporadic_hot"
        elif last_z <= -crit and n_cold == 1:
            p = "new_cold"
        elif last_z <= -crit and n_hot > 0:
            p = "oscillating_cold"
        elif last_z <= -crit and 10 * n_cold >= 9 * n_bins and down:
            p = "intensifying_cold"
        elif last_z <= -crit and 10 * n_cold >= 9 * n_bins and up:
            p = "diminishing_cold"
        elif last_z <= -crit and 10 * n_cold >= 9 * n_bins:
            p = "persistent_cold"
        elif last_z <= -crit:
            p = "sporadic_cold"
        elif 2 * n_hot > n_bins:
            p = "historical_hot"
        elif 2 * n_cold > n_bins:
            p = "historical_cold"
        else:
            p = "no_pattern"
        out[cell] = (n_bins, n_hot, n_cold, last_z, mk, p)
    return out


@pytest.fixture(scope="module")
def result(spark):
    rows = [(x, y, t, v) for (x, y, t), v in CUBE.items()]
    df = spark.createDataFrame(
        rows, "cell_x long, cell_y long, tbin long, n long")
    return {(int(r.cell_x), int(r.cell_y)):
            (int(r.n_bins), int(r.n_hot), int(r.n_cold),
             r.last_z, r.mk_z, r.pattern)
            for r in emerging_hotspots(df, z_crit=1.0).collect()}


def test_matches_python_rederivation(result):
    assert result == _classify()


def test_crafted_structure(result):
    # the ramp corner ends hot; the spike cell is newly hot; the
    # trench ends cold — the crafted features land hot/new/cold
    assert result[(0, 0)][5].endswith("hot")
    assert result[(3, 2)][5] == "new_hot"
    assert result[(2, 0)][5].endswith("cold")
    # at least 4 distinct classes materialize on 12 cells
    assert len({v[5] for v in result.values()}) >= 4


def test_no_cartesian(spark):
    rows = [(x, y, t, v) for (x, y, t), v in CUBE.items()]
    df = spark.createDataFrame(
        rows, "cell_x long, cell_y long, tbin long, n long")
    plan = (emerging_hotspots(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------- burstiness

def test_burstiness_matches_python(spark):
    from osmspark.spatial.trend import burstiness
    rows = [(0, 0, t, [5, 5, 5, 5][t]) for t in range(4)] \
        + [(1, 0, t, [1, 1, 1, 17][t]) for t in range(4)] \
        + [(2, 0, 0, 0), (2, 0, 1, 0)]
    df = spark.createDataFrame(rows, "cell_x long, cell_y long, "
                                     "day long, y long")
    got = {(int(r.cell_x), int(r.cell_y)):
           (int(r.n_periods), int(r.s_sum), r.fano)
           for r in burstiness(df, t_col="day").collect()}

    def fano(ys):
        t, s, q = len(ys), sum(ys), sum(v * v for v in ys)
        return round((t * q - s * s) / (t * s), 9) if s else None

    assert got == {(0, 0): (4, 20, fano([5] * 4)),
                   (1, 0): (4, 20, fano([1, 1, 1, 17])),
                   (2, 0): (2, 0, None)}
    # constant series → F = 0; bursty series → F ≫ 1
    assert got[(0, 0)][2] == 0.0 and got[(1, 0)][2] > 1.0


def test_burstiness_single_aggregation(spark):
    from osmspark.spatial.trend import burstiness
    df = spark.createDataFrame([(0, 0, 0, 3)],
                               "cell_x long, cell_y long, day long, y long")
    plan = burstiness(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and plan.count("Exchange") <= 2


# ------------------------------------------------------------- lag autocorr

def test_lag_autocorr_matches_python(spark):
    from osmspark.spatial.trend import lag_autocorr
    series = {(0, 0): [3, 7, 3, 7, 3, 7],     # alternating → acf ≈ -1
              (1, 0): [1, 2, 3, 4, 5, 6],     # ramp → positive
              (2, 0): [5, 5, 5],              # constant → NULL (den 0)
              (3, 0): [4]}                    # single bin → NULL
    rows = [(cx, cy, t, y) for (cx, cy), ys in series.items()
            for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "cell_x long, cell_y long, "
                                     "day long, y long")
    got = {(int(r.cell_x), int(r.cell_y)):
           (int(r.n_periods), int(r.num), int(r.den), r.acf)
           for r in lag_autocorr(df, lag=1, t_col="day").collect()}

    def oracle(ys):
        t, s = len(ys), sum(ys)
        dev = [t * y - s for y in ys]
        num = sum(dev[i] * dev[i + 1] for i in range(t - 1))
        den = sum(d * d for d in dev)
        acf = round(num / den, 9) if den and t > 1 else None
        return (t, num, den, acf)

    assert got == {k: oracle(v) for k, v in series.items()}
    assert got[(0, 0)][3] < -0.8 and got[(1, 0)][3] >= 0.5
    assert got[(2, 0)][3] is None and got[(3, 0)][3] is None


def test_lag_autocorr_lag2_and_validation(spark):
    import pytest as _pytest

    from osmspark.spatial.trend import lag_autocorr
    ys = [3, 9, 3, 9, 3, 9]                    # period 2 → lag-2 acf +1
    rows = [(0, 0, t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "cell_x long, cell_y long, "
                                     "day long, y long")
    r = lag_autocorr(df, lag=2, t_col="day").collect()[0]
    assert r.acf > 0.6
    with _pytest.raises(ValueError):
        lag_autocorr(df, lag=0)
