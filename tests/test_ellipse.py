"""deviational_ellipse: math-module oracle, axis-aligned and
degenerate structure, single aggregation plan pin."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from osmspark.spatial.ellipse import deviational_ellipse

PTS = ([(0, 40.0 + 0.002 * i, -73.0 + 0.001 * i) for i in range(30)]  # NE line
       + [(1, 10.0, 20.0), (1, 10.2, 20.0)]       # lat-aligned pair
       + [(2, -5.0, 7.5)]                          # single point
       + [(3, 51.0 + 0.01 * (i % 5), 0.5 + 0.03 * (i // 5))
          for i in range(25)])                     # grid cloud


def _oracle(rows):
    xs = [round(la * 1e6) for la, _ in rows]
    ys = [round(lo * 1e6) for _, lo in rows]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    qxx = sum(x * x for x in xs)
    qyy = sum(y * y for y in ys)
    qxy = sum(x * y for x, y in zip(xs, ys))
    cxx, cyy, cxy = n * qxx - sx * sx, n * qyy - sy * sy, n * qxy - sx * sy
    a, d, c = float(cxx + cyy), float(cxx - cyy), float(cxy)
    t = math.sqrt(d * d + 4.0 * c * c)
    sc = n * 1e6
    return (n, round(sx / sc, 9), round(sy / sc, 9),
            round(math.sqrt(max(0.0, (a + t) / 2.0)) / sc, 9),
            round(math.sqrt(max(0.0, (a - t) / 2.0)) / sc, 9),
            round(math.degrees(math.atan2(2.0 * c, d) / 2.0), 9))


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(PTS, "trip_id long, lat double, lon double")
    return {int(r.user): (int(r.n_points), r.center_lat, r.center_lon,
                          r.major_deg, r.minor_deg, r.theta_deg)
            for r in deviational_ellipse(df).collect()}


def test_matches_python_oracle(result):
    grp = defaultdict(list)
    for t, la, lo in PTS:
        grp[t].append((la, lo))
    assert result == {t: _oracle(rows) for t, rows in grp.items()}


def test_collinear_group_degenerates(result):
    # group 0 is a perfect line with direction (Δlat, Δlon) = (2, 1):
    # θ = atan(1/2) from the lat axis, minor axis collapses to ~0
    n, _, _, major, minor, theta = result[0]
    assert minor == pytest.approx(0.0, abs=1e-9)
    assert major > 0
    assert theta == pytest.approx(math.degrees(math.atan(0.5)), abs=1e-6)


def test_axis_aligned_pair(result):
    # two points differing only in lat: major axis IS the lat axis,
    # θ = 0 exactly (atan2(0, Cxx) = 0), minor axis 0
    n, clat, clon, major, minor, theta = result[1]
    assert (n, clat, clon) == (2, 10.1, 20.0)
    assert theta == 0.0 and minor == 0.0
    assert major == pytest.approx(0.1, abs=1e-9)


def test_single_point_zero_ellipse(result):
    assert result[2] == (1, -5.0, 7.5, 0.0, 0.0, 0.0)


def test_single_aggregation_no_window(spark):
    df = spark.createDataFrame(PTS, "trip_id long, lat double, lon double")
    plan = (deviational_ellipse(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2      # partial+final agg only
