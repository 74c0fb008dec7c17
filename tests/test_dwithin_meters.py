"""Geodesic within-distance join — dwithin_meters_join.

Completeness is pinned against a NumPy all-pairs haversine (independent
reimplementation) on point sets chosen to stress the banded grid: a
polar cap (collapsed 360° cells), a pair straddling a band boundary,
and near-threshold distances on both sides of the radius.
"""

import math

import numpy as np
import pytest

from osmspark.spatial import dwithin_meters_join
from osmspark.spatial.geometry import EARTH_RADIUS_M


def _brute(pts, r_m):
    ids = [p[0] for p in pts]
    lat = np.radians(np.array([p[1] for p in pts]))
    lon = np.radians(np.array([p[2] for p in pts]))
    out = set()
    for i in range(len(pts)):
        dphi = (lat - lat[i]) / 2
        dlam = (lon - lon[i]) / 2
        hav = (np.sin(dphi) ** 2
               + np.cos(lat[i]) * np.cos(lat) * np.sin(dlam) ** 2)
        d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(hav))
        for j in range(len(pts)):
            if ids[i] < ids[j] and d[j] <= r_m:
                out.add((ids[i], ids[j]))
    return out


@pytest.fixture(scope="module")
def stress_points():
    pts = [
        (1, 40.0, 10.0), (2, 40.0, 10.2),        # ~17 km at 40°: inside 20 km
        (3, 40.0, 10.5),                          # ~42 km from 1: outside
        (4, 69.99, 20.0), (5, 70.01, 20.4),       # band-boundary straddle
        (6, 89.5, 0.0), (7, 89.5, 180.0),         # polar cap: ~111 km apart
        (8, 89.93, 0.0), (9, 89.93, 90.0),        # polar: ~11 km (inside 20)
        (10, -40.0, 10.0), (11, -40.17, 10.0),    # southern hemisphere ~19 km
        (12, 0.0, 0.0), (13, 0.18, 0.0),          # equator ~20.02 km: outside
    ]
    return pts


def test_matches_numpy_brute_force(spark, stress_points):
    r = 20000.0
    df = spark.createDataFrame(stress_points,
                               "id long, lat double, lon double")
    got = {(r["a_id"], r["b_id"])
           for r in dwithin_meters_join(df, df, r, keep_self=False)
           .collect()}
    assert got == _brute(stress_points, r)


def test_band_straddle_pair_found(spark, stress_points):
    df = spark.createDataFrame(stress_points,
                               "id long, lat double, lon double")
    got = {(r["a_id"], r["b_id"])
           for r in dwithin_meters_join(df, df, 20000.0, keep_self=False)
           .collect()}
    # 4-5: Δlat 0.02° (~2.2 km), Δlon 0.4° at 70° (~15 km) → inside
    assert (4, 5) in got
    # 8-9: 90° of longitude at 89.93° is only ~12 km — the polar cells
    assert (8, 9) in got


def test_distance_value_exact(spark):
    # one degree of longitude at the equator, mm-rounded haversine
    df = spark.createDataFrame([(1, 0.0, 0.0), (2, 0.0, 1.0)],
                               "id long, lat double, lon double")
    rows = dwithin_meters_join(df, df, 120000.0, keep_self=False).collect()
    assert len(rows) == 1
    expect = round(2 * EARTH_RADIUS_M * math.asin(
        math.sqrt(math.sin(math.radians(1.0) / 2) ** 2)), 3)
    assert rows[0]["dist_m"] == expect
