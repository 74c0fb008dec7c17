"""Per-user mobility metrics — osmspark/spatial/mobility.py.

Pins each statistic against a NumPy float reference on irregular
point sets, the exact-integer edge cases (single fix, constant
location), and the deterministic endpoint tie-break in od_matrix.
"""

import math

import numpy as np

from osmspark.spatial.mobility import (location_diversity, od_matrix,
                                       radius_of_gyration)

SCHEMA = "trip_id long, ts_us long, id long, lat double, lon double"


def _rg_np(pts):
    a = np.array([(round(p[3] * 1e6), round(p[4] * 1e6)) for p in pts],
                 dtype=float)
    c = a.mean(axis=0)
    return math.sqrt(((a - c) ** 2).sum(axis=1).mean()) / 1e6


def test_rg_matches_numpy(spark):
    pts = [(1, t, t, 10.0 + 0.3 * (t % 5), 20.0 - 0.2 * (t % 7))
           for t in range(40)]
    got = radius_of_gyration(
        spark.createDataFrame(pts, SCHEMA)).collect()[0]
    assert got["n_points"] == 40
    assert abs(got["rg_deg"] - _rg_np(pts)) < 1e-9


def test_rg_single_and_constant_location(spark):
    pts = [(1, 0, 0, 5.5, -3.25)] + \
          [(2, t, t, 7.125, 7.125) for t in range(9)]
    rows = {r["user"]: r for r in radius_of_gyration(
        spark.createDataFrame(pts, SCHEMA)).collect()}
    assert rows[1]["rg_deg"] == 0.0
    assert rows[2]["rg_deg"] == 0.0


def test_rg_negative_coords_exact(spark):
    # 2 points symmetric about origin: rg = distance/2 exactly
    pts = [(1, 0, 0, -1.0, -2.0), (1, 1, 1, 1.0, 2.0)]
    got = radius_of_gyration(
        spark.createDataFrame(pts, SCHEMA)).collect()[0]
    assert abs(got["rg_deg"] - math.sqrt(5.0)) < 1e-9


def test_od_matrix_endpoints_and_ties(spark):
    pts = [
        # trip 1: clear first/last
        (1, 100, 1, 0.1, 0.1), (1, 200, 2, 0.2, 0.2),
        (1, 300, 3, 3.7, 3.7),
        # trip 2: duplicate timestamps — tie broken by id (4 first,
        # 6 last)
        (2, 500, 6, 8.1, 8.1), (2, 500, 4, 0.3, 0.3),
        (2, 500, 5, 4.4, 4.4),
        # trip 3: same O and D cell as trip 1
        (3, 10, 7, 0.4, 0.4), (3, 20, 8, 3.9, 3.9),
    ]
    got = {(r["o_cx"], r["o_cy"], r["d_cx"], r["d_cy"]): r["n_trips"]
           for r in od_matrix(
               spark.createDataFrame(pts, SCHEMA)).collect()}
    assert got[(0, 0, 7, 7)] == 2          # trips 1 and 3
    assert got[(0, 0, 16, 16)] == 1        # trip 2: id 4 -> id 6
    assert sum(got.values()) == 3


def test_od_matrix_single_point_trip_self_flow(spark):
    pts = [(9, 0, 0, 1.0, 1.0)]
    got = od_matrix(spark.createDataFrame(pts, SCHEMA)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["o_cx"], r["o_cy"]) == (r["d_cx"], r["d_cy"]) == (2, 2)


def test_location_diversity_matches_reference(spark):
    # user 1: cells with counts 3, 1 -> simpson = 1 - 10/16
    pts = [(1, t, t, 0.1, 0.1) for t in range(3)] + \
          [(1, 9, 9, 5.1, 5.1)]
    r = location_diversity(
        spark.createDataFrame(pts, SCHEMA)).collect()[0]
    assert r["n_points"] == 4 and r["n_cells"] == 2
    assert abs(r["simpson_div"] - (1 - 10 / 16)) < 1e-12
    assert abs(r["top_share"] - 0.75) < 1e-12


def test_location_diversity_single_cell_zero(spark):
    pts = [(1, t, t, 0.1 + 0.01 * t, 0.1) for t in range(5)]
    r = location_diversity(
        spark.createDataFrame(pts, SCHEMA)).collect()[0]
    assert r["simpson_div"] == 0.0 and r["top_share"] == 1.0
    assert r["n_cells"] == 1


def test_partitioning_invariance(spark):
    pts = [(u, t, u * 100 + t, 10.0 + 0.3 * ((u * t) % 5),
            -20.0 + 0.2 * ((u + t) % 9))
           for u in range(4) for t in range(25)]
    df1 = spark.createDataFrame(pts, SCHEMA).repartition(1)
    df13 = spark.createDataFrame(pts, SCHEMA).repartition(13)
    for fn in (radius_of_gyration, location_diversity):
        a = sorted(map(tuple, fn(df1).collect()))
        b = sorted(map(tuple, fn(df13).collect()))
        assert a == b, fn.__name__
