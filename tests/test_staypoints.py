"""Stay-point detection — osmspark/spatial/staypoints.py.

Pins: gaps-and-islands run labeling (two visits to the SAME cell are
separate stays), min_points / min_duration filters, exact integer
centroids, and per-trip isolation.
"""

import pytest

from osmspark.spatial import detect_staypoints


@pytest.fixture(scope="module")
def stays(spark):
    # trip 1: 3 pts in cell (0,0), 2 pts in cell (2,2), then BACK to
    # (0,0) for 3 pts — the return is a second, separate stay.
    # trip 2: 3 pts in (0,0) too (isolation check).
    rows = []
    for i, (lat, lon) in enumerate([
            (0.10, 0.10), (0.20, 0.15), (0.15, 0.20),     # stay A
            (1.10, 1.10), (1.20, 1.20),                   # pass-through
            (0.05, 0.05), (0.10, 0.10), (0.20, 0.20)]):   # stay B
        rows.append((1, 1000000 * i, i, lat, lon))
    for i, (lat, lon) in enumerate([(0.1, 0.1), (0.1, 0.2), (0.2, 0.1)]):
        rows.append((2, 1000000 * i, 100 + i, lat, lon))
    df = spark.createDataFrame(
        rows, "trip_id long, ts_us long, id long, lat double, lon double")
    return df


def test_two_visits_are_two_stays(spark, stays):
    out = detect_staypoints(stays, cell_deg=0.5, min_points=3).collect()
    t1 = sorted([r for r in out if r["trip_id"] == 1],
                key=lambda r: r["ts_start"])
    assert len(t1) == 2
    a, b = t1
    assert (a["cell_x"], a["cell_y"]) == (0, 0)
    assert (b["cell_x"], b["cell_y"]) == (0, 0)
    assert a["n_points"] == 3 and b["n_points"] == 3
    assert a["ts_end"] < b["ts_start"]          # disjoint in time
    # exact integer centroid: mean of (100000, 200000, 150000)
    assert a["centroid_lat_e6"] == 150000


def test_short_runs_filtered(stays):
    out = detect_staypoints(stays, cell_deg=0.5, min_points=3).collect()
    # the 2-point pass-through cell (2,2) never appears
    assert not [r for r in out if r["cell_x"] == 2]


def test_trip_isolation(stays):
    out = detect_staypoints(stays, cell_deg=0.5, min_points=3).collect()
    t2 = [r for r in out if r["trip_id"] == 2]
    assert len(t2) == 1 and t2[0]["n_points"] == 3


def test_min_duration_filter(stays):
    # stay duration is 2s (3 pts at 1s spacing); a 5s floor kills all
    out = detect_staypoints(stays, cell_deg=0.5, min_points=3,
                            min_duration_us=5_000_000).collect()
    assert out == []
