"""geofence_transitions: brute-force membership-series oracle, overlap
and first-observation semantics, and the one-Exchange plan."""

from __future__ import annotations

import pandas as pd
import pytest

from osmspark.spatial.geofence import geofence_transitions

FENCES = [
    {"fence_id": 1, "min_lat": 0.0, "max_lat": 10.0,
     "min_lon": 0.0, "max_lon": 10.0},
    {"fence_id": 2, "min_lat": 5.0, "max_lat": 15.0,
     "min_lon": 5.0, "max_lon": 15.0},          # overlaps fence 1
    {"fence_id": 3, "min_lat": -20.0, "max_lat": -10.0,
     "min_lon": -20.0, "max_lon": -10.0},       # never visited
]


@pytest.fixture(scope="module")
def points(spark):
    rows = []
    # trip 7: outside -> f1 -> f1∩f2 -> f2 -> outside -> f1 again
    path = [(-5.0, -5.0), (2.0, 2.0), (7.0, 7.0), (12.0, 12.0),
            (30.0, 30.0), (3.0, 3.0)]
    rows += [{"trip_id": 7, "ts": i, "id": 100 + i, "lat": la, "lon": lo}
             for i, (la, lo) in enumerate(path)]
    # trip 8: STARTS inside the overlap (first observation = enter both)
    rows += [{"trip_id": 8, "ts": 0, "id": 200, "lat": 6.0, "lon": 6.0},
             {"trip_id": 8, "ts": 1, "id": 201, "lat": 6.0, "lon": 6.0},
             {"trip_id": 8, "ts": 2, "id": 202, "lat": 50.0, "lon": 50.0}]
    return spark.createDataFrame(pd.DataFrame(rows))


def _brute(rows):
    """Per (trip, fence) membership series; lag default False."""
    out = []
    by_trip = {}
    for r in sorted(rows, key=lambda r: (r["trip_id"], r["ts"], r["id"])):
        by_trip.setdefault(r["trip_id"], []).append(r)
    for trip, seq in by_trip.items():
        for f in FENCES:
            prev = False
            for r in seq:
                ins = (f["min_lat"] <= r["lat"] <= f["max_lat"]
                       and f["min_lon"] <= r["lon"] <= f["max_lon"])
                if ins and not prev:
                    out.append((trip, r["ts"], r["id"],
                                f["fence_id"], "enter"))
                if prev and not ins:
                    out.append((trip, r["ts"], r["id"],
                                f["fence_id"], "exit"))
                prev = ins
    return sorted(out)


def test_matches_brute_force(points):
    got = geofence_transitions(points, FENCES).toPandas()
    got_rows = sorted((int(r.trip), int(r.ts), int(r.pid),
                       int(r.fence_id), r.kind)
                      for r in got.itertuples())
    exp = _brute([r.asDict() for r in points.collect()])
    assert got_rows == exp
    # sanity on the hand-built path: trip 7 enters f1 twice, exits twice
    t7f1 = [r for r in got_rows if r[0] == 7 and r[3] == 1]
    assert [r[4] for r in t7f1] == ["enter", "exit", "enter"]
    # first-observation-inside is an enter (trip 8, both fences at ts 0)
    t8 = [r for r in got_rows if r[0] == 8 and r[4] == "enter"]
    assert [(r[1], r[3]) for r in t8] == [(0, 1), (0, 2)]
    # the never-visited fence emits nothing
    assert not [r for r in got_rows if r[3] == 3]


def test_overlap_transitions_are_independent(points):
    got = geofence_transitions(points, FENCES).toPandas()
    # moving f1 -> overlap does NOT exit f1; overlap -> f2-only exits f1
    t7 = got[(got.trip == 7) & (got.fence_id == 1)]
    assert set(zip(t7.ts, t7.kind)) == {(1, "enter"), (3, "exit"),
                                        (5, "enter")}


def test_single_exchange_plan(points):
    plan = geofence_transitions(points, FENCES) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1          # the trip window only
    assert "CartesianProduct" not in plan


def test_empty_fences_rejected(points):
    with pytest.raises(ValueError):
        geofence_transitions(points, [])


def test_dwell_matches_python(spark):
    from osmspark.spatial.geofence import fence_dwell_times
    fences = [{"fence_id": 1, "min_lat": 0.0, "max_lat": 10.0,
               "min_lon": 0.0, "max_lon": 10.0},
              {"fence_id": 2, "min_lat": 5.0, "max_lat": 15.0,
               "min_lon": 5.0, "max_lon": 15.0}]
    # trip 7: outside → f1 → overlap(f1∩f2) → f2 → outside (uneven dts)
    rows = [(7, 100, 1, -5.0, -5.0),
            (7, 200, 2, 2.0, 2.0),     # f1       for 300 (until 500)
            (7, 500, 3, 7.0, 7.0),     # f1+f2    for 250
            (7, 750, 4, 12.0, 12.0),   # f2       for 150
            (7, 900, 5, 20.0, 20.0)]   # outside, closes nothing
    df = spark.createDataFrame(rows, "trip_id long, ts long, id long, "
                                     "lat double, lon double")
    got = {(int(r.trip), int(r.fence_id)): (int(r.dwell),
                                            int(r.n_intervals))
           for r in fence_dwell_times(df, fences, ts_col="ts").collect()}
    assert got == {(7, 1): (300 + 250, 2), (7, 2): (250 + 150, 2)}


def test_dwell_last_point_open(spark):
    from osmspark.spatial.geofence import fence_dwell_times
    fences = [{"fence_id": 1, "min_lat": 0.0, "max_lat": 10.0,
               "min_lon": 0.0, "max_lon": 10.0}]
    # a single observation inside closes no interval → no row
    df = spark.createDataFrame([(1, 100, 1, 5.0, 5.0)],
                               "trip_id long, ts long, id long, "
                               "lat double, lon double")
    assert fence_dwell_times(df, fences, ts_col="ts").count() == 0


def test_dwell_single_window_plan(spark):
    from osmspark.spatial.geofence import fence_dwell_times
    fences = [{"fence_id": 1, "min_lat": 0.0, "max_lat": 10.0,
               "min_lon": 0.0, "max_lon": 10.0}]
    df = spark.createDataFrame([(1, 100, 1, 5.0, 5.0)],
                               "trip_id long, ts long, id long, "
                               "lat double, lon double")
    plan = (fence_dwell_times(df, fences, ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window") == 1
