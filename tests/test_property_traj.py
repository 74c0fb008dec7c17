"""Property-based cross-checks (hypothesis) for the trajectory
operators: random point streams vs pure-Python references. Few
examples (Spark jobs are seconds each), wide strategy space — the
generator covers duplicate timestamps, single-point trips, revisited
cells and negative coordinates.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from osmspark.spatial import detect_staypoints
from osmspark.spatial.flows import od_matrix

point = st.tuples(
    st.integers(0, 2),                        # trip
    st.integers(0, 50),                       # ts
    st.floats(-2.0, 2.0, allow_nan=False),    # lat
    st.floats(-2.0, 2.0, allow_nan=False))    # lon

traj = st.lists(point, min_size=1, max_size=25).map(
    lambda ps: [(t, ts, i, lat, lon)
                for i, (t, ts, lat, lon) in enumerate(ps)])


def _cells(rows, cell=1.0):
    import math
    return [(t, ts, i, math.floor(lon / cell), math.floor(lat / cell))
            for t, ts, i, lat, lon in rows]


def _stays_py(rows, min_points=2):
    out = []
    by_trip = {}
    for t, ts, i, cx, cy in sorted(_cells(rows),
                                   key=lambda r: (r[0], r[1], r[2])):
        by_trip.setdefault(t, []).append((ts, i, cx, cy))
    for t, pts in by_trip.items():
        run = []
        for p in pts:
            if run and (p[2], p[3]) != (run[-1][2], run[-1][3]):
                if len(run) >= min_points:
                    out.append((t, run[0][2], run[0][3], len(run)))
                run = []
            run.append(p)
        if len(run) >= min_points:
            out.append((t, run[0][2], run[0][3], len(run)))
    return sorted(out)


def _od_py(rows, cell=1.0):
    by_trip = {}
    for t, ts, i, cx, cy in _cells(rows):
        by_trip.setdefault(t, []).append((ts, i, cx, cy))
    flows = {}
    for t, pts in by_trip.items():
        pts.sort()
        o, d = pts[0], pts[-1]
        k = (o[2], o[3], d[2], d[3])
        n, dur = flows.get(k, (0, 0))
        flows[k] = (n + 1, dur + (d[0] - o[0]))
    return flows


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(traj)
def test_staypoints_match_python_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "trip_id long, ts_us long, id long, lat double, lon double")
    got = sorted((r["trip_id"], r["cell_x"], r["cell_y"], r["n_points"])
                 for r in detect_staypoints(df, cell_deg=1.0,
                                            min_points=2).collect())
    assert got == _stays_py(rows)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(traj)
def test_od_matrix_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "trip_id long, ts_us long, id long, lat double, lon double")
    got = {(r["o_cell_x"], r["o_cell_y"], r["d_cell_x"], r["d_cell_y"]):
           (r["n_trips"], r["total_duration_us"])
           for r in od_matrix(df, cell_deg=1.0).collect()}
    assert got == _od_py(rows)
