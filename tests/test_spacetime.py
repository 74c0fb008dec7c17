"""Knox space-time statistic — osmspark/spatial/spacetime.py.

Brute-force O(n^2) reference over irregular point sets, exact pair
counts, and the bucket-join pair-dedup invariants (each unordered
pair surfaces exactly once regardless of cell/bin straddling).
"""

import itertools

from osmspark.spatial.spacetime import knox_statistic

SCHEMA = "id long, ts_us long, lat double, lon double"


def _brute(pts, r_udeg, tau_us):
    def u(v):
        # round-half-away-from-zero, like Spark/DuckDB round()
        import decimal
        return int(decimal.Decimal(v * 1e6).quantize(
            0, rounding=decimal.ROUND_HALF_UP))
    ns = nt = nb = 0
    for a, b in itertools.combinations(pts, 2):
        close_s = ((u(a[2]) - u(b[2])) ** 2
                   + (u(a[3]) - u(b[3])) ** 2) <= r_udeg ** 2
        close_t = abs(a[1] - b[1]) <= tau_us
        ns += close_s
        nt += close_t
        nb += close_s and close_t
    return ns, nt, nb


def test_matches_brute_force(spark):
    pts = [(i, (i * 37) % 101 * 3600_000_000,
            0.01 * ((i * 7) % 50), 0.01 * ((i * 13) % 60))
           for i in range(80)]
    r = knox_statistic(spark.createDataFrame(pts, SCHEMA),
                       radius_udeg=200_000,
                       tau_us=10 * 3600_000_000).collect()[0]
    ns, nt, nb = _brute(pts, 200_000, 10 * 3600_000_000)
    assert (r["n_space"], r["n_time"], r["n_both"]) == (ns, nt, nb)
    assert r["n_pairs"] == 80 * 79 // 2
    assert abs(r["expected"] - ns * nt / r["n_pairs"]) < 1e-9
    assert abs(r["knox_ratio"] - nb * r["n_pairs"] / (ns * nt)) < 1e-9


def test_cell_straddling_pair_counted_once(spark):
    # two points in adjacent cells but within radius; identical again
    # across the time-bin boundary
    pts = [(1, 86_400_000_000 - 1, 0.199, 0.0),
           (2, 86_400_000_000 + 1, 0.201, 0.0)]
    r = knox_statistic(spark.createDataFrame(pts, SCHEMA),
                       radius_udeg=200_000,
                       tau_us=86_400_000_000).collect()[0]
    assert r["n_space"] == 1 and r["n_time"] == 1 and r["n_both"] == 1


def test_negative_coords_and_exact_radius(spark):
    # distance exactly == radius is INSIDE (<=)
    pts = [(1, 0, -0.1, -0.1), (2, 0, -0.1, -0.3)]
    r = knox_statistic(spark.createDataFrame(pts, SCHEMA),
                       radius_udeg=200_000, tau_us=1).collect()[0]
    assert r["n_space"] == 1 and r["n_both"] == 1


def test_no_interaction_null_ratio(spark):
    # space-close pairs exist, time-close none -> ratio NULL
    pts = [(1, 0, 0.0, 0.0), (2, 10 ** 15, 0.01, 0.0)]
    r = knox_statistic(spark.createDataFrame(pts, SCHEMA),
                       radius_udeg=200_000, tau_us=1000).collect()[0]
    assert r["n_space"] == 1 and r["n_time"] == 0
    assert r["knox_ratio"] is None and r["expected"] == 0.0


def test_partitioning_invariance(spark):
    pts = [(i, (i * 1337) % 73 * 1_000_000_000,
            0.05 * ((i * 3) % 17), 0.05 * ((i * 11) % 19))
           for i in range(120)]
    a = knox_statistic(spark.createDataFrame(pts, SCHEMA).repartition(1),
                       radius_udeg=150_000, tau_us=30_000_000_000
                       ).collect()[0]
    b = knox_statistic(spark.createDataFrame(pts, SCHEMA).repartition(17),
                       radius_udeg=150_000, tau_us=30_000_000_000
                       ).collect()[0]
    assert tuple(a) == tuple(b)


# ---------------------------------------------------------------------------
# contact_pairs
# ---------------------------------------------------------------------------

from osmspark.spatial.spacetime import contact_pairs

USCHEMA = "trip_id long, id long, ts_us long, lat double, lon double"


def test_contacts_brute_force(spark):
    pts = [(i % 5, i, (i * 41) % 67 * 1_000_000_000,
            0.03 * ((i * 7) % 13), 0.03 * ((i * 11) % 17))
           for i in range(100)]
    got = {(r["user_a"], r["user_b"]): r["n_contacts"]
           for r in contact_pairs(
               spark.createDataFrame(pts, USCHEMA),
               radius_udeg=100_000, tau_us=20_000_000_000).collect()}
    import itertools
    ref = {}
    for a, b in itertools.combinations(pts, 2):
        if a[0] == b[0]:
            continue
        du = round(a[3] * 1e6) - round(b[3] * 1e6)
        dv = round(a[4] * 1e6) - round(b[4] * 1e6)
        if du * du + dv * dv <= 100_000 ** 2 and \
           abs(a[2] - b[2]) <= 20_000_000_000:
            key = tuple(sorted((a[0], b[0])))
            ref[key] = ref.get(key, 0) + 1
    assert got == ref


def test_contacts_same_user_excluded(spark):
    pts = [(1, 0, 0, 0.0, 0.0), (1, 1, 0, 0.0, 0.0),
           (2, 2, 0, 0.0, 0.0)]
    rows = contact_pairs(spark.createDataFrame(pts, USCHEMA),
                         radius_udeg=1000, tau_us=1000).collect()
    assert {(r["user_a"], r["user_b"], r["n_contacts"])
            for r in rows} == {(1, 2, 2)}


# ---------------------------------------------------------------------------
# gi_star_spacetime
# ---------------------------------------------------------------------------

import math

from osmspark.spatial.spacetime import gi_star_spacetime

BSCHEMA = "cell_x long, cell_y long, tbin long, n long"


def _gi_st_np(bins):
    xs = {(b[0], b[1], b[2]): b[3] for b in bins}
    n = len(xs)
    s = sum(xs.values())
    q = sum(v * v for v in xs.values())
    xbar = s / n
    s2 = q / n - xbar ** 2
    out = {}
    for (cx, cy, tb) in xs:
        nb = [xs[(cx + dx, cy + dy, tb + dt)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              for dt in (-1, 0, 1)
              if (cx + dx, cy + dy, tb + dt) in xs]
        w, l = len(nb), sum(nb)
        c = n * w - w * w
        if n > 1 and c > 0 and s2 > 0:
            out[(cx, cy, tb)] = (l - xbar * w) / (
                math.sqrt(s2) * math.sqrt(c / (n - 1)))
        else:
            out[(cx, cy, tb)] = None
    return out


def test_gi_st_matches_numpy(spark):
    bins = [(x, y, t, (x * 5 + y * 3 + t * 7) % 13 + 1)
            for x in range(3) for y in range(3) for t in range(4)]
    ref = _gi_st_np(bins)
    for r in gi_star_spacetime(
            spark.createDataFrame(bins, BSCHEMA)).collect():
        key = (r["cell_x"], r["cell_y"], r["tbin"])
        assert abs(r["gi_z"] - ref[key]) < 1e-6, key


def test_gi_st_temporal_neighborhood(spark):
    # one cell over 3 time bins: the middle bin sees all 3, edges 2
    bins = [(0, 0, t, 5 + t) for t in range(3)]
    rows = {r["tbin"]: r for r in gi_star_spacetime(
        spark.createDataFrame(bins, BSCHEMA)).collect()}
    assert rows[1]["w_i"] == 3 and rows[0]["w_i"] == 2
    assert rows[1]["l_sum"] == 18


def test_gi_st_hot_voxel_positive(spark):
    bins = [(x, y, t, 1) for x in range(4) for y in range(4)
            for t in range(3)]
    bins[0] = (0, 0, 0, 500)  # hot corner voxel
    rows = {(r["cell_x"], r["cell_y"], r["tbin"]): r["gi_z"]
            for r in gi_star_spacetime(
                spark.createDataFrame(bins, BSCHEMA)).collect()}
    assert rows[(0, 0, 0)] > 1.0
    assert rows[(3, 3, 2)] < 0.1
