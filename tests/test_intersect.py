"""segment_intersect_join: exact-integer predicate cases, owner-cell
dedup, self-join semantics, brute-force parity, plan pin."""

import numpy as np

from osmspark.spatial.intersect import segment_intersect_join


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "way_id long, pos int, ax double, ay double, "
              "bx double, by double")


def _pairs(df):
    return sorted((r.a_way, r.a_pos, r.b_way, r.b_pos) for r in df.collect())


def test_cross_touch_collinear_cases(spark):
    a = _segs(spark, [
        (1, 0, 0.0, 0.0, 2.0, 2.0),    # crosses b0
        (2, 0, 5.0, 0.0, 5.0, 2.0),    # touches b1 (endpoint on interior)
        (3, 0, 10.0, 0.0, 12.0, 0.0),  # collinear-overlaps b2
        (4, 0, 20.0, 0.0, 21.0, 0.0),  # collinear-disjoint from b3
        (5, 0, 30.0, 0.0, 31.0, 0.0),  # parallel to b4, no touch
    ])
    b = _segs(spark, [
        (10, 0, 0.0, 2.0, 2.0, 0.0),
        (11, 0, 4.0, 2.0, 6.0, 2.0),
        (12, 0, 11.0, 0.0, 13.0, 0.0),
        (13, 0, 22.0, 0.0, 23.0, 0.0),
        (14, 0, 30.0, 1.0, 31.0, 1.0),
    ])
    got = _pairs(segment_intersect_join(a, b, cell=4.0))
    assert got == [(1, 0, 10, 0), (2, 0, 11, 0), (3, 0, 12, 0)]


def test_owner_cell_single_emission(spark):
    # two long crossing segments share MANY 1-degree cells -> exactly 1 row
    a = _segs(spark, [(1, 0, 0.0, 0.0, 10.0, 10.0)])
    b = _segs(spark, [(2, 0, 0.0, 10.0, 10.0, 0.0)])
    out = segment_intersect_join(a, b, cell=1.0).collect()
    assert len(out) == 1


def test_self_join_drops_adjacent_and_mirrors(spark):
    # way 1: a V (adjacent segments share vertex); way 1 pos 2 crosses pos 0
    segs = _segs(spark, [
        (1, 0, 0.0, 0.0, 2.0, 2.0),
        (1, 1, 2.0, 2.0, 4.0, 0.0),
        (1, 2, 0.0, 1.5, 4.0, 1.5),   # crosses pos 0 AND pos 1
    ])
    got = _pairs(segment_intersect_join(segs, segs, cell=4.0,
                                        keep_self=False))
    assert got == [(1, 0, 1, 2)]  # (0,1) adjacent dropped; (1,2) adjacent


def _np_intersects(p, q):
    (pax, pay), (pbx, pby) = p
    (qax, qay), (qbx, qby) = q
    d1 = (qbx - qax) * (pay - qay) - (qby - qay) * (pax - qax)
    d2 = (qbx - qax) * (pby - qay) - (qby - qay) * (pbx - qax)
    d3 = (pbx - pax) * (qay - pay) - (pby - pay) * (qax - pax)
    d4 = (pbx - pax) * (qby - pay) - (pby - pay) * (qbx - pax)
    if ((d1 > 0 > d2) or (d1 < 0 < d2)) and ((d3 > 0 > d4) or (d3 < 0 < d4)):
        return True

    def on(ax, ay, bx, by, cx, cy):
        return (min(ax, bx) <= cx <= max(ax, bx)
                and min(ay, by) <= cy <= max(ay, by))
    return ((d1 == 0 and on(qax, qay, qbx, qby, pax, pay))
            or (d2 == 0 and on(qax, qay, qbx, qby, pbx, pby))
            or (d3 == 0 and on(pax, pay, pbx, pby, qax, qay))
            or (d4 == 0 and on(pax, pay, pbx, pby, qbx, qby)))


def test_bruteforce_parity_random(spark):
    rng = np.random.default_rng(11)
    mk = lambda w: [(w + i, 0,
                     float(round(rng.uniform(-6, 6), 2)),
                     float(round(rng.uniform(-6, 6), 2)),
                     float(round(rng.uniform(-6, 6), 2)),
                     float(round(rng.uniform(-6, 6), 2)))
                    for i in range(40)]
    ra, rb = mk(0), mk(100)
    got = set(_pairs(segment_intersect_join(
        _segs(spark, ra), _segs(spark, rb), cell=2.0)))
    want = set()
    for (aw, ap, ax, ay, bx, by) in ra:
        for (bw, bp, cx, cy, dx, dy) in rb:
            # integer grid at quantum 100, same as the operator default
            p = ((round(ax * 100), round(ay * 100)),
                 (round(bx * 100), round(by * 100)))
            q = ((round(cx * 100), round(cy * 100)),
                 (round(dx * 100), round(dy * 100)))
            if _np_intersects(p, q):
                want.add((aw, ap, bw, bp))
    assert got == want and len(want) > 50


def test_plan_has_no_cartesian(spark):
    a = _segs(spark, [(1, 0, 0.0, 0.0, 1.0, 1.0)])
    plan = segment_intersect_join(a, a, cell=2.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
