"""colocation_pi: Python brute oracle, prevalence-vs-count structure
(a dense one-sided cluster cannot inflate PI), plan pin."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from osmspark.spatial.colocation import colocation_pi

# cell pitch 1.0: A/B interleave in one block (high PI); C appears as a
# dense cluster near ONE B instance only (pr_cb high? no — pr_bc LOW, so
# PI(B,C) stays low despite many C-B pairs); D is isolated.
PTS = ([(i, "A", 10.0 + i, 20.0) for i in range(6)]
       + [(100 + i, "B", 10.4 + i, 20.3) for i in range(6)]
       + [(200 + i, "C", 50.0 + 0.01 * i, 50.0) for i in range(30)]
       + [(300, "B", 50.2, 50.2)]
       + [(400, "D", -60.0, -120.0)])


def _oracle():
    cells = {(i, c): (math.floor(lon), math.floor(lat))
             for i, c, lat, lon in PTS}
    cats = defaultdict(list)
    for i, c, lat, lon in PTS:
        cats[c].append(i)
    near = set()
    for (ia, ca), (xa, ya) in cells.items():
        for (ib, cb), (xb, yb) in cells.items():
            if ca != cb and abs(xa - xb) <= 1 and abs(ya - yb) <= 1:
                near.add((ia, ca, cb))
    cnt = defaultdict(int)
    for _, ca, cb in near:
        cnt[(ca, cb)] += 1
    out = {}
    for ca in cats:
        for cb in cats:
            if ca >= cb:
                continue
            nab, nba = cnt.get((ca, cb), 0), cnt.get((cb, ca), 0)
            if nab == 0 and nba == 0:
                continue
            pr_ab = round(nab / len(cats[ca]), 9)
            pr_ba = round(nba / len(cats[cb]), 9)
            out[(ca, cb)] = (len(cats[ca]), len(cats[cb]), nab, nba,
                             pr_ab, pr_ba, min(pr_ab, pr_ba))
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(PTS, "id long, cat string, lat double, "
                                    "lon double")
    return {(r.cat_a, r.cat_b): (int(r.n_a), int(r.n_b),
                                 int(r.n_a_near_b), int(r.n_b_near_a),
                                 r.pr_ab, r.pr_ba, r.pi)
            for r in colocation_pi(df, cell_deg=1.0).collect()}


def test_matches_brute(result):
    assert result == _oracle()


def test_prevalence_not_count(result):
    # (B, C): 30 C-instances all near one stray B → the raw pair count
    # is huge, but only 1 of 7 B's participates, so PI stays low —
    # while the interleaved (A, B) block has every instance of both
    # participating and PI(A,B) > PI(B,C)
    assert result[("A", "B")][6] > result[("B", "C")][6]
    assert result[("B", "C")][3] == 30          # every C participates
    assert result[("B", "C")][2] == 1           # ...but only one B


def test_isolated_category_absent(result):
    assert not any("D" in k for k in result)


def test_plan_no_cartesian(spark):
    df = spark.createDataFrame(PTS, "id long, cat string, lat double, "
                                    "lon double")
    plan = (colocation_pi(df, cell_deg=1.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
