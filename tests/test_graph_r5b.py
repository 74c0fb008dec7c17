"""kcore_hindex / hits_mass / link_predictions: Python oracles
(true peeling, integer-mass power iteration, brute neighborhood
overlap), convergence/monotonicity structure, plan pins.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import pandas as pd
import pytest

from osmspark.graph.hits import hits_mass
from osmspark.graph.kcore import kcore_hindex
from osmspark.graph.linkpred import link_predictions

# mixed-density graph: a K5 clique (core 4), a 6-cycle attached by one
# bridge (core 2), a pendant chain (core 1); duplicate + reversed +
# self-loop rows exercise canonicalization
CLIQUE = list(itertools.combinations(range(5), 2))
CYCLE = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 10)]
BRIDGE = [(4, 10)]
CHAIN = [(15, 20), (20, 21)]
DIRTY = [(1, 0), (0, 1), (7, 7)]
EDGES = CLIQUE + CYCLE + BRIDGE + CHAIN + DIRTY


def _adj():
    a = defaultdict(set)
    for u, v in EDGES:
        if u != v:
            a[u].add(v)
            a[v].add(u)
    return a


def _true_cores():
    adj = {v: set(ns) for v, ns in _adj().items()}
    degs = {v: len(ns) for v, ns in adj.items()}
    remaining, k, out = set(adj), 0, {}
    while remaining:
        v = min(remaining, key=lambda x: (degs[x], x))
        k = max(k, degs[v])
        out[v] = k
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining:
                degs[u] -= 1
    return out


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(pd.DataFrame(EDGES,
                                              columns=["src", "dst"]))


def test_kcore_matches_peeling(edges):
    got = {int(r.node): int(r.core)
           for r in kcore_hindex(edges, n_iter=8).collect()}
    exp = _true_cores()
    assert got == exp
    assert sorted(set(exp.values())) == [1, 2, 4]   # structure varied


def test_kcore_overshoot_is_noop(edges):
    a = {(int(r.node), int(r.core))
         for r in kcore_hindex(edges, n_iter=8).collect()}
    b = {(int(r.node), int(r.core))
         for r in kcore_hindex(edges, n_iter=12).collect()}
    assert a == b                                   # fixpoint


def test_kcore_monotone_decreasing(edges):
    # estimates never rise: one iteration's estimate >= fixpoint
    one = {int(r.node): int(r.core)
           for r in kcore_hindex(edges, n_iter=1).collect()}
    final = _true_cores()
    assert all(one[v] >= final[v] for v in final)


def _hits_oracle(n_iter=3, M=10 ** 9):
    dir_edges = sorted({(u, v) for u, v in EDGES if u != v})
    nodes = sorted({u for e in dir_edges for u in e})
    n = len(nodes)
    auth = {v: M // n for v in nodes}
    hub = {v: M // n for v in nodes}
    for _ in range(n_iter):
        raw = defaultdict(int)
        for u, v in dir_edges:
            raw[v] += hub[u]
        s = sum(raw.values())
        auth = {v: (raw.get(v, 0) * M) // s if s else 0 for v in nodes}
        raw = defaultdict(int)
        for u, v in dir_edges:
            raw[u] += auth[v]
        s = sum(raw.values())
        hub = {v: (raw.get(v, 0) * M) // s if s else 0 for v in nodes}
    return auth, hub


def test_hits_matches_integer_oracle(spark):
    dir_edges = sorted({(u, v) for u, v in EDGES if u != v})
    df = spark.createDataFrame(pd.DataFrame(dir_edges,
                                            columns=["src", "dst"]))
    auth, hub = _hits_oracle()
    got = {int(r.node): (int(r.auth), int(r.hub))
           for r in hits_mass(df, n_iter=3).collect()}
    assert got == {v: (auth[v], hub[v]) for v in auth}


def test_hits_sink_has_zero_hub(spark):
    # 0→1, 2→1: node 1 is a pure sink (no out-links) → hub 0;
    # 0 and 2 are pure sources → auth 0
    df = spark.createDataFrame(pd.DataFrame([(0, 1), (2, 1)],
                                            columns=["src", "dst"]))
    got = {int(r.node): (int(r.auth), int(r.hub))
           for r in hits_mass(df, n_iter=2).collect()}
    assert got[1][1] == 0 and got[0][0] == 0 and got[2][0] == 0
    assert got[1][0] > 0                     # the sink holds all authority


def _linkpred_oracle(max_mid_deg=None):
    adj = _adj()
    canon = {(min(u, v), max(u, v)) for u, v in EDGES if u != v}
    cand = defaultdict(int)
    for mid, ns in adj.items():
        if max_mid_deg is not None and len(ns) > max_mid_deg:
            continue
        for u, v in itertools.combinations(sorted(ns), 2):
            cand[(u, v)] += 1
    out = {}
    for (u, v), cn in cand.items():
        if (u, v) in canon:
            continue
        du, dv = len(adj[u]), len(adj[v])
        out[(u, v)] = (cn, du, dv, round(cn / (du + dv - cn), 9))
    return out


def test_linkpred_matches_brute(edges):
    got = {(int(r.u), int(r.v)): (int(r.cn), int(r.deg_u), int(r.deg_v),
                                  float(r.jaccard))
           for r in link_predictions(edges).collect()}
    assert got == _linkpred_oracle()
    # clique's non-edges don't exist (K5 complete) — every predicted
    # pair is genuinely absent from the graph
    canon = {(min(u, v), max(u, v)) for u, v in EDGES if u != v}
    assert not (set(got) & canon)


def test_linkpred_mid_cap_drops_hub_witness(edges):
    # node 4 (deg 5) is the only witness for (0,10) etc.; capping at 4
    # removes exactly the pairs whose sole middle is node 4
    full = _linkpred_oracle()
    capped = _linkpred_oracle(max_mid_deg=4)
    got = {(int(r.u), int(r.v)) for r in
           link_predictions(edges, max_mid_deg=4).collect()}
    assert got == set(capped)
    assert set(capped) < set(full)


def test_plans_no_cartesian(edges):
    for df in (kcore_hindex(edges, n_iter=2),
               hits_mass(edges, n_iter=1),
               link_predictions(edges)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
    # HITS total-mass attachments are one-row broadcasts — the only
    # nested-loop joins allowed; kcore/linkpred must have none at all
    for df in (kcore_hindex(edges, n_iter=2), link_predictions(edges)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
