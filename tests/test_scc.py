"""scc_labels: iterative-Tarjan Python oracle, multi-phase peeling
structure, DAG/cycle/self-loop edges, determinism."""

from __future__ import annotations

import pytest

from osmspark.graph.scc import scc_labels

# two 4-cycles bridged one-way (stay separate SCCs), a 2-cycle whose
# min id is reachable from the first cycle (forces a second peel
# phase for the downstream SCC), a DAG tail, a self-loop node
EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),          # scc {0,1,2,3}
         (10, 11), (11, 12), (12, 13), (13, 10),  # scc {10..13}
         (3, 10),                                 # one-way bridge
         (2, 5), (5, 6), (6, 5),                  # {5,6}: min 5 > fwd-min 0
         (6, 7), (7, 8),                          # DAG tail
         (9, 9)]                                  # self-loop only


def _tarjan(edges):
    adj = {}
    nodes = set()
    for u, v in edges:
        if u != v:
            adj.setdefault(u, []).append(v)
        nodes.update((u, v))
    nodes = {u for u, v in edges if u != v} | \
            {v for u, v in edges if u != v}
    index = {}
    low = {}
    on = set()
    stack = []
    out = {}
    counter = [0]

    def strong(v0):
        work = [(v0, 0)]
        while work:
            v, i = work.pop()
            if i == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            for j in range(i, len(adj.get(v, []))):
                w = adj[v][j]
                if w not in index:
                    work.append((v, j + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if not recurse:
                for w in adj.get(v, []):
                    if w in index and w in on and index[w] > index[v]:
                        low[v] = min(low[v], low[w])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    return {int(r.node): int(r.scc_id)
            for r in scc_labels(df).collect()}


def test_matches_tarjan(result):
    assert result == _tarjan(EDGES)


def test_structure(result):
    # the two 4-cycles stay separate despite the bridge; {5,6} forms
    # its own SCC even though node 0 is forward-reachable from it...
    # (it isn't: 2→5, so 5 can't reach 0? 5→6→5 only) — the point:
    # downstream SCC min (5) differs from upstream fwd-min (0)
    assert result[0] == result[1] == result[2] == result[3] == 0
    assert result[10] == result[13] == 10
    assert result[5] == result[6] == 5
    assert result[7] == 7 and result[8] == 8     # DAG singletons
    assert 9 not in result                       # self-loop-only node


def test_needs_second_phase(spark):
    # chain of 2-cycles: (0,1) -> (2,3) -> (4,5); phases must peel
    # layer by layer (fwd-min of {2,3} is 0 until {0,1} leaves)
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4),
             (4, 5), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {int(r.node): int(r.scc_id) for r in scc_labels(df).collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


def test_pure_cycle_single_scc(spark):
    edges = [(i, (i + 1) % 7) for i in range(7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {int(r.node): int(r.scc_id) for r in scc_labels(df).collect()}
    assert set(got.values()) == {0} and len(got) == 7


def test_condense_and_levels(spark):
    from osmspark.graph.scc import condense, scc_labels, topo_levels
    df = spark.createDataFrame(EDGES, "src long, dst long")
    labels = scc_labels(df)
    dag = condense(df, labels)
    got_edges = {(int(r.src), int(r.dst)) for r in dag.collect()}
    # condensation of the fixture: {0..3} -> {10..13}, {0..3} -> {5,6},
    # {5,6} -> 7 -> 8
    assert got_edges == {(0, 10), (0, 5), (5, 7), (7, 8)}
    lv = {int(r.node): int(r.level) for r in topo_levels(dag).collect()}
    assert lv == {0: 0, 10: 1, 5: 1, 7: 2, 8: 3}


def test_topo_levels_rejects_cycle(spark):
    from osmspark.graph.scc import topo_levels
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(RuntimeError):
        topo_levels(df, max_rounds=8)


def test_settles_in_exactly_max_phases(spark):
    # 3-layer chain of 2-cycles with max_phases=3: completion must be
    # detected by the post-loop check, not a spurious raise
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4),
             (4, 5), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {int(r.node): int(r.scc_id)
           for r in scc_labels(df, max_phases=3).collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}
