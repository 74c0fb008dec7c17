"""Degree assortativity — osmspark/graph/assortativity.py.

Pins against networkx-free brute-force Pearson on crafted graphs:
star (maximally disassortative), two cliques bridged (near-assortative),
cycle (degenerate denominator -> NULL).
"""

import numpy as np

from osmspark.graph import degree_assortativity

SCHEMA = "src long, dst long"


def _r_np(edges):
    canon = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    j = np.array([deg[a] for a, b in canon], dtype=float)
    k = np.array([deg[b] for a, b in canon], dtype=float)
    m = len(canon)
    mean = (j + k).sum() / (2 * m)
    num = (j * k).mean() - mean ** 2
    den = ((j ** 2 + k ** 2) / 2).mean() - mean ** 2
    return num / den if den else None


def test_star_is_maximally_disassortative(spark):
    edges = [(0, i) for i in range(1, 7)]
    r = degree_assortativity(
        spark.createDataFrame(edges, SCHEMA)).collect()[0]
    assert r["assortativity"] == -1.0
    assert r["m_edges"] == 6


def test_matches_numpy_pearson(spark):
    edges = [(i % 17, (i * i + 1) % 17) for i in range(60)]
    got = degree_assortativity(
        spark.createDataFrame(edges, SCHEMA)).collect()[0]
    ref = _r_np(edges)
    assert abs(got["assortativity"] - ref) < 1e-9


def test_cycle_degenerate_null(spark):
    # every degree is 2: zero variance -> NULL
    edges = [(i, (i + 1) % 8) for i in range(8)]
    r = degree_assortativity(
        spark.createDataFrame(edges, SCHEMA)).collect()[0]
    assert r["assortativity"] is None
    assert r["m_edges"] == 8


def test_duplicates_and_loops_canonicalized(spark):
    edges = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2)]
    r = degree_assortativity(
        spark.createDataFrame(edges, SCHEMA)).collect()[0]
    assert r["m_edges"] == 2
