"""textrank_keywords: Python integer-PageRank oracle over a crafted
corpus, df-bound and window semantics, total-order cut."""

from __future__ import annotations

from collections import defaultdict

import pytest

from osmspark.pipeline.keywords import textrank_keywords

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark caches data in memory"),
    (2, "the cluster schedules spark executors"),
    (3, "memory pressure spills data to disk"),
    (4, "rare singleton appears once"),
]


def _oracle(window=2, min_df=2, n_iter=3, total_mass=10 ** 12):
    toks = {d: t.split() for d, t in DOCS}
    df = defaultdict(set)
    for d, ts in toks.items():
        for t in ts:
            df[t].add(d)
    kept = {t for t, ds in df.items() if len(ds) >= min_df}
    wts = defaultdict(int)
    for ts in toks.values():
        for i, a in enumerate(ts):
            for off in range(1, window + 1):
                if i + off < len(ts):
                    b = ts[i + off]
                    if a != b and a in kept and b in kept:
                        wts[(min(a, b), max(a, b))] += 1
    out_w = defaultdict(int)
    for (u, v), w in wts.items():
        out_w[u] += w
        out_w[v] += w
    nodes = sorted(out_w)
    n = len(nodes)
    mass = {v: total_mass // n for v in nodes}
    for _ in range(n_iter):
        inc = defaultdict(int)
        for (u, v), w in wts.items():
            inc[v] += (mass[u] * w) // out_w[u]
            inc[u] += (mass[v] * w) // out_w[v]
        mass = {v: (3 * total_mass) // (20 * n) + (17 * inc[v]) // 20
                for v in nodes}
    return mass, kept


@pytest.fixture(scope="module")
def ranked(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return [(r.word, int(r.mass))
            for r in textrank_keywords(df, window=2, min_df=2,
                                       n_iter=3, top_k=50).collect()]


def test_matches_python_pagerank(ranked):
    mass, _ = _oracle()
    exp = sorted(mass.items(), key=lambda kv: (-kv[1], kv[0]))
    assert ranked == exp


def test_rare_words_excluded(ranked):
    words = {w for w, _ in ranked}
    assert "singleton" not in words and "rare" not in words
    assert {"spark", "data"} <= words


def test_hubs_outrank_leaves(ranked):
    mass = dict(ranked)
    # 'spark' co-occurs in 3 docs; 'memory' (kept, df = 2) is the
    # periphery of the graph
    assert mass["spark"] > mass["memory"]


def test_topk_cut_is_total_ordered(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    k3 = [(r.word, int(r.mass))
          for r in textrank_keywords(df, window=2, min_df=2,
                                     n_iter=3, top_k=3).collect()]
    mass, _ = _oracle()
    exp = sorted(mass.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert k3 == exp


def test_no_cartesian(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (textrank_keywords(df, n_iter=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
