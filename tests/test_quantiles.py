"""exact_quantiles — osmspark/pipeline/textstats.py.

Pins: nearest-rank definition vs numpy on random groups (duplicates
included), single-row groups, all-equal groups, and the histogram plan
shape (partial agg before the shuffle; window only over histogram rows).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from osmspark.pipeline.textstats import exact_quantiles


def _nearest_rank(vals, q):
    s = sorted(vals)
    return s[max(0, math.ceil(q * len(s)) - 1)]


@pytest.fixture(scope="module")
def df(spark):
    rng = np.random.default_rng(31)
    rows = []
    for g in ("en", "de", "fr"):
        n = int(rng.integers(50, 400))
        vals = rng.integers(0, 100, n)          # heavy duplication
        rows += [(g, int(v)) for v in vals]
    rows += [("solo", 42)]                       # single-row group
    rows += [("flat", 7)] * 25                   # all-equal group
    return (spark.createDataFrame(rows, "lang string, n_chars long"),
            rows)


def test_matches_nearest_rank(df):
    sdf, rows = df
    got = {r.lang: r for r in
           exact_quantiles(sdf, "n_chars", "lang").collect()}
    from collections import defaultdict
    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    for g, vals in by_g.items():
        r = got[g]
        assert r.n == len(vals)
        assert r.q_50 == _nearest_rank(vals, 0.5)
        assert r.q_90 == _nearest_rank(vals, 0.9)
        assert r.q_99 == _nearest_rank(vals, 0.99)


def test_degenerate_groups(df):
    sdf, _ = df
    got = {r.lang: r for r in
           exact_quantiles(sdf, "n_chars", "lang").collect()}
    assert (got["solo"].q_50, got["solo"].q_99) == (42, 42)
    assert (got["flat"].q_50, got["flat"].q_99) == (7, 7)


def test_plan_partial_aggregates_before_shuffle(df):
    sdf, _ = df
    plan = exact_quantiles(sdf, "n_chars", "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert plan.index("partial_count") > plan.index("Exchange")
