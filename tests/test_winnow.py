"""winnow_fingerprints: Python brute-force oracle (hashlib md5), the
w+k−1 shared-run guarantee, short-doc emptiness, density bound."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from osmspark.pipeline.winnow import winnow_fingerprints

POS_M = 1 << 22


def _brute(docs, k, w, seed=1):
    out = {}
    for doc_id, text in docs.items():
        toks = text.strip().split()
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        keys = [int(hashlib.md5(f"{g}:win{seed}".encode()).hexdigest()[:10],
                    16) * POS_M + i
                for i, g in enumerate(grams)]
        fps = {min(keys[i:i + w]) for i in range(len(keys) - w + 1)}
        out[doc_id] = {(f // POS_M, f % POS_M) for f in fps}
    return out


DOCS = {
    1: "the quick brown fox jumps over the lazy dog again and again",
    2: "lorem ipsum dolor sit amet the quick brown fox jumps over it",
    3: "short doc",                       # < k+w-1 tokens: no output
    4: "  spaced   tokens  collapse   to  single   separators  ok yes ",
}


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        pd.DataFrame([{"doc_id": i, "text": t} for i, t in DOCS.items()]))


def test_matches_brute_force(spark, sdf):
    got = winnow_fingerprints(sdf, k=3, w=4).toPandas()
    by_doc = {d: set(zip(g.fp_hash, g.fp_pos))
              for d, g in got.groupby("doc_id")}
    exp = _brute(DOCS, 3, 4)
    for d, fps in exp.items():
        assert by_doc.get(d, set()) == fps
    assert 3 not in by_doc                 # too short, absent not empty


def test_shared_run_guarantee(spark):
    """Docs sharing a run of w+k-1 tokens share >= 1 fingerprint hash
    (the paper's theorem) — position may differ, hash must collide."""
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"      # k+w-1 = 6 tokens
    docs = {10: "x1 y1 z1 " + shared + " q1 r1",
            11: "a2 " + shared + " b2 c2 d2 e2"}
    sdf = spark.createDataFrame(
        pd.DataFrame([{"doc_id": i, "text": t} for i, t in docs.items()]))
    got = winnow_fingerprints(sdf, k=k, w=w).toPandas()
    h10 = set(got[got.doc_id == 10].fp_hash)
    h11 = set(got[got.doc_id == 11].fp_hash)
    assert h10 & h11


def test_density_bound(spark, sdf):
    # fingerprints per doc <= number of full windows (trivially) and
    # >= 1 for docs with at least one full window
    got = winnow_fingerprints(sdf, k=3, w=4).toPandas()
    for d, text in DOCS.items():
        n = len(text.split())
        full = n - 3 + 1 - 4 + 1
        cnt = (got.doc_id == d).sum()
        assert (cnt == 0) == (full <= 0)
        if full > 0:
            assert 1 <= cnt <= full


def test_bad_params(spark, sdf):
    with pytest.raises(ValueError):
        winnow_fingerprints(sdf, k=0, w=4)


def test_single_exchange_plan(spark, sdf):
    plan = winnow_fingerprints(sdf, k=3, w=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2       # doc window + distinct agg
    assert "CartesianProduct" not in plan
