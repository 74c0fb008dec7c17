"""semdedup: NumPy within-cluster oracle, cross-cluster blindness,
greedy min-id keeper semantics, and the no-cartesian plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmspark.pipeline.semdedup import semdedup_keep, semdedup_pairs

DIM = 8


@pytest.fixture(scope="module")
def emb_pdf():
    rng = np.random.default_rng(23)
    rows = []
    vid = 0
    for cluster in range(6):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for _ in range(rng.integers(5, 25)):
            # mostly near-dups of the cluster base + some noise vectors
            if rng.random() < 0.6:
                v = base + rng.normal(scale=0.05, size=DIM)
            else:
                v = rng.normal(size=DIM)
            rows.append({"vec_id": vid, "label": cluster,
                         "embedding": [float(np.float32(x)) for x in v]})
            vid += 1
    return pd.DataFrame(rows)


def _brute_pairs(pdf, thr):
    out = []
    for cluster, grp in pdf.groupby("label"):
        g = grp.sort_values("vec_id")
        vecs = [np.array(v, dtype=np.float32) for v in g["embedding"]]
        ids = g["vec_id"].tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = vecs[i], vecs[j]
                dot = float(np.sum(a.astype(np.float64)
                                   * b.astype(np.float64)))
                na = float(np.sqrt(np.sum(a.astype(np.float64) ** 2)))
                nb = float(np.sqrt(np.sum(b.astype(np.float64) ** 2)))
                c = round(dot / (na * nb), 6)
                if c >= thr:
                    out.append((int(cluster), ids[i], ids[j]))
    return sorted(out)


def test_pairs_match_brute(spark, emb_pdf):
    got = semdedup_pairs(spark.createDataFrame(emb_pdf), 0.9).toPandas()
    got_rows = sorted((int(r.cluster), int(r.a), int(r.b))
                      for r in got.itertuples())
    assert got_rows == _brute_pairs(emb_pdf, 0.9)
    assert got_rows, "fixture must actually produce near-dups"


def test_pairs_never_cross_clusters(spark, emb_pdf):
    # force two identical vectors into DIFFERENT clusters: no pair
    pdf = emb_pdf.copy()
    v = [1.0] * DIM
    extra = pd.DataFrame([
        {"vec_id": 9001, "label": 100, "embedding": v},
        {"vec_id": 9002, "label": 101, "embedding": v}])
    got = semdedup_pairs(
        spark.createDataFrame(pd.concat([pdf, extra])), 0.99).toPandas()
    assert not ((got.a == 9001) & (got.b == 9002)).any()


def test_keep_is_greedy_min_id(spark, emb_pdf):
    thr = 0.9
    keep = semdedup_keep(spark.createDataFrame(emb_pdf), thr).toPandas()
    dropped_exp = {b for _, _, b in _brute_pairs(emb_pdf, thr)}
    got_dropped = set(keep[~keep.keep].vec_id.astype(int))
    assert got_dropped == dropped_exp
    # every row of the corpus gets a verdict
    assert len(keep) == len(emb_pdf)
    # the min id of every cluster always survives
    min_ids = emb_pdf.groupby("label")["vec_id"].min()
    kept = set(keep[keep.keep].vec_id.astype(int))
    assert set(min_ids.astype(int)) <= kept


def test_no_cartesian_plan(spark, emb_pdf):
    plan = semdedup_pairs(spark.createDataFrame(emb_pdf), 0.9) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
