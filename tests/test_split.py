"""hash_split: per-row determinism, engine portability (DuckDB md5),
weight calibration, and the no-shuffle plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from osmspark.pipeline.split import hash_split


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame({"doc_id": range(5000)})
    return spark.createDataFrame(pdf)


def test_deterministic_and_stable_under_subset(docs, spark):
    full = hash_split(docs).toPandas().set_index("doc_id")["split"]
    sub = hash_split(docs.filter("doc_id % 3 = 0")).toPandas() \
        .set_index("doc_id")["split"]
    # a row's split never depends on which other rows are present
    assert (full.loc[sub.index] == sub).all()


def test_matches_duckdb_md5(docs):
    got = hash_split(docs, seed=7).toPandas()
    con = duckdb.connect()
    exp = con.execute("""
      SELECT doc_id,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 8))::BIGINT
                   % 10000 AS b
            FROM range(5000) t(doc_id))
    """).fetchdf()
    m = got.merge(exp, on="doc_id", suffixes=("", "_o"))
    assert (m["split"] == m["split_o"]).all()


def test_weights_calibrated(docs):
    out = hash_split(docs).toPandas()["split"].value_counts(normalize=True)
    assert abs(out["train"] - 0.8) < 0.02
    assert abs(out["val"] - 0.1) < 0.01
    assert abs(out["test"] - 0.1) < 0.01


def test_bad_weights_rejected(docs):
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": 0.5, "b": 0.4})


def test_no_shuffle(docs):
    plan = hash_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_deterministic_and_capped(spark):
    from osmspark.pipeline.split import stratified_sample

    pdf = pd.DataFrame({"doc_id": range(1000),
                        "lang": ["en", "de", "fr", "zh"] * 250})
    df = spark.createDataFrame(pdf)
    a = stratified_sample(df, "lang", 25).toPandas()
    b = stratified_sample(df.repartition(7), "lang", 25).toPandas()
    assert a.groupby("lang").size().tolist() == [25] * 4
    assert set(map(tuple, a[["lang", "doc_id"]].to_numpy())) \
        == set(map(tuple, b[["lang", "doc_id"]].to_numpy()))
    # matches a hand-computed md5 order
    import hashlib
    for lang in ["en"]:
        ids = pdf[pdf.lang == lang]["doc_id"]
        exp = sorted(ids, key=lambda i: (hashlib.md5(
            f"{i}:0".encode()).hexdigest(), i))[:25]
        got = sorted(a[a.lang == lang]["doc_id"])
        assert got == sorted(exp)


def test_stratified_sample_small_group_kept_whole(spark):
    from osmspark.pipeline.split import stratified_sample

    pdf = pd.DataFrame({"doc_id": range(10),
                        "lang": ["en"] * 8 + ["tiny"] * 2})
    out = stratified_sample(spark.createDataFrame(pdf), "lang", 5).toPandas()
    assert (out[out.lang == "tiny"]["doc_id"].sort_values().tolist()
            == [8, 9])


# --- rate-based corpus mixing (round 4) ---------------------------------

def test_sample_by_rate_deterministic_and_bounded(spark):
    from osmspark.pipeline.split import sample_by_rate
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_by_rate(df, {"a": 1.0, "b": 0.2}, seed=5)
    kept = {(r["doc_id"], r["source"]) for r in out.collect()}
    # rate 1.0 keeps everything in group a
    assert sum(1 for _, s in kept if s == "a") == 1000
    # rate 0.2 keeps ~200 of b (md5-uniform: within a loose band)
    nb = sum(1 for _, s in kept if s == "b")
    assert 140 <= nb <= 260
    # re-run is row-identical (per-row function of identity)
    again = {(r["doc_id"], r["source"])
             for r in sample_by_rate(df, {"a": 1.0, "b": 0.2},
                                     seed=5).collect()}
    assert again == kept
    # different seed reshuffles membership
    other = {(r["doc_id"], r["source"])
             for r in sample_by_rate(df, {"a": 1.0, "b": 0.2},
                                     seed=6).collect()}
    assert other != kept


def test_sample_by_rate_zero_and_default(spark):
    from osmspark.pipeline.split import sample_by_rate
    rows = [(1, "x"), (2, "x"), (3, "y")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_by_rate(df, {"x": 0.0}, default_rate=1.0).collect()
    assert {r["source"] for r in out} == {"y"}


def test_mixture_weights_alpha_half(spark):
    """sqrt-temperature weights: exact vs a Python recomputation of the
    same rational-scaled arithmetic; weights sum to ~1; α=1 reproduces
    natural proportions."""
    import math

    from osmspark.pipeline.split import mixture_weights
    rows = [(i, "big") for i in range(90)] + \
           [(i + 100, "mid") for i in range(9)] + \
           [(200, "small")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r.domain: r for r in mixture_weights(df, alpha=0.5).collect()}
    sv = {g: math.floor(math.sqrt(n) * 1_000_000)
          for g, n in (("big", 90), ("mid", 9), ("small", 1))}
    tot = sum(sv.values())
    for g, n in (("big", 90), ("mid", 9), ("small", 1)):
        assert out[g].n_docs == n
        assert out[g].weight == round(sv[g] / tot, 6)
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-5
    nat = {r.domain: r.weight
           for r in mixture_weights(df, alpha=1.0).collect()}
    assert nat["big"] == 0.9 and nat["small"] == 0.01
    # flattening: sqrt weights strictly lift the small domain
    assert out["small"].weight > nat["small"]


def test_sample_to_budget_exact_plan(spark):
    """Budget plan: targets match the exact integer recomputation,
    floor property bounds the total draw, epochs/rate expose up- vs
    down-sampling, budget 0 zeroes the plan."""
    import math

    from osmspark.pipeline.split import sample_to_budget
    rows = [(i, "big", 100) for i in range(90)] + \
           [(i + 100, "mid", 100) for i in range(9)] + \
           [(200, "small", 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string,"
                                     " n_tokens long")
    B = 5_000
    out = {r.domain: r for r in
           sample_to_budget(df, B, token_col="n_tokens").collect()}
    sizes = {"big": 9000, "mid": 900, "small": 100}
    sv = {g: math.floor(math.sqrt(s) * 1_000_000)
          for g, s in sizes.items()}
    tot = sum(sv.values())
    for g, s in sizes.items():
        tgt = (sv[g] * B) // tot
        assert out[g].size == s
        assert out[g].target_tokens == tgt
        assert out[g].epochs == round(tgt / s, 6)
        assert out[g].rate == min(1.0, out[g].epochs)
    drawn = sum(r.target_tokens for r in out.values())
    assert B - len(sizes) < drawn <= B
    # sqrt flattening at a small budget: the big domain downsamples
    # (epochs < 1) while the tiny one upsamples (epochs > 1, rate
    # clamped to 1.0)
    assert out["big"].epochs < 1.0 and out["big"].rate < 1.0
    assert out["small"].epochs > 1.0 and out["small"].rate == 1.0
    zero = sample_to_budget(df, 0, token_col="n_tokens").collect()
    assert all(r.target_tokens == 0 for r in zero)
