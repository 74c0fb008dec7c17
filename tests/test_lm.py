"""n-gram familiarity scorer: Python parity, in-domain > alien text,
edge docs (short, empty), held-out model with unseen grams,
partitioning invariance."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from osmspark.pipeline.lm import char_ngram_counts, ngram_familiarity


def _py_grams(s, n=3):
    return [s[i:i + n] for i in range(len(s) - n + 1)]


def _py_familiarity(docs, n=3):
    model, tot = {}, {}
    for _, lang, text in docs:
        for g in _py_grams(text, n):
            model[(lang, g)] = model.get((lang, g), 0) + 1
            tot[lang] = tot.get(lang, 0) + 1
    out = {}
    for did, lang, text in docs:
        grams = _py_grams(text, n)
        sc = sum(model.get((lang, g), 0) for g in grams)
        fam = round(sc / (len(grams) * tot[lang]), 6) if grams else 0.0
        out[did] = (len(grams), sc, fam)
    return out


def _df(spark, docs):
    return spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "lang", "text"]))


def test_matches_python_and_counts(spark):
    docs = [(0, "en", "the cat sat on the mat"),
            (1, "en", "the dog sat on the log"),
            (2, "en", "zz"),            # shorter than n: 0 grams
            (3, "en", ""),              # empty
            (4, "de", "der hund")]
    got = {r["doc_id"]: (r["n_grams"], r["sum_c"], r["familiarity"])
           for r in ngram_familiarity(_df(spark, docs)).collect()}
    assert got == _py_familiarity(docs)
    model = {(r["lang"], r["gram"]): r["c"]
             for r in char_ngram_counts(_df(spark, docs)).collect()}
    exp = Counter((lang, g) for _, lang, t in docs for g in _py_grams(t))
    assert model == dict(exp)


def test_in_domain_scores_above_alien(spark):
    corpus = [(i, "en", "the quick brown fox jumps over the lazy dog "
               * 3) for i in range(5)]
    corpus += [(99, "en", "zxqj vvkw qqpz xjzv wqkx zzjq")]  # alien
    rows = {r["doc_id"]: r["familiarity"]
            for r in ngram_familiarity(_df(spark, corpus)).collect()}
    assert all(rows[i] > rows[99] for i in range(5))


def test_heldout_model_unseen_grams_count_zero(spark):
    train = _df(spark, [(0, "en", "abcabcabc")])
    model = char_ngram_counts(train)
    probe = _df(spark, [(1, "en", "abcxyz")])  # abc seen, xyz/bcx/cxy not
    r = ngram_familiarity(probe, model=model).collect()[0]
    assert r["n_grams"] == 4
    assert r["sum_c"] == 3  # only 'abc' matches, count 3 in train
    assert r["familiarity"] == round(3 / (4 * 7), 6)  # T_train = 7


def test_partitioning_invariance(spark):
    docs = [(i, "en" if i % 2 else "de", f"word {i} text sample {i}")
            for i in range(40)]
    a = ngram_familiarity(_df(spark, docs).coalesce(1)) \
        .orderBy("doc_id").collect()
    b = ngram_familiarity(_df(spark, docs).repartition(7)) \
        .orderBy("doc_id").collect()
    assert a == b
