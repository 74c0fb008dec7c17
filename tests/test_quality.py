"""Gopher composite filter: per-rule flags on crafted documents, AND
composition, row preservation, rounded-ratio determinism."""

from __future__ import annotations

import pandas as pd

from osmspark.pipeline.quality import GOPHER_STOPWORDS, gopher_filter

GOOD = ("the cat and the dog have fun with games that last all day "
        * 5).strip()  # 65 words, all alpha, stopwords: the/and/have/with/that


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(rows)), "text": rows}))
    out = gopher_filter(df, **kw).orderBy("doc_id").collect()
    assert len(out) == len(rows)  # never drops
    return out


def test_good_doc_keeps(spark):
    r = _run(spark, [GOOD])[0]
    assert r["n_words"] == 65
    assert all(r[f] for f in ["ok_words", "ok_mean_wlen", "ok_symbols",
                              "ok_alpha", "ok_stopwords", "keep"])


def test_each_rule_fails_independently(spark):
    rows = [
        "the and cat",                                 # ok_words fails
        GOOD + " " + "x" * 800,                        # mean wlen > 10
        GOOD + " " + "x# " * 10,                       # symbol ratio
        GOOD + " " + "123 456 789 " * 8,               # alpha frac < 0.8
        GOOD.replace("the", "zzz").replace("and", "qqq")
            .replace("have", "rrrr").replace("with", "ssss")
            .replace("that", "tttt"),                  # no stopwords
    ]
    out = _run(spark, rows)
    failing = ["ok_words", "ok_mean_wlen", "ok_symbols", "ok_alpha",
               "ok_stopwords"]
    for i, flag in enumerate(failing):
        assert out[i][flag] is False, (i, flag)
        assert out[i]["keep"] is False
        others = [f for f in failing if f != flag]
        # the crafted violation is surgical: other flags hold
        assert all(out[i][f] for f in others), (i, flag, out[i])


def test_ratios_single_division_rounded(spark):
    r = _run(spark, ["abc de"])[0]
    assert r["n_words"] == 2
    assert r["mean_word_len"] == round(5 / 2, 6)
    assert r["alpha_word_frac"] == 1.0
    assert r["symbol_ratio"] == 0.0


def test_stop_hits_are_distinct_and_parameterizable(spark):
    r = _run(spark, ["the the the the"], stop_words=GOPHER_STOPWORDS)[0]
    assert r["n_stop_hits"] == 1  # distinct, not occurrences
    assert r["ok_stopwords"] is False
    r2 = _run(spark, ["row data row"], stop_words=("row", "data"),
              min_stop_hits=2)[0]
    assert r2["n_stop_hits"] == 2 and r2["ok_stopwords"] is True
