"""Gopher-rule repetition signals — osmspark/pipeline/repetition.py.

Pins: duplicate-line fractions (all occurrences of a duplicated line
count), duplicate-char weighting, top-bigram argmax with (count DESC,
bigram ASC) tie order, overlap-overcount clamping, and the short-doc
(< 2 tokens → no bigram) edge.
"""

import pytest

from osmspark.pipeline.repetition import repetition_signals


@pytest.fixture(scope="module")
def sig(spark):
    rows = [
        # doc 1: 4 lines of 2 tokens each (line_tokens=2): "a b" ×3 +
        # "c d" → dup_line_frac = 3/4; chars: dup 3·3=9 of 12 total
        (1, "a b a b a b c d"),
        # doc 2: all lines unique
        (2, "p q r s t u"),
        # doc 3: one token → 1 line, no bigrams
        (3, "solo"),
        # doc 4: bigram tie — "x y" and "y x" both occur twice in
        # "x y x y x" (overlapping); tie breaks to "x y" < "y x"
        (4, "x y x y x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_signals(df, line_tokens=2).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_dup_line_fraction_counts_all_occurrences(sig):
    r = sig[1]
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == 0.75          # 3 of 4 lines duplicated
    assert r["dup_line_char_frac"] == 0.75     # 9 of 12 line chars


def test_unique_lines_zero(sig):
    r = sig[2]
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == 0.0
    assert r["dup_line_char_frac"] == 0.0


def test_single_token_doc_has_no_bigram(sig):
    r = sig[3]
    assert r["n_lines"] == 1
    assert r["top_bigram"] == ""
    assert r["top_bigram_n"] == 0
    assert r["top_bigram_frac"] == 0.0


def test_bigram_tie_breaks_lexicographically(sig):
    r = sig[4]
    # bigrams of "x y x y x": [x y, y x, x y, y x] — both count 2
    assert r["top_bigram"] == "x y"
    assert r["top_bigram_n"] == 2
    # covered = 2 occurrences × 2 non-space chars = 4, n_chars = 5
    assert r["top_bigram_frac"] == 0.8


def test_overlap_overcount_is_clamped(spark):
    # "a a a a a": bigram "a a" occurs 4×, covered = 4·2 = 8 > 5 chars
    df = spark.createDataFrame([(1, "a a a a a")],
                               "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    assert r["top_bigram_n"] == 4
    assert r["top_bigram_frac"] == 1.0
