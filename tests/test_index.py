"""Inverted index — osmspark/pipeline/index.py.

Pins: bounded postings (sorted, deduplicated per doc), the NULL-postings
hot-term path, the df ≤/> boundary, and tokenizer behavior (lowercase,
multi-space, empty filter).
"""

import pytest

from osmspark.pipeline.index import inverted_index


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (1, "Apple banana  APPLE"),      # apple twice in one doc → df 1
        (2, "apple cherry"),
        (3, "apple date"),
        (4, "banana  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["term"]: r for r in inverted_index(df, max_df=2).collect()}


def test_df_counts_distinct_docs(idx):
    assert idx["apple"]["df"] == 3         # within-doc repeat ignored
    assert idx["banana"]["df"] == 2


def test_bounded_postings_sorted(idx):
    assert idx["banana"]["postings"] == "1,4"
    assert idx["cherry"]["postings"] == "2"


def test_hot_term_null_postings(idx):
    assert idx["apple"]["postings"] is None     # df 3 > max_df 2


def test_no_empty_terms(idx):
    assert "" not in idx
