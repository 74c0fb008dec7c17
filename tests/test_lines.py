"""Line-level (CCNet-style) corpus dedup — osmspark/pipeline/lines.py.

Pins: keeper selection (lexicographically first occurrence), the
never-drop contract (fully-boilerplate docs survive with n_kept=0),
line-order restoration on reassembly, and empty-line handling.
"""

import pytest
from pyspark.sql import functions as F

from osmspark.pipeline.lines import (explode_lines, line_census,
                                     line_dedup_docs, line_dedup_lines)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: unique + boilerplate (first occurrence → keeper)
        (1, "alpha beta\nCOOKIE BANNER\ngamma"),
        # doc 2: same boilerplate twice + a unique line
        (2, "COOKIE BANNER\ndelta\nCOOKIE BANNER"),
        # doc 3: ONLY boilerplate → must still appear, n_kept = 0
        (3, "COOKIE BANNER"),
        # doc 4: empty lines + whitespace-only lines are dropped but
        # line_no still advances (order check) — note trailing blank
        (4, "  \nepsilon\n\nzeta\n"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_explode_lines_positions(docs):
    got = {(r.doc_id, r.line_no): r.line
           for r in explode_lines(docs).collect()}
    assert got[(1, 0)] == "alpha beta"
    assert got[(1, 1)] == "COOKIE BANNER"
    # blanks advance line_no without emitting rows
    assert got[(4, 1)] == "epsilon"
    assert got[(4, 3)] == "zeta"
    assert (4, 0) not in got and (4, 2) not in got


def test_census_counts_and_keeper(docs):
    census = {r.line_hash: r for r in
              line_census(explode_lines(docs)).collect()}
    lines = explode_lines(docs).withColumn("h", F.md5("line")).collect()
    banner_hash = next(r.h for r in lines if r.line == "COOKIE BANNER")
    row = census[banner_hash]
    assert row.n_copies == 4
    assert (row.keeper.doc_id, row.keeper.line_no) == (1, 1)


def test_survivor_flags(docs):
    tagged = {(r.doc_id, r.line_no): r for r in
              line_dedup_lines(explode_lines(docs), min_dup=2).collect()}
    assert tagged[(1, 1)].keep          # keeper occurrence survives
    assert not tagged[(2, 0)].keep      # later copies dropped
    assert not tagged[(2, 2)].keep
    assert not tagged[(3, 0)].keep
    assert tagged[(2, 1)].keep          # unique line untouched
    assert tagged[(2, 1)].n_copies == 1


def test_docs_reassembled_in_order_and_never_dropped(docs):
    out = {r.doc_id: r for r in
           line_dedup_docs(explode_lines(docs), min_dup=2).collect()}
    assert out[1].clean_text == "alpha beta\nCOOKIE BANNER\ngamma"
    assert out[2].clean_text == "delta"
    assert (out[2].n_lines, out[2].n_kept) == (3, 1)
    # fully-boilerplate doc surfaces with empty text, not silently gone
    assert (out[3].n_kept, out[3].clean_text) == (0, "")
    assert out[4].clean_text == "epsilon\nzeta"


def test_min_dup_threshold(docs):
    # min_dup=5 → nothing is boilerplate (banner has 4 copies)
    out = {r.doc_id: r for r in
           line_dedup_docs(explode_lines(docs), min_dup=5).collect()}
    assert out[3].clean_text == "COOKIE BANNER"
    assert all(r.n_kept == r.n_lines for r in out.values())


def test_census_plan_is_partial_aggregate(docs):
    """The skew-safety claim: the census must plan as a two-phase
    aggregate — map-side partial_min/partial_count BEFORE the exchange
    (min(struct) buffers aren't HashAggregate-mutable, so Spark picks
    SortAggregate; the partial phase is what bounds the hot key at one
    row per task) — and never a window over the line key."""
    plan = line_census(explode_lines(docs))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_count" in plan
    assert plan.index("partial_min") > plan.index("Exchange")  # below it
