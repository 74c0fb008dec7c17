"""End-to-end resumable curation job: quality gate drops junk, exact
dupes collapse, near-dupes cluster to one canonical doc, benchmark
overlap drops, plan/pack outputs land — and a rerun recomputes nothing
(lineage resume)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmspark.jobs.curation_job import main as curation_main

BASE = ("the quick brown fox jumps over the lazy dog and then runs "
        "far away to find the next adventure with great joy")

# distinct base for the near-dup pair so it does NOT cluster with BASE
NEAR = ("a completely different story about the deep sea where sailors "
        "and captains sail the wide cold ocean for many long months")


def _docs():
    near_a = NEAR + " extra token alpha"
    near_b = NEAR + " extra token omega"          # near-dup of near_a
    rows = [
        (0, "en", BASE),
        (1, "en", BASE),                          # exact dup of 0
        (2, "en", near_a),
        (3, "en", near_b),
        (4, "de", "der hund und die katze laufen durch den park and "
                  "the garden every single day with much energy"),
        (5, "en", "junk"),                        # fails min_words
        (6, "en", "the contaminated document shares this exact eight "
                  "token span right here and the rest is fine too"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


@pytest.fixture(scope="module")
def job_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("curation")
    docs = str(root / "docs")
    bench = str(root / "bench")
    spark.createDataFrame(_docs()).write.parquet(docs)
    # benchmark doc embedding the same 8-token span as doc 6
    spark.createDataFrame(pd.DataFrame(
        [(100, "shares this exact eight token span right here indeed")],
        columns=["doc_id", "text"])).write.parquet(bench)
    argv = ["--docs", docs, "--out", str(root / "out"),
            "--state", str(root / "state"), "--buckets", "4",
            "--bench", bench, "--min-words", "5", "--budget", "100",
            "--seq-len", "16"]
    _, results = curation_main(argv)
    return root, argv, results


def test_stage_outputs_and_verdicts(spark, job_dirs):
    root, _, _ = job_dirs
    out = str(root / "out")
    kept = {r["doc_id"]
            for r in spark.read.parquet(f"{out}/filter_dedup").collect()}
    assert 5 not in kept                  # junk fails the quality gate
    assert len({0, 1} & kept) == 1        # exact dup collapsed
    canon = {r["doc_id"]
             for r in spark.read.parquet(f"{out}/canonical").collect()}
    assert len({2, 3} & canon) == 1       # near-dup pair -> one keeper
    assert 4 in canon                     # unrelated doc survives
    final = {r["doc_id"]
             for r in spark.read.parquet(f"{out}/decontaminate")
             .collect()}
    assert 6 not in final                 # shares a span with the bench
    assert 4 in final
    plan = spark.read.parquet(f"{out}/plan")
    # "unit" is the lineage partition dir added by run_stage on read
    assert set(plan.columns) - {"unit"} == {"domain", "size", "weight",
                                            "target_tokens", "epochs",
                                            "rate"}
    pack = spark.read.parquet(f"{out}/pack")
    assert pack.count() == len(final)
    assert spark.read.parquet(f"{out}/pack") \
        .filter(F.col("seq_first") < 0).count() == 0


def test_rerun_skips_everything(job_dirs):
    _, argv, first = job_dirs
    assert any(r["computed"] for r in first.values())
    _, rerun = curation_main(argv)
    for stage, r in rerun.items():
        assert r["computed"] == [], stage
        assert r["skipped"], stage
