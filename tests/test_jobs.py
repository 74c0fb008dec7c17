"""spark-submit job entrypoint smoke tests (run in-process via main())."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_dedup_job_end_to_end(spark, tmp_path):
    """quality filter → minhash-LSH pairs → clusters → canonical keep."""
    from osmspark.jobs.dedup_job import main

    rng = np.random.default_rng(3)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    texts = [" ".join(rng.choice(words, size=25)) for _ in range(40)]
    texts[1] = texts[0]                       # exact dup
    texts[3] = texts[2].replace("alpha", "beta", 1)  # near dup
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                         "text": texts,
                         "source": ["s"] * 40})
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.parquet(src)
    out = str(tmp_path / "out")
    main(["--docs", src, "--out", out, "--method", "jaccard",
          "--threshold", "0.5"])
    kept = spark.read.parquet(f"{out}/kept")
    clusters = spark.read.parquet(f"{out}/clusters")
    assert clusters.count() == 40
    assert kept.count() < 40          # dups removed
    lab = {r.doc_id: r.cluster_id for r in clusters.collect()}
    assert lab[1] == lab[0] == 0      # exact dup collapsed to min id
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 0 in kept_ids and 1 not in kept_ids


def test_tiling_job_resumes(spark, tmp_path, pages_df):
    """Tiling job: per-bucket lineage, second invocation recomputes nothing."""
    from osmspark.jobs.tiling_job import main

    src = str(tmp_path / "pages")
    pages_df.write.parquet(src)
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    argv = ["--pages", src, "--out", out, "--state", state,
            "--res", "6", "--buckets", "4"]
    main(argv)
    merged = spark.read.parquet(f"{out}/tiles_r6_merged")
    total_1 = merged.agg({"n_points": "sum"}).collect()[0][0]
    main(argv)  # resume path: all units skipped, output unchanged
    merged2 = spark.read.parquet(f"{out}/tiles_r6_merged")
    assert merged2.agg({"n_points": "sum"}).collect()[0][0] == total_1
