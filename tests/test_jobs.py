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


def test_geometry_job_end_to_end_and_resume(spark, tmp_path, pages_df):
    """Geometry job: bucketed layout -> way geoms -> relation geoms, all
    lineage-checkpointed; a second invocation recomputes nothing and the
    way output matches the direct (shuffle-path) assembly."""
    import pyspark.sql.functions as F

    from osmspark.jobs.geometry_job import main
    from osmspark.pbf.source import nodes_from_pages, ways_from_pages
    from osmspark.spatial import assemble_way_geometries

    src = str(tmp_path / "pages")
    pages_df.write.parquet(src)
    out = str(tmp_path / "out_geom")
    state = str(tmp_path / "state_geom")
    argv = ["--pages", src, "--out", out, "--state", state,
            "--buckets", "4"]
    try:
        main(argv)
        ways_out = spark.read.parquet(f"{out}/way_geom/unit=all")
        pages = spark.read.parquet(src)
        direct = assemble_way_geometries(ways_from_pages(pages),
                                         nodes_from_pages(pages))

        def key(rows):
            return {(r["way_id"], tuple(r["lats"]), r["n_missing"])
                    for r in rows}

        assert key(ways_out.collect()) == key(direct.collect())
        rels_out = spark.read.parquet(f"{out}/rel_geom/unit=all")
        golden = rels_out.filter(F.col("rel_id") == 56688).collect()
        assert len(golden) == 1 and golden[0]["way_ids"] == [27776903]

        # resume: nothing recomputes (lineage row counts unchanged)
        lin1 = spark.read.parquet(f"{state}/lineage").count()
        main(argv)
        assert spark.read.parquet(f"{state}/lineage").count() == lin1
    finally:
        spark.sql("DROP TABLE IF EXISTS geomjob_refs")
        spark.sql("DROP TABLE IF EXISTS geomjob_nodes")


def test_crawl_rank_job_end_to_end_and_resume(spark, tmp_path):
    """Crawl-rank job: bucketed link extraction (lineage-checkpointed),
    merged host graph, integer-mass PageRank; second invocation skips
    every bucket and reproduces identical ranks."""
    from osmspark.jobs.crawl_rank_job import main

    rows = [(f"https://h{i % 3}.org/p{i}",
             f'<a href="https://h{(i + 1) % 3}.org/x">a</a>'
             f'<a href="/self">b</a>')
            for i in range(30)]
    pages = spark.createDataFrame(rows, "url string, html_text string")
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    argv = ["--pages", src, "--out", out, "--state", state,
            "--buckets", "4", "--iters", "3"]
    main(argv)
    ranks1 = {r.host: r.mass
              for r in spark.read.parquet(f"{out}/ranks").collect()}
    assert set(ranks1) == {"h0.org", "h1.org", "h2.org"}
    # symmetric 3-cycle + self-loops: all hosts rank equally
    assert len(set(ranks1.values())) == 1

    main(argv)  # resume: all buckets skipped, identical output
    ranks2 = {r.host: r.mass
              for r in spark.read.parquet(f"{out}/ranks").collect()}
    assert ranks2 == ranks1
