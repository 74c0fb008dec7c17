"""spark-submit entrypoint: pages → href links → host graph → PageRank,
resumable.

Ship with::

    zip -r osmspark.zip osmspark
    spark-submit --py-files osmspark.zip osmspark/jobs/crawl_rank_job.py \
        --pages /data/pages --out /data/out --state /data/state \
        --buckets 64 --iters 5

Input: a parquet pages table with (url:string, html_text:string) — the
decoded-HTML view of the Common-Crawl-style table (the binary → string
decode is upstream). The EXPENSIVE stage (regex extraction + host
resolution over every page) runs per url-hash bucket through the
lineage table, so a killed job resumes at the first incomplete bucket;
each bucket writes its own partial host-pair edge counts (idempotent
unit dirs, same layout as tiling_job). The graph stages (merge, degree,
5 integer-mass iterations) read the merged edges — tiny relative to
extraction (hosts ≪ pages) — and rerun cheaply on resume.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main(argv: list[str] | None = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from osmspark.graph import pagerank_mass
    from osmspark.pipeline.urls import link_graph
    from osmspark.session import get_spark
    from osmspark.state import StateStore, run_stage

    spark = get_spark(app="osmspark-crawl-rank", master=args.master)
    store = StateStore(spark, args.state)
    pages = spark.read.parquet(args.pages)

    def compute_bucket(unit: str):
        b = int(unit)
        shard = pages.filter(
            F.pmod(F.xxhash64("url"), F.lit(args.buckets)) == b)
        return link_graph(shard)

    result = run_stage(store, "links",
                       [str(b) for b in range(args.buckets)],
                       compute_bucket, out_root=args.out)

    partials = spark.read.parquet(f"{args.out}/links")
    edges = (partials.groupBy("src_host", "dst_host")
             .agg(F.sum("n_links").alias("n_links")))
    edges.write.mode("overwrite").parquet(f"{args.out}/edges")

    ranks = pagerank_mass(edges.select("src_host", "dst_host"),
                          n_iter=args.iters,
                          src="src_host", dst="dst_host") \
        .withColumnRenamed("node", "host")
    ranks.write.mode("overwrite").parquet(f"{args.out}/ranks")

    store.metrics().show(truncate=False)
    print(f"computed={len(result['computed'])} "
          f"skipped={len(result['skipped'])}")
    return spark


if __name__ == "__main__":
    main().stop()
