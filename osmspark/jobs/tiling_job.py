"""spark-submit entrypoint: pages → decode → tiles/PIP/kNN, resumable.

Ship with::

    zip -r osmspark.zip osmspark
    spark-submit --py-files osmspark.zip osmspark/jobs/tiling_job.py \
        --pages /data/pages --out /data/out --state /data/state \
        --res 7 --buckets 64

Units = url-hash buckets: each bucket decodes + tiles independently and
checkpoints to the lineage table, so a killed job resumes at the first
incomplete bucket (idempotent per-unit output dirs). Per-cell counts from
all buckets then merge in a final (tiny) aggregation — two-phase agg by
construction, and the unit partitioning doubles as the skew split: a hot
city cell's points spread across every bucket's partial counts.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main(argv: list[str] | None = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--res", type=int, default=7)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from osmspark.pages import read_pages
    from osmspark.pbf.source import nodes_from_pages
    from osmspark.session import get_spark
    from osmspark.spatial import tile_counts
    from osmspark.state import StateStore, run_stage

    spark = get_spark(app="osmspark-tiling", master=args.master)
    store = StateStore(spark, args.state)
    pages = read_pages(spark, args.pages)

    def compute_bucket(unit: str):
        b = int(unit)
        shard = pages.filter(F.pmod(F.xxhash64("url"), F.lit(args.buckets)) == b)
        nodes = nodes_from_pages(shard)
        return tile_counts(nodes, args.res, grid="hex")

    result = run_stage(store, f"tiles_r{args.res}",
                       [str(b) for b in range(args.buckets)],
                       compute_bucket, out_root=args.out)

    # final merge: per-bucket partial counts → global per-cell counts
    partials = spark.read.parquet(f"{args.out}/tiles_r{args.res}")
    merged = (partials.groupBy("cell")
              .agg(F.sum("n_points").alias("n_points"))
              .withColumn("res", F.lit(args.res)))
    merged.write.mode("overwrite").parquet(f"{args.out}/tiles_r{args.res}_merged")

    store.metrics().show(truncate=False)
    print(f"computed={len(result['computed'])} skipped={len(result['skipped'])}")
    return spark


if __name__ == "__main__":
    # stop only when we own the process (spark-submit); an in-process
    # caller (tests) shares the session
    main().stop()
