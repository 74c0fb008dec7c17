"""spark-submit entrypoint: end-to-end training-data curation, resumable
— quality gate → exact dedup → near-dup clusters → decontamination →
mixture/budget plan → sequence packing.

Ship with::

    zip -r osmspark.zip osmspark
    spark-submit --py-files osmspark.zip osmspark/jobs/curation_job.py \
        --docs /data/documents --out /data/curated --state /data/state \
        --buckets 64 --bands 16 --budget 1000000000 \
        [--bench /data/eval_suites]

The whole published-pipeline shape (Gopher/RefinedWeb/Dolma) as ONE
checkpointed job over a (doc_id, text, lang, ...) corpus table; every
stage goes through the lineage table (`osmspark/state/lineage.py`), so
a killed job resumes at the first incomplete unit — the north rule's
"resumable from checkpoint with per-partition lineage + metrics"
applied to the curation surface, same as tiling_job / crawl_rank_job.

1. ``filter_dedup`` — the row-heavy stage, bucketed by CONTENT hash
   (exact duplicates co-locate by construction, so per-bucket exact
   dedup is globally correct and each of the ``--buckets`` units is an
   independently resumable slice of a 10^12-doc corpus): Gopher-rule
   keep verdict (map-only) then md5-census keeper join.
2. ``neardup_clusters`` — MinHash-banded LSH candidates over the kept
   corpus + min-label connected components (bucket equi-join, never
   all-pairs).
3. ``canonical`` — keep the min-id doc per near-dup cluster.
4. ``decontaminate`` (only with ``--bench``) — drop docs sharing any
   k-token span with the eval suite (benchmark spans broadcast).
5. ``plan`` — per-lang α-temperature mixture weights + exact-integer
   token-budget targets (the data-recipe table).
6. ``pack`` — concat-and-chunk assignment of the surviving docs to
   ``--seq-len``-token training sequences via the distributed exact
   prefix sum.

Stages 2-6 are single-unit (their inputs are already the reduced
corpus; each is one shuffle-bounded DataFrame plan) — they still ride
the lineage table so a resume skips finished ones and metrics
(row_count, wall_ms) land per stage.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main(argv: list[str] | None = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--buckets", type=int, default=64,
                    help="content-hash units for the filter_dedup stage")
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--bench", default=None,
                    help="optional eval-suite parquet (doc_id, text) — "
                         "enables the decontamination stage")
    ap.add_argument("--k-tokens", type=int, default=8,
                    help="decontamination span length")
    ap.add_argument("--budget", type=int, default=1_000_000,
                    help="token budget for the sampling plan")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stop-hits", type=int, default=2)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from osmspark.pipeline.dedup import (dedup_clusters,
                                         lsh_candidate_pairs,
                                         minhash_signatures)
    from osmspark.pipeline.packing import pack_sequences
    from osmspark.pipeline.quality import gopher_filter
    from osmspark.pipeline.split import sample_to_budget
    from osmspark.pipeline.substrings import decontaminate_flags
    from osmspark.session import get_spark
    from osmspark.state import StateStore, run_stage

    spark = get_spark(app="osmspark-curation", master=args.master)
    store = StateStore(spark, args.state)
    docs = spark.read.parquet(args.docs)
    results: dict[str, dict] = {}

    # 1. quality gate + exact dedup, per content-hash bucket
    def filter_dedup(unit: str):
        b = int(unit)
        shard = (docs
                 .withColumn("_h", F.md5(F.col("text")))
                 .filter(F.pmod(F.xxhash64("_h"), F.lit(args.buckets))
                         == b))
        kept = (gopher_filter(shard, min_words=args.min_words,
                              min_stop_hits=args.min_stop_hits)
                .filter("keep").select(*docs.columns, "_h"))
        keepers = (kept.groupBy("_h")
                   .agg(F.min("doc_id").alias("doc_id")))
        return (kept.join(keepers, ["_h", "doc_id"])
                .drop("_h"))

    results["filter_dedup"] = run_stage(
        store, "filter_dedup", [str(b) for b in range(args.buckets)],
        filter_dedup, out_root=args.out)
    kept = spark.read.parquet(f"{args.out}/filter_dedup")

    # 2-3. near-dup clusters → canonical corpus
    def neardup(unit: str):
        pairs = lsh_candidate_pairs(minhash_signatures(kept),
                                    bands=args.bands)
        return dedup_clusters(kept, pairs)

    results["neardup_clusters"] = run_stage(
        store, "neardup_clusters", ["all"], neardup, out_root=args.out)
    clusters = spark.read.parquet(f"{args.out}/neardup_clusters")

    def canonical(unit: str):
        return kept.join(
            clusters.filter(F.col("doc_id") == F.col("cluster_id"))
            .select("doc_id"), "doc_id")

    results["canonical"] = run_stage(
        store, "canonical", ["all"], canonical, out_root=args.out)
    corpus = spark.read.parquet(f"{args.out}/canonical")

    # 4. optional benchmark decontamination
    if args.bench:
        bench = spark.read.parquet(args.bench)

        def clean(unit: str):
            flags = decontaminate_flags(corpus, bench, k=args.k_tokens)
            return corpus.join(
                flags.filter(~F.col("contaminated")).select("doc_id"),
                "doc_id")

        results["decontaminate"] = run_stage(
            store, "decontaminate", ["all"], clean, out_root=args.out)
        corpus = spark.read.parquet(f"{args.out}/decontaminate")

    # 5-6. recipe plan + sequence packing over the surviving corpus
    with_tokens = corpus.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), " +")).cast("long"))

    def plan(unit: str):
        return sample_to_budget(with_tokens, args.budget,
                                group_col="lang", token_col="n_tokens")

    results["plan"] = run_stage(store, "plan", ["all"], plan,
                                out_root=args.out)

    def pack(unit: str):
        return pack_sequences(with_tokens, args.seq_len)

    results["pack"] = run_stage(store, "pack", ["all"], pack,
                                out_root=args.out)

    n_in = docs.count()
    n_out = corpus.count()
    print(f"curation: {n_in} docs -> {n_out} kept "
          f"({n_in - n_out} filtered/deduped/decontaminated)")
    return spark, results


if __name__ == "__main__":
    main()
