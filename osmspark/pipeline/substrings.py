"""Exact substring (token-window) deduplication — the "dedup exact
substrings" pass of training-data curation (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): find every k-token span that
occurs more than once ANYWHERE in the corpus, keep one canonical
occurrence, and score each document by how much of it is duplicated span
mass.

Relation to the siblings in this package: ``lines.py`` dedups at line
granularity (boilerplate removal), ``dedup.py`` at document granularity
(MinHash/SimHash near-dup); this module catches the in-between —
paragraphs copied into otherwise-distinct pages, licence blocks pasted
mid-document, templated sentences — which neither of the other two sees.

Scale design (the part that matters at 100 TB):

* A document of n tokens emits n-k+1 windows — a ~k× row inflation, but
  each window row is just (doc_id, win_no, 16-byte md5): the inflation
  rides the shuffle as fixed-width rows, never the document text.
* The duplicate census is ``groupBy(win_hash).agg(count, min(struct))`` —
  the same skew-safe shape as ``lines.line_census``: a span pasted into
  1e9 pages partial-aggregates to one row per map task before the
  shuffle (plan-pinned by tests/test_substrings.py), where a
  ``row_number`` window would put 1e9 rows into one partition.
* The keeper of a duplicated span is ``min(struct(doc_id, win_no))`` —
  deterministic under any partitioning, associative, order-insensitive.
* Per-document scoring joins windows→census on ``win_hash`` (both sides
  hash-partition on the key; the census side has one row per distinct
  span so the join never amplifies a hot key) and re-aggregates on
  ``doc_id``.

Everything is pure ``pyspark.sql.functions`` (JVM whole-stage codegen, no
Python workers), so the whole pipeline has a line-for-line ANSI-SQL
oracle: tokenize = split on spaces, window text = join of k consecutive
tokens, hash = md5 of that string — byte-identical in Spark and DuckDB.

Reference scope note: marook/osm-read stops at entity decode
(lib/pbfParser.js emits rows only); this is consumer-side curation the
graft adds on the webtext axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["explode_token_windows", "window_census", "dup_span_stats",
           "decontaminate_flags"]


def explode_token_windows(docs: DataFrame, k: int = 8,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_id, win_no, win_hash): every k-token sliding window per doc.

    Tokens split on runs of spaces (the corpus tokenizer used across
    ``textstats``); ``win_no`` is the 1-based token index the window
    starts at; ``win_hash`` is md5 of the space-joined window text.
    Documents shorter than k tokens emit no windows (they re-enter via
    the left join in :func:`dup_span_stats` — never dropped from doc
    stats). Pure codegen: split → sequence → transform(slice) →
    posexplode; the md5 runs once per window on a ≤ k-token string, not
    on the whole document.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), " +")
    n_wins = F.size(toks) - F.lit(k - 1)
    # sequence(1, 0) would yield a DESCENDING [1, 0] — guard short docs
    # to an empty window list instead.
    starts = F.when(n_wins >= 1, F.sequence(F.lit(1), n_wins)
                    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        starts, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))))
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(hashes).alias("_pos", "win_hash"))
            .select("doc_id", (F.col("_pos") + 1).alias("win_no"),
                    "win_hash"))


def window_census(windows: DataFrame) -> DataFrame:
    """(win_hash, n_copies, keep_doc, keep_win): global span census.

    ``n_copies`` counts occurrences (within-doc repeats included);
    the keeper is the lexicographically smallest (doc_id, win_no)
    occurrence. Aggregate form (count + min(struct)) — map-side
    combinable, so the census is skew-proof by construction.
    """
    return (windows.groupBy("win_hash")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min(F.struct("doc_id", "win_no")).alias("_keep"))
            .select("win_hash", "n_copies",
                    F.col("_keep.doc_id").alias("keep_doc"),
                    F.col("_keep.win_no").alias("keep_win")))


def dup_span_stats(docs: DataFrame, k: int = 8, min_dup: int = 2,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document duplicated-span accounting.

    Returns one row per input document (never-drop — docs shorter than
    k tokens surface with ``n_windows = 0``):

    * ``n_windows`` — k-token windows the doc emits,
    * ``n_dup`` — windows whose span occurs ≥ ``min_dup`` times
      corpus-wide (occurrence count, within-doc repeats included),
    * ``n_removable`` — the non-keeper occurrences among those (what an
      excision pass would cut: every copy but the canonical one),
    * ``dup_ratio`` — n_dup / n_windows, rounded to 6 dp (0.0 when the
      doc emits no windows) so engine double noise can't differ.
    """
    wins = explode_token_windows(docs, k=k, text_col=text_col,
                                 id_col=id_col)
    census = window_census(wins)
    flagged = (wins.join(census, "win_hash")
               .select("doc_id",
                       (F.col("n_copies") >= min_dup).alias("_dup"),
                       ((F.col("n_copies") >= min_dup)
                        & ~((F.col("doc_id") == F.col("keep_doc"))
                            & (F.col("win_no") == F.col("keep_win")))
                        ).alias("_removable"))
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_windows"),
                    F.sum(F.col("_dup").cast("long")).alias("n_dup"),
                    F.sum(F.col("_removable").cast("long"))
                    .alias("n_removable")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(flagged, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                    F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
                    F.coalesce("n_removable", F.lit(0))
                    .alias("n_removable"),
                    F.when(F.coalesce("n_windows", F.lit(0)) > 0,
                           F.round(F.coalesce("n_dup", F.lit(0))
                                   / F.col("n_windows"), 6))
                    .otherwise(F.lit(0.0)).alias("dup_ratio")))


def decontaminate_flags(docs: DataFrame, bench: DataFrame, k: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        bench_id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any k-token
    span with an eval/benchmark set (the n-gram-overlap check of GPT-3
    appendix C / Brown et al. 2020 — standard before training on crawl
    data so eval answers aren't memorized from leaks).

    Returns one row per corpus document (never-drop):

    * ``n_windows`` — k-token windows the doc emits,
    * ``n_hits`` — how many of them occur anywhere in the benchmark set,
    * ``hit_frac`` — n_hits / n_windows rounded to 6 dp (0.0 when the
      doc emits no windows),
    * ``contaminated`` — n_hits > 0.

    Scale design: benchmark suites are MB-scale against a 100 TB corpus,
    so the distinct benchmark-span set is tiny — it broadcasts, and the
    corpus side meets it in a map-side hash join with NO shuffle on
    ``win_hash``; the only corpus shuffles are the two combinable
    per-doc censuses on ``doc_id``. The corpus text itself never rides
    a shuffle (window rows are fixed-width (doc_id, hash)).
    """
    wins = explode_token_windows(docs, k=k, text_col=text_col,
                                 id_col=id_col)
    bench_spans = (explode_token_windows(bench, k=k,
                                         text_col=bench_text_col,
                                         id_col=bench_id_col)
                   .select("win_hash").distinct())
    hits = (wins.join(F.broadcast(bench_spans), "win_hash")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    per_doc = wins.groupBy("doc_id").agg(F.count(F.lit(1))
                                         .alias("n_windows"))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.when(F.coalesce("n_windows", F.lit(0)) > 0,
                           F.round(F.coalesce("n_hits", F.lit(0))
                                   / F.col("n_windows"), 6))
                    .otherwise(F.lit(0.0)).alias("hit_frac"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))
