"""Corpus summary report — the "dataset card" numbers in one row.

Every published corpus (C4, Gopher/MassiveText, RefinedWeb, Dolma)
opens its datasheet with the same table: documents, languages, tokens,
bytes, duplicate rate, PII exposure. This operator computes that row
with the engine's exactness discipline so two runs — or two engines —
publish the SAME card: every count is an exact combinable census
(token counts via the repo tokenizer, exact-dup via the md5 keeper
census), and each rate is ONE division of exact integers rounded 9 dp.

Scale shape: one map-side pass over the corpus computing per-doc
derived columns, ONE global aggregate (all sums combinable), plus one
distinct-hash census for the duplicate count — the exact_dedup shape,
bucketable by content hash. No windows, no Python, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import PII_PATTERNS

__all__ = ["corpus_report"]


def corpus_report(docs: DataFrame, text_col: str = "text",
                  lang_col: str = "lang") -> DataFrame:
    """One row: (n_docs, n_langs, total_tokens, total_chars,
    n_distinct_texts, n_dup_docs, dup_rate, n_pii_docs, pii_rate,
    mean_doc_tokens).

    ``n_dup_docs`` counts documents beyond the first of each exact
    text (the rows exact dedup would drop); ``n_pii_docs`` counts
    documents matching ANY audit pattern; ``total_chars`` counts
    non-space characters (the subword-proxy base in
    ``with_token_count``).
    """
    toks = F.split(F.trim(F.col(text_col)), " +")
    pii_any = None
    for pat in PII_PATTERNS.values():
        c = F.regexp_count(F.col(text_col), F.lit(pat)) > 0
        pii_any = c if pii_any is None else (pii_any | c)
    per = docs.select(
        F.col(lang_col).alias("lang"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace(F.col(text_col), " ", ""))
        .cast("long").alias("n_chars"),
        F.md5(F.col(text_col)).alias("h"),
        pii_any.cast("long").alias("has_pii"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("h").alias("n_distinct_texts"),
        F.sum("has_pii").alias("n_pii_docs"))
    n = F.col("n_docs").cast("double")
    dup = (F.col("n_docs") - F.col("n_distinct_texts")).cast("long")
    return agg.select(
        "n_docs", "n_langs", "total_tokens", "total_chars",
        "n_distinct_texts", dup.alias("n_dup_docs"),
        F.round(dup.cast("double") / n, 9).alias("dup_rate"),
        "n_pii_docs",
        F.round(F.col("n_pii_docs").cast("double") / n, 9)
        .alias("pii_rate"),
        F.round(F.col("total_tokens").cast("double") / n, 9)
        .alias("mean_doc_tokens"))
