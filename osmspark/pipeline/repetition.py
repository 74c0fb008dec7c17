"""Repetition-based quality signals (Gopher-rule family) for web-corpus
curation: duplicate-line fraction, duplicate-line character fraction, and
top-bigram character coverage per document.

These are the repetition filters from the Gopher / MassiveText curation
recipe (Rae et al. 2021, table A1) — documents dominated by repeated
lines or one repeated n-gram are boilerplate/spam and get dropped before
training. The reference (marook/osm-read) has no text layer at all; this
module extends the pipeline the same way textstats.py does, purely with
JVM-side expressions so the DuckDB oracle can mirror every step.

Scale shape (10^12 docs): both censuses are per-document groupBys keyed
on (doc_id, line) / (doc_id, bigram) — map-side combinable, key
cardinality bounded by corpus token count, no skew (a huge doc is still
one doc_id's worth of keys). The per-doc argmax uses a min(struct)
aggregate, NEVER a row_number window over exploded rows, so no window
partition ever holds more than the distinct bigrams of one document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["repetition_signals"]


def _tokens(col):
    return F.split(F.trim(col), " +")


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       doc_id: str = "doc_id",
                       line_tokens: int = 8) -> DataFrame:
    """Per-document repetition signals over derived lines and bigrams.

    The synthetic corpus carries no newlines, so "lines" are fixed
    ``line_tokens``-token chunks — the same derivation line_dedup uses
    (``__spark_entry__._q_line_dedup``), keeping both operators on one
    definition of "line".

    Output per document:

    - ``n_lines``              total derived lines
    - ``dup_line_frac``        fraction of lines whose text occurs more
                               than once WITHIN the document (all
                               occurrences of a duplicated line count,
                               per the Gopher definition)
    - ``dup_line_char_frac``   fraction of line characters inside those
                               duplicated lines
    - ``top_bigram``           most frequent word 2-gram (ties to the
                               lexicographically first)
    - ``top_bigram_n``         its occurrence count (0 for <2 tokens)
    - ``top_bigram_frac``      characters covered by its occurrences
                               (count × gram chars, space excluded) over
                               the document's non-space characters,
                               clamped to 1.0 — overlapping occurrences
                               may overcount, exactly as in the
                               published rule

    Ratios are rounded to 6 dp on both engine and oracle sides.
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    nl = F.ceil(n_tok.cast("double") / F.lit(float(line_tokens))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * line_tokens + 1,
                                           line_tokens)))
    base = docs.select(
        F.col(doc_id),
        chunks.alias("_lines"),
        # bigrams; sequence(1, 0) would DESCEND, so guard short docs
        F.when(n_tok >= 2,
               F.transform(F.sequence(F.lit(1), n_tok - 1),
                           lambda i: F.concat_ws(
                               " ", F.element_at(toks, i),
                               F.element_at(toks, i + 1))))
        .otherwise(F.array().cast("array<string>")).alias("_bigrams"),
        F.length(F.regexp_replace(F.col(text_col), " ", ""))
        .alias("_n_chars"))

    # line census: (doc, line) -> count, then per-doc fractions
    lines = base.select(doc_id, "_n_chars",
                        F.explode("_lines").alias("line"))
    lc = (lines.groupBy(doc_id, "_n_chars", "line")
          .agg(F.count(F.lit(1)).alias("c"))
          .withColumn("len", F.length("line")))
    dup = F.col("c") > 1
    la = (lc.groupBy(doc_id, "_n_chars").agg(
        F.sum("c").cast("long").alias("n_lines"),
        F.coalesce(F.sum(F.when(dup, F.col("c"))), F.lit(0))
        .cast("long").alias("_dup_lines"),
        F.sum(F.col("c") * F.col("len")).cast("long").alias("_line_chars"),
        F.coalesce(F.sum(F.when(dup, F.col("c") * F.col("len"))), F.lit(0))
        .cast("long").alias("_dup_chars")))

    # bigram census + min(struct(-count, bigram)) argmax (count desc,
    # bigram asc) — aggregate, not window, so it scales per doc
    bg = base.select(doc_id, F.explode("_bigrams").alias("bigram"))
    bc = bg.groupBy(doc_id, "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    bt = (bc.groupBy(doc_id)
          .agg(F.min(F.struct((-F.col("cnt")).alias("negc"),
                              F.col("bigram").alias("bigram"))).alias("m"))
          .select(doc_id, F.col("m.bigram").alias("top_bigram"),
                  (-F.col("m.negc")).cast("long").alias("top_bigram_n")))

    out = (la.join(bt, doc_id, "left")
           .select(
               doc_id,
               "n_lines",
               F.round(F.col("_dup_lines").cast("double")
                       / F.col("n_lines").cast("double"), 6)
               .alias("dup_line_frac"),
               F.round(F.when(F.col("_line_chars") > 0,
                              F.col("_dup_chars").cast("double")
                              / F.col("_line_chars").cast("double"))
                       .otherwise(F.lit(0.0)), 6)
               .alias("dup_line_char_frac"),
               F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
               F.coalesce(F.col("top_bigram_n"), F.lit(0).cast("long"))
               .alias("top_bigram_n"),
               F.round(F.when(
                   (F.col("_n_chars") > 0) & F.col("top_bigram_n").isNotNull(),
                   F.least(F.lit(1.0),
                           (F.col("top_bigram_n")
                            * (F.length("top_bigram") - 1)).cast("double")
                           / F.col("_n_chars").cast("double")))
                   .otherwise(F.lit(0.0)), 6)
               .alias("top_bigram_frac")))
    return out
