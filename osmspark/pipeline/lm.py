"""Character-n-gram language-model familiarity scoring — the
perplexity-filter stage of CCNet/RefinedWeb-style curation (score each
document against an in-domain LM; outliers are machine-generated noise,
boilerplate, or wrong-register text) re-expressed WITHOUT logarithms so
the score is hash-exact across engines.

A real KenLM filter computes mean log-probability; ``log`` is a libm
last-ulp lottery (the repo rule: floats only where pinned). The
rational surrogate: with a unigram model over character n-grams,
p(g) = c(g)/T for lang-total T, the MEAN MODEL PROBABILITY of a doc's
grams is

    familiarity = (1/n) * sum_i c(g_i) / T  =  sum_c / (n * T)

— ``sum_c`` is an exact int64 sum of model counts, ``n * T`` an exact
int64 product, and the score ONE division rounded to 6 dp. It ranks
documents the same direction a perplexity filter does (typical
in-domain grams score high, alien text scores low); it is not a
calibrated perplexity and does not claim to be.

Scale shape (10^12 docs): the model is a per-(lang, gram) census —
map-side combinable, key cardinality bounded by alphabet^n per lang
(char trigrams: thousands of live keys), NOT by corpus size — so the
trained model is a tiny table that BROADCASTS into the scoring join;
the per-doc score is then one combinable census on doc_id. Gram
explosion is ~len(text) rows per doc but each row is (doc_id, gram) —
fixed width, no text on the shuffle.

Envelope: sum_c <= n_grams(doc) * max_count; at 10^12-doc scale with a
10^14-gram model a 10^5-gram doc can reach ~10^19 and overflow int64 —
cast the model count to decimal(38,0) upstream if the corpus is in
that regime (the repo's Moran's I discipline).

Reference scope note: marook/osm-read stops at entity decode; this is
consumer-side curation the graft adds on the webtext axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["char_ngram_counts", "ngram_familiarity"]


def _grams(text_col: str, n: int):
    """array of the len-n+1 overlapping character n-grams (empty for
    shorter texts) — 1-based substring in both Spark and DuckDB."""
    length = F.length(F.col(text_col))
    return F.when(length >= n, F.transform(
        F.sequence(F.lit(1), length - (n - 1)),
        lambda i: F.substring(F.col(text_col), i, n)
    )).otherwise(F.array().cast("array<string>"))


def char_ngram_counts(docs: DataFrame, n: int = 3,
                      group_col: str = "lang",
                      text_col: str = "text") -> DataFrame:
    """Train the model: (group, gram, c) occurrence counts. One
    combinable census; key cardinality is bounded by alphabet^n per
    group, not corpus size."""
    return (docs
            .select(F.col(group_col),
                    F.explode(_grams(text_col, n)).alias("gram"))
            .groupBy(group_col, "gram")
            .agg(F.count(F.lit(1)).alias("c")))


def ngram_familiarity(docs: DataFrame, model: DataFrame | None = None,
                      n: int = 3, group_col: str = "lang",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Score every doc against its group's model (``model`` defaults to
    one trained on ``docs`` itself — self-familiarity, the usual
    in-domain setup when no held-out reference corpus exists).

    One row per input doc: ``n_grams``, ``sum_c`` (exact int64 sum of
    model counts over the doc's grams; grams absent from the model
    count 0), ``familiarity = sum_c / (n_grams * T_group)`` rounded to
    6 dp (0.0 for gram-less docs). The model and its per-group totals
    broadcast; the only corpus shuffle is the per-doc census."""
    if model is None:
        model = char_ngram_counts(docs, n, group_col, text_col)
    totals = (model.groupBy(group_col)
              .agg(F.sum("c").cast("long").alias("_t")))
    grams = (docs
             .select(F.col(id_col).alias("doc_id"), F.col(group_col),
                     F.explode(_grams(text_col, n)).alias("gram")))
    scored = (grams
              .join(F.broadcast(model), [group_col, "gram"], "left")
              .groupBy("doc_id", group_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.coalesce(F.sum("c"), F.lit(0)).cast("long")
                   .alias("sum_c")))
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(group_col))
    return (base
            .join(scored, ["doc_id", group_col], "left")
            .join(F.broadcast(totals), group_col, "left")
            .select("doc_id", group_col,
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.coalesce("sum_c", F.lit(0)).alias("sum_c"),
                    F.when(F.coalesce("n_grams", F.lit(0)) > 0,
                           F.round(F.col("sum_c")
                                   / (F.col("n_grams") * F.col("_t")), 6))
                    .otherwise(F.lit(0.0)).alias("familiarity")))
