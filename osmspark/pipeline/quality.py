"""Gopher-rule document quality filter — the composite keep/drop
decision of the MassiveText curation recipe (Rae et al. 2021, table A1),
the standard gate a web crawl passes before pretraining.

``textstats.with_quality`` emits raw quality RATIOS and
``repetition.repetition_signals`` the repetition family; this module is
the DECISION layer: each rule becomes an explicit boolean flag plus one
final ``keep``, so a curation run can report per-rule attrition ("12%
dropped for symbol ratio, 3% for stopwords") instead of a single opaque
drop count — the operational shape every published pipeline
(Gopher, RefinedWeb, Dolma) actually uses.

Rules implemented (thresholds parameterized, defaults = the paper's):

* word count within [min_words, max_words]
* mean word length within [min_mean_wlen, max_mean_wlen]
* symbol-to-word ratio (``#`` or ``...``) <= max_symbol_ratio
* fraction of words containing an alphabetic character >= min_alpha_frac
* at least ``min_stop_hits`` DISTINCT words from a required-stopword
  list (the paper's: the, be, to, of, and, that, have, with)

The paper's bullet/ellipsis LINE rules live with the other line-derived
signals in ``repetition.repetition_signals`` (the synthetic corpus has
no newlines; lines are derived token chunks there).

Exactness: every ratio is ONE division rounded to 6 dp; the flags
compare the ROUNDED value, so engine float noise below 1e-6 cannot flip
a verdict. Scale shape: pure per-row JVM expressions — no shuffle, no
Python worker; at 10^12 docs this is a map-only stage fused into the
scan.

Reference scope note: marook/osm-read stops at entity decode; this is
consumer-side curation the graft adds on the webtext axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["GOPHER_STOPWORDS", "gopher_filter"]

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(docs: DataFrame, text_col: str = "text",
                  min_words: int = 50, max_words: int = 100_000,
                  min_mean_wlen: float = 3.0, max_mean_wlen: float = 10.0,
                  max_symbol_ratio: float = 0.1,
                  min_alpha_frac: float = 0.8,
                  stop_words: tuple[str, ...] = GOPHER_STOPWORDS,
                  min_stop_hits: int = 2) -> DataFrame:
    """Append per-rule flags and the composite ``keep`` verdict.

    Added columns: ``n_words``, ``mean_word_len``, ``symbol_ratio``,
    ``alpha_word_frac``, ``n_stop_hits`` (distinct stopwords present),
    ``ok_words ok_mean_wlen ok_symbols ok_alpha ok_stopwords`` and
    ``keep`` (AND of the flags). Never drops rows — filtering is the
    caller's one-liner ``.filter("keep")`` so attrition stays auditable.
    """
    toks = F.split(F.trim(F.col(text_col)), " +")
    n_words = F.size(toks)
    nw = n_words.cast("double")
    nospace = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    mean_wlen = F.round(nospace.cast("double") / nw, 6)
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\."))
    symbol_ratio = F.round(n_symbols.cast("double") / nw, 6)
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(n_alpha_words.cast("double") / nw, 6)
    n_stop = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(s) for s in stop_words])))

    out = (docs
           .withColumn("n_words", n_words.cast("long"))
           .withColumn("mean_word_len", mean_wlen)
           .withColumn("symbol_ratio", symbol_ratio)
           .withColumn("alpha_word_frac", alpha_frac)
           .withColumn("n_stop_hits", n_stop.cast("long")))
    ok_words = (F.col("n_words") >= min_words) & \
               (F.col("n_words") <= max_words)
    ok_mean = (F.col("mean_word_len") >= min_mean_wlen) & \
              (F.col("mean_word_len") <= max_mean_wlen)
    ok_sym = F.col("symbol_ratio") <= max_symbol_ratio
    ok_alpha = F.col("alpha_word_frac") >= min_alpha_frac
    ok_stop = F.col("n_stop_hits") >= min_stop_hits
    return (out
            .withColumn("ok_words", ok_words)
            .withColumn("ok_mean_wlen", ok_mean)
            .withColumn("ok_symbols", ok_sym)
            .withColumn("ok_alpha", ok_alpha)
            .withColumn("ok_stopwords", ok_stop)
            .withColumn("keep", ok_words & ok_mean & ok_sym
                        & ok_alpha & ok_stop))
