"""Text-analysis operators for a large-scale training-data pipeline.

Everything here is pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage codegen — no Python on the hot path), so each operator is also
expressible in ANSI SQL for the DuckDB oracle. Double-valued outputs are
rounded (both sides) so distributed summation order can't flip the value
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["with_token_count", "with_quality", "with_lang_guess",
           "with_fingerprint", "top_terms_tfidf", "exact_quantiles",
           "vocab_overlap", "robust_stats", "STOPWORDS"]

STOPWORDS = ["the", "a"]

# tiny per-language marker lists for the n-gram/stopword language guesser
# (the synthetic corpus is English-ish for all langs; the operator is the
# deliverable, pinned by determinism tests)
LANG_MARKERS = {
    "en": ["the", "a", "value", "fast"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "et", "pas"],
    "es": ["el", "la", "y", "no"],
    "zh": ["shi", "bu", "wo", "de"],
}


def _tokens(col):
    return F.split(F.trim(col), " +")


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (4-chars-per-token heuristic over non-space characters)."""
    toks = _tokens(F.col(text_col))
    n_chars_nospace = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    return (df
            .withColumn("n_tokens", F.size(toks))
            .withColumn("n_subwords",
                        F.ceil(n_chars_nospace.cast("double") / F.lit(4.0))
                        .cast("long")))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: mean word length, stopword ratio, alpha ratio.

    All ratios rounded to 6 dp so Spark/DuckDB double noise can't differ.
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    mean_wlen = (F.length(F.regexp_replace(F.col(text_col), " ", ""))
                 .cast("double") / n_tok.cast("double"))
    alpha_ratio = (F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
                   .cast("double") / F.length(F.col(text_col)).cast("double"))
    return (df
            .withColumn("mean_word_len", F.round(mean_wlen, 6))
            .withColumn("stopword_ratio",
                        F.round(stop_hits.cast("double") / n_tok.cast("double"), 6))
            .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
            .withColumn("quality_score",
                        F.round(F.least(F.lit(1.0),
                                        alpha_ratio * F.lit(0.5)
                                        + F.lit(0.5) * F.least(F.lit(1.0),
                                                               n_tok / F.lit(50.0))), 6)))


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID (n-gram-heuristic class). Deterministic
    argmax with fixed tie order."""
    toks = _tokens(F.col(text_col))

    def marker_count(words):
        # single-arg lambda: Spark's HOF factory passes one Column per param
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = [marker_count(words).alias(lang)
              for lang, words in LANG_MARKERS.items()]
    struct = F.array(*[
        F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang"))
        for lang, s in zip(LANG_MARKERS, scores)
    ])
    best = F.array_max(struct)  # struct compare: score, then lang
    return df.withColumn("lang_guess", best["lang"]) \
             .withColumn("lang_guess_score", best["score"])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 (exact content id) + a 64-bit rolling
    polynomial hash over tokens (shift-resistant; xxhash64 of each token
    folded with position weights — pure JVM expressions)."""
    toks = _tokens(F.col(text_col))
    # modular polynomial rolling hash (mod 1e9+7 keeps ANSI-safe int64 range)
    mod = F.lit(1_000_000_007).cast("long")
    rolling = F.aggregate(
        toks,
        F.lit(5381).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31) + F.pmod(F.xxhash64(t), mod), mod),
    )
    return (df
            .withColumn("fingerprint_md5", F.md5(F.col(text_col)))
            .withColumn("fingerprint_roll", rolling))


def top_terms_tfidf(docs: DataFrame, k: int = 5, text_col: str = "text",
                    group_col: str = "lang", doc_id: str = "doc_id"
                    ) -> DataFrame:
    """Top-k corpus-characteristic terms per group by tf·idf:
    (group, term, tf, df, score, rank) — the corpus-inspection operator
    every curation pipeline runs before mixing sources.

    - ``tf``: term occurrences within the group (lowercased,
      space-tokenized — the same tokenizer as :func:`with_token_count`,
      so token parity with the oracle is already pinned);
    - ``df``: distinct documents containing the term, CORPUS-wide;
    - ``score`` = tf · (n_docs / df) — a RATIONAL idf, deliberately not
      ``ln(n/df)``: two IEEE divisions/multiplies are bit-identical in
      any engine, while ``ln`` is a libm call with no cross-engine
      last-ulp guarantee. Monotone in the same direction (rarer term ⇒
      bigger idf), which is what a ranking needs.
    - ties break to the lexicographically first term.

    Shuffle shape at scale: explode is narrow; tf and df are two
    wordcount-style partial-agg shuffles; the tf×df equi-join on term
    reuses df's hash partitioning; the scalar n_docs attaches as a
    broadcast, and the final top-k is one window over the (small)
    per-group term aggregate.
    """
    toks = (docs.select(F.col(group_col).alias("grp"), F.col(doc_id),
                        F.explode(_tokens(F.lower(F.col(text_col))))
                        .alias("term"))
            .filter(F.col("term") != ""))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = toks.groupBy("term").agg(
        F.countDistinct(doc_id).alias("df"))
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (tf.join(df_t, "term").crossJoin(F.broadcast(nd))
              .withColumn("score",
                          F.col("tf").cast("double")
                          * F.col("n_docs").cast("double")
                          / F.col("df").cast("double")))
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(),
                                          F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("grp").alias(group_col), "term", "tf", "df",
                    "score", "rank"))


def exact_quantiles(df: DataFrame, value_col: str, group_col: str,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Exact nearest-rank quantiles of an integer metric per group —
    length/token distributions per language or source, the numbers a
    curation pipeline thresholds on. ``approx_percentile`` is a sketch
    (non-deterministic across partitionings); this is exact AND scales.

    Definition (nearest-rank, ceil): q-quantile = the smallest value v
    whose cumulative count reaches ``ceil(q·n)``.

    Scale shape — the naive formulation (row_number window over raw
    rows) sorts the WHOLE table inside per-group window partitions: a
    corpus that is 90% English puts 0.9·10^12 rows in one partition.
    Here the table first collapses to a (group, value) HISTOGRAM — a
    map-side-combinable groupBy whose size is bounded by distinct
    values, not rows — and the window walks only histogram rows
    (cumulative count over values, ≤ a few thousand per group). The
    DuckDB oracle deliberately uses the naive row_number formulation:
    two different algorithms, same nearest-rank answer.

    Output: (group, n, q_<label> per requested quantile), label =
    round(q·100) percent (0.5 → q_50, 0.99 → q_99).
    """
    hist = (df.groupBy(F.col(group_col).alias("grp"),
                       F.col(value_col).alias("v"))
            .agg(F.count(F.lit(1)).alias("c")))
    w_cum = (Window.partitionBy("grp").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.partitionBy("grp")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    cum = hist.select("grp", "v", F.sum("c").over(w_cum).alias("cum"),
                      F.sum("c").over(w_all).alias("n"))
    aggs = [F.max("n").alias("n")]
    for q in qs:
        label = f"q_{round(q * 100)}"
        # ceil(q·n) mirrored textually in the oracle: same IEEE product,
        # same ceil — only the SELECTION algorithm differs
        rank = F.ceil(F.lit(q) * F.col("n").cast("double"))
        aggs.append(F.min(F.when(F.col("cum") >= rank, F.col("v")))
                    .alias(label))
    return (cum.groupBy(F.col("grp").alias(group_col)).agg(*aggs))


def top_collocations(docs: DataFrame, k: int = 20, min_count: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Corpus-wide collocation extraction: the k word bigrams most
    over-represented vs independence — (bigram, c_xy, c_x, c_y, score,
    rank) with the RATIONAL PMI core ``score = c_xy·n_tok/(c_x·c_y)``
    (same reasoning as top_terms_tfidf's rational idf: two IEEE ops
    are engine-exact, ``log`` is a libm last-ulp lottery; the log is
    monotone, so the RANKING is the textbook PMI ranking).

    ``min_count`` suppresses hapax bigrams (PMI's classic degeneracy:
    two words that each appear once score maximal).

    Scale shape: bigram + unigram censuses are wordcount-shaped
    combinable aggs; the two unigram attachments are equi-joins on the
    word; the final top-k is ``ORDER BY … LIMIT k`` — Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), NEVER a single-partition global sort or window.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), " +")
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.transform(F.sequence(F.lit(1), n_tok - 1),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                          F.element_at(toks, i + 1)))) \
        .otherwise(F.array().cast("array<string>"))
    uni = (docs.select(F.explode(toks).alias("w"))
           .filter(F.col("w") != "")
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    total = docs.agg(F.sum(F.size(toks)).cast("long").alias("n_tok"))
    bg = (docs.select(F.explode(bigrams).alias("bigram"))
          .groupBy("bigram").agg(F.count(F.lit(1)).alias("c_xy"))
          .filter(F.col("c_xy") >= min_count)
          .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
          .withColumn("w2", F.split(F.col("bigram"), " ").getItem(1)))
    scored = (bg
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("c").alias("c_x")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("c").alias("c_y")), "w2")
              .crossJoin(F.broadcast(total))
              .withColumn("score",
                          F.round(F.col("c_xy").cast("double")
                                  * F.col("n_tok").cast("double")
                                  / (F.col("c_x").cast("double")
                                     * F.col("c_y").cast("double")), 9)))
    top = (scored.orderBy(F.col("score").desc(), F.col("bigram").asc())
           .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score").desc(), F.col("bigram").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select("bigram", "c_xy", "c_x", "c_y", "score", "rank"))


def with_lang_mix(docs: DataFrame, chunk_tokens: int = 16,
                  text_col: str = "text",
                  doc_id: str = "doc_id") -> DataFrame:
    """Mixed-language detection: per-chunk language votes aggregated to
    a document disagreement profile — (doc_id, n_chunks, n_langs,
    major_lang, major_frac). Code-switched / template-mixed documents
    (major_frac well below 1) are routed to language-specific cleaning
    or dropped; a whole-doc guesser can't see the mixture.

    Each ``chunk_tokens``-token chunk votes with the SAME marker-count
    argmax as :func:`with_lang_guess` (score desc, then lang — the
    max(struct) tie order). The per-doc rollup is a (doc, lang) census
    + min/max(struct) argmax — combinable aggregates, no windows, so a
    10^6-chunk document reduces per task before any shuffle.
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    nl = F.ceil(n_tok.cast("double")
                / F.lit(float(chunk_tokens))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.slice(toks, i * chunk_tokens + 1, chunk_tokens))
    ch = docs.select(F.col(doc_id), F.explode(chunks).alias("ctoks"))

    def marker_count(words):
        return F.size(F.filter(F.col("ctoks"),
                               lambda t: t.isin(*words)))

    struct = F.array(*[
        F.struct(marker_count(words).cast("long").alias("score"),
                 F.lit(lang).alias("lang"))
        for lang, words in LANG_MARKERS.items()])
    voted = ch.select(doc_id, F.array_max(struct)["lang"].alias("lang"))
    census = (voted.groupBy(doc_id, "lang")
              .agg(F.count(F.lit(1)).alias("c")))
    return (census.groupBy(doc_id)
            .agg(F.sum("c").cast("long").alias("n_chunks"),
                 F.count(F.lit(1)).cast("long").alias("n_langs"),
                 F.min(F.struct((-F.col("c")).alias("negc"),
                                F.col("lang").alias("lang"))).alias("m"))
            .select(doc_id, "n_chunks", "n_langs",
                    F.col("m.lang").alias("major_lang"),
                    F.round((-F.col("m.negc")).cast("double")
                            / F.col("n_chunks").cast("double"), 6)
                    .alias("major_frac")))


#: redaction-scan patterns — identical semantics in Java regex (Spark)
#: and DuckDB's RE2: no backrefs, no lookaround, POSIX classes avoided
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "n_phones": r"\+[0-9]{7,12}",
}


#: replacement tokens, applied in PII_PATTERNS iteration order —
#: emails first so an address's host part can't half-match as an IPv4
PII_TOKENS = {"n_emails": "<EMAIL>", "n_ipv4": "<IPV4>",
              "n_phones": "<PHONE>"}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """The transform :func:`with_pii_counts` audits: every PII match
    replaced by its typed token (``<EMAIL>``/``<IPV4>``/``<PHONE>``),
    plus ``n_redacted`` = the total AUDIT count over the original
    text (the with_pii_counts sum — counted before replacement, so it
    can exceed the number of physical substitutions when one
    pattern's match nests inside an earlier pattern's, e.g. a
    dotted-quad host inside an email address; test-pinned). Pure
    ``regexp_replace``/``regexp_count`` codegen — one scan per
    pattern, no shuffle, no Python; the fixed chain order is part of
    the contract (both engines apply the same sequence, so the output
    bytes are identical even when patterns could overlap)."""
    n_total = None
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        n_total = c if n_total is None else n_total + c
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, PII_TOKENS[name])
    return df.withColumn("n_redacted", n_total).withColumn(out_col, red)


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII-pattern occurrence counts (emails, IPv4s,
    international phone numbers) — the redaction-audit signal a corpus
    pipeline computes before release. Pure ``regexp_count`` codegen
    (one scan, no shuffle); patterns deliberately restricted to the
    regex subset Java and RE2 agree on, so an oracle can count the
    same matches."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(name,
                             F.regexp_count(F.col(text_col), F.lit(pat))
                             .cast("long"))
    return out


def vocab_overlap(df: DataFrame, group_col: str = "lang",
                  text_col: str = "text") -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus groups (languages,
    domains, sources) — the mixture diagnostic that flags near-clone
    sources and mislabeled shards before they skew a data recipe:
    J(a, b) = |V_a ∩ V_b| / |V_a ∪ V_b| over DISTINCT whitespace-token
    vocabularies.

    Scale shape: one (group, token) distinct census, per-group vocab
    sizes (broadcastable — |groups| rows), and the intersection via a
    token-keyed self-join producing group PAIRS per shared token —
    never a cross join of vocabularies; a stop-word shared by all G
    groups fans out to G·(G−1)/2 pairs, bounded by the group count
    squared, not vocab size. Exact integer counts, ONE 9-dp division.
    Output: (group_a, group_b, v_a, v_b, v_shared, jaccard) for every
    unordered pair with ≥ 1 shared token, group_a < group_b.
    """
    toks = (df.select(F.col(group_col).alias("g"),
                      F.explode(_tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != "")
            .distinct())
    sizes = toks.groupBy("g").agg(F.count(F.lit(1)).alias("v"))
    a = toks.select(F.col("g").alias("ga"), "tok")
    b = toks.select(F.col("g").alias("gb"), "tok")
    shared = (a.join(b, "tok")
              .filter(F.col("ga") < F.col("gb"))
              .groupBy("ga", "gb")
              .agg(F.count(F.lit(1)).cast("long").alias("v_shared")))
    out = (shared
           .join(sizes.select(F.col("g").alias("ga"),
                              F.col("v").alias("v_a")), "ga")
           .join(sizes.select(F.col("g").alias("gb"),
                              F.col("v").alias("v_b")), "gb"))
    den = F.col("v_a") + F.col("v_b") - F.col("v_shared")
    return out.select(F.col("ga").alias("group_a"),
                      F.col("gb").alias("group_b"),
                      F.col("v_a").cast("long").alias("v_a"),
                      F.col("v_b").cast("long").alias("v_b"),
                      "v_shared",
                      F.round(F.col("v_shared").cast("double")
                              / den.cast("double"), 9).alias("jaccard"))


def robust_stats(df: DataFrame, value_col: str, group_col: str,
                 k_mad: int = 3) -> DataFrame:
    """Robust center/spread per group — median + MAD (median absolute
    deviation) + the |x − med| > k·MAD outlier census: the
    outlier-resistant alternative to mean/stddev that length/quality
    thresholds at corpus scale should key on (one 10^9-token document
    moves a mean; it moves a median not at all).

    Everything is exact: both medians come from
    :func:`exact_quantiles`'s histogram formulation (nearest-rank
    ceil over the (group, value) census — never a raw-row window),
    deviations are exact integer |x − med|, and the outlier test
    ``|x − med| > k·mad`` is an integer compare — the module-wide
    no-float discipline, so there is NO rounded column at all here.

    Scale shape: two stacked histogram-quantile passes (each bounded
    by distinct values per group, not rows) + one broadcastable
    per-group median attach + one combinable outlier census.
    Output: (group, n, median, mad, n_outliers).
    """
    med = (exact_quantiles(df, value_col, group_col, qs=(0.5,))
           .select(F.col(group_col), F.col("n"),
                   F.col("q_50").alias("median")))
    dev = (df.select(F.col(group_col),
                     F.col(value_col).cast("long").alias("x"))
           .join(med.select(group_col, "median"), group_col)
           .select(F.col(group_col),
                   F.abs(F.col("x") - F.col("median")).alias("adev")))
    mad = (exact_quantiles(dev, "adev", group_col, qs=(0.5,))
           .select(F.col(group_col), F.col("q_50").alias("mad")))
    out_census = (dev.join(mad, group_col)
                  .groupBy(group_col)
                  .agg(F.sum((F.col("adev")
                              > F.lit(k_mad) * F.col("mad"))
                             .cast("long")).alias("n_outliers")))
    return (med.join(mad, group_col).join(out_census, group_col)
            .select(F.col(group_col), F.col("n").cast("long").alias("n"),
                    F.col("median").cast("long").alias("median"),
                    F.col("mad").cast("long").alias("mad"),
                    F.col("n_outliers").cast("long").alias("n_outliers")))
