"""Deterministic dataset splitting for training-data pipelines.

``randomSplit`` is the wrong tool for corpus curation: it is seeded per
RUN (recomputing the lineage can reassign rows), not per ROW — a
document's split must be a pure function of its identity so re-runs,
incremental appends, and other engines (the DuckDB oracle, a downstream
trainer's own loader) all agree. ``hash_split`` derives the assignment
from ``md5(id || ':' || seed)`` — md5 is bit-identical everywhere, the
first 8 hex chars give a uniform 32-bit integer, and the bucket
``h % 10_000`` maps to weight thresholds.

Scale: pure JVM expression (no Python, no shuffle, no state); the
split column is computable at scan time so a ``filter(split='train')``
pushes down to a stored column if you materialize it. Skew-free by
construction (md5 uniformity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["hash_split", "mixture_weights", "sample_by_rate",
           "sample_to_budget", "split_column", "stratified_sample"]

_BUCKETS = 10_000


def split_column(id_col: Column, weights: dict[str, float],
                 seed: int = 0) -> Column:
    """CASE expression assigning a split name from a row id.

    ``weights`` values must sum to 1.0 (±1e-9); bucket boundaries are
    ``round(cumsum(w)·10_000)`` so the assignment is exact at 4 decimal
    places of weight. Iteration order of the dict defines the bucket
    layout — use the same order everywhere (Python dicts preserve it).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    h = F.conv(F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, 8),
        16, 10).cast("long")
    bucket = F.pmod(h, F.lit(_BUCKETS))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        hi = round(acc * _BUCKETS)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return expr


def hash_split(df: DataFrame, id_col: str = "doc_id",
               weights: dict[str, float] | None = None, seed: int = 0,
               out: str = "split") -> DataFrame:
    """Attach a deterministic split column (default 80/10/10)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out, split_column(F.col(id_col), weights, seed))


def stratified_sample(df: DataFrame, group_col: str, n_per_group: int,
                      id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic per-group cap: keep the ``n_per_group`` rows of each
    group with the smallest ``md5(id:seed)`` — a seeded uniform draw
    that is a pure function of row identity (stable under re-runs,
    appends change only what a new id displaces) and reproducible in
    any engine with md5. The workhorse of corpus mixing (per-language /
    per-source caps).

    One shuffle on the group key + a window top-n; for heavy groups at
    warehouse scale Spark's partial windowed top-n doesn't exist, so
    pre-filter hot groups with an approximate hash threshold first if a
    single group approaches a partition's memory (documented, not
    needed at driver scale)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_group)
            .drop("_rn"))


def sample_by_rate(df: DataFrame, rates: dict[str, float],
                   group_col: str = "source", id_col: str = "doc_id",
                   seed: int = 0, default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-group rate sampling — the corpus-MIXING
    primitive (temperature-weighted source mixing: keep 100% of wiki,
    30% of common-crawl, …). Each row's fate is a pure function of its
    identity: the same md5 bucket as :func:`split_column`, kept iff
    ``bucket < round(rate·10_000)`` for its group's rate — re-runs,
    incremental appends and the DuckDB oracle all agree row-for-row,
    and expected proportions are exact at 4 decimals of rate.

    Unlike :func:`stratified_sample` (exact per-group CAPS — needs a
    census), this is a pure per-row filter: no shuffle, no state,
    pushes down to a stored column. Use caps when the budget is a
    count, rates when it's a proportion.
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    h = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
        1, 8), 16, 10).cast("long")
    bucket = F.pmod(h, F.lit(_BUCKETS))
    thr = F.lit(round(default_rate * _BUCKETS))
    for g, r in rates.items():
        thr = F.when(F.col(group_col) == g,
                     F.lit(round(r * _BUCKETS))).otherwise(thr)
    return df.filter(bucket < thr)


def mixture_weights(df: DataFrame, group_col: str = "source",
                    alpha: float = 0.5,
                    scale: int = 1_000_000) -> DataFrame:
    """Per-domain temperature-flattened sampling weights — the mixing
    computation that feeds :func:`sample_by_rate`'s rates (the
    α-smoothing of multilingual/multi-source corpora, Conneau & Lample
    2019): w_i = n_i^α / Σ_j n_j^α, so α = 1 reproduces natural
    proportions and α → 0 flattens toward uniform.

    Engine-portable exactness (the same rational-scaling discipline as
    the HLL sketch): the powered count is floored to an integer at
    ``scale`` resolution — for α = 0.5 the power is IEEE-correctly-
    rounded ``sqrt`` (never ``pow``, whose libm results differ across
    engines), the scaled values sum as exact int64 (order-insensitive),
    and the only float op is one final division, rounded to 6 dp.
    Arbitrary α falls back to ``pow`` and is documented best-effort for
    cross-engine hashes.

    Scale: one combinable census shuffle; the per-group table is
    domain-cardinality-sized (tiny), so the total attaches by broadcast
    — no second pass over rows.
    """
    counts = df.groupBy(F.col(group_col).alias("domain")) \
               .agg(F.count(F.lit(1)).alias("n_docs"))
    scaled = counts.withColumn(
        "_s", F.floor(_powered(F.col("n_docs"), alpha) * F.lit(scale))
        .cast("long"))
    tot = scaled.agg(F.sum("_s").alias("_tot"))
    return (scaled.crossJoin(F.broadcast(tot))
            .select("domain", "n_docs",
                    F.round(F.col("_s") / F.col("_tot"), 6).alias("weight")))


def _powered(n, alpha: float):
    """n^α with the engine-portable special cases: α=1 identity, α=0.5
    IEEE-correctly-rounded sqrt; other α via libm pow (best-effort for
    cross-engine hashes)."""
    if alpha == 1.0:
        return n.cast("double")
    if alpha == 0.5:
        return F.sqrt(n)
    return F.pow(n, F.lit(float(alpha)))


def sample_to_budget(df: DataFrame, budget_tokens: int,
                     group_col: str = "source",
                     token_col: str | None = None, alpha: float = 0.5,
                     scale: int = 1_000_000) -> DataFrame:
    """Per-domain sampling PLAN to hit a token budget under
    α-temperature mixture weights — the recipe table every published
    data mix ships (tokens drawn per source and the implied epoch
    count, up- or down-sampling): target_d = floor(w_d · B) with
    w_d = s_d^α / Σ s_j^α over domain sizes s (token sums when
    ``token_col`` is given, doc counts otherwise).

    Exactness: target tokens are computed as the EXACT integer
    ``(scaled_d · B) div total_scaled`` — the product runs in
    decimal(38,0) (int64 would wrap at ~10^13-token domains × 10^6
    scaling), the division is integral, so targets are engine-portable;
    ``epochs = target / size`` and ``rate = min(1, epochs)`` are each
    one rounded float division. Same single-census + broadcast-total
    shape as :func:`mixture_weights`.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    size = (F.sum(F.col(token_col).cast("long")) if token_col
            else F.count(F.lit(1)))
    sizes = df.groupBy(F.col(group_col).alias("domain")) \
              .agg(size.alias("size"))
    scaled = sizes.withColumn(
        "_s", F.floor(_powered(F.col("size"), alpha) * F.lit(scale))
        .cast("long"))
    tot = scaled.agg(F.sum("_s").alias("_tot"))
    target = F.expr(
        f"CAST((CAST(_s AS DECIMAL(38,0)) * CAST({int(budget_tokens)} "
        f"AS DECIMAL(38,0))) DIV CAST(_tot AS DECIMAL(38,0)) AS BIGINT)")
    return (scaled.crossJoin(F.broadcast(tot))
            .withColumn("weight", F.round(F.col("_s") / F.col("_tot"), 6))
            .withColumn("target_tokens", target)
            .withColumn("epochs",
                        F.round(F.col("target_tokens") / F.col("size"), 6))
            .withColumn("rate", F.least(F.lit(1.0), F.col("epochs")))
            .select("domain", "size", "weight", "target_tokens",
                    "epochs", "rate"))
