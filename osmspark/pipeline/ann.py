"""Approximate nearest neighbor over embedding columns.

* ``ann_bruteforce_topk`` — exact cosine top-k (oracle-checkable baseline;
  the query side broadcasts, the corpus side never shuffles).
* ``ann_lsh_topk`` — random-hyperplane LSH buckets: corpus and queries hash
  to sign-bit buckets, candidates only within a bucket (multi-probe via
  several independent tables). The 10^12-row scale path: bucket join is an
  equi-join on (table, bucket), no cross product.
* ``ivf_assign`` / ``ann_ivf_topk`` — IVF coarse quantizer: seeded kmeans
  centroids (driver numpy on a sample), points partition by nearest
  centroid, queries probe the ``nprobe`` nearest lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

__all__ = ["ann_bruteforce_topk", "ann_lsh_topk", "train_ivf_centroids",
           "ivf_assign", "ann_ivf_topk", "ann_recall_vs_bruteforce",
           "embedding_centroids", "quantized_mips_topk"]


def _cosine_cols():
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def ann_bruteforce_topk(corpus: DataFrame, queries: DataFrame, k: int,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine; returns (q_id, p_id, rank).

    broadcast(queries) × corpus: the big side streams through a single
    map stage; only |Q|·k rows shuffle for the final window."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("va"))
    c = corpus.select(F.col(id_col).alias("p_id"), F.col(vec_col).alias("vb"))
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("cosine", _cosine_cols())
              .filter(F.col("q_id") != F.col("p_id")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("p_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "rank"))


def ann_bruteforce_topk_np(corpus: DataFrame, queries_pdf: pd.DataFrame, k: int,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k, vectorized: the query matrix broadcasts into a
    mapInPandas closure; each partition emits its LOCAL top-k per query
    (matmul, O(n·|Q|·d) BLAS), then one global window merges partition
    winners — shuffle volume is partitions·|Q|·k rows, never n·|Q|.

    This is the throughput path; ``ann_bruteforce_topk`` (pure SQL
    expressions) is the oracle-parity path."""
    q_ids = queries_pdf[id_col].to_numpy()
    q_mat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)

    def local_topk(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ q_mat.T  # (n, |Q|)
            p_ids = pdf[id_col].to_numpy()
            # mask self-matches
            sims[p_ids[:, None] == q_ids[None, :]] = -np.inf
            kk = min(k, len(p_ids))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, |Q|)
            rows = {
                "q_id": np.tile(q_ids, kk),
                "p_id": p_ids[top].ravel(),
                "cosine": np.take_along_axis(sims, top, axis=0).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[np.isfinite(out["cosine"])]

    cand = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, "q_id long, p_id long, cosine double")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("p_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "rank"))


def _rerank_topk(corpus: DataFrame, queries: DataFrame, cand_ids: DataFrame,
                 k: int, id_col: str, vec_col: str) -> DataFrame:
    """Exact rerank of deduped (q_id, p_id) candidates.

    Vectors are attached AFTER the dedup, both via broadcast joins — the
    corpus streams through one map stage (never shuffles), candidate
    VECTORS never shuffle at all, and the final window moves only
    (q_id, p_id, cosine) scalars. Shuffling rows that carry both
    embedding arrays (the old ``.distinct()``-after-join shape) is the
    thing to avoid at 10^12 rows."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("va"))
    c = corpus.select(F.col(id_col).alias("p_id"), F.col(vec_col).alias("vb"))
    scored = (c.join(F.broadcast(cand_ids), "p_id")
              .join(F.broadcast(q), "q_id")
              .withColumn("cosine", _cosine_cols())
              .select("q_id", "p_id", "cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("p_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "rank"))


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_udf(planes: np.ndarray):
    n_tables, n_bits, _ = planes.shape

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim)
        out = []
        codes = np.zeros((len(mat), n_tables), dtype=np.int64)
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (n, n_bits)
            bits = (proj > 0).astype(np.int64)
            code = np.zeros(len(mat), dtype=np.int64)
            for b in range(n_bits):
                code = (code << 1) | bits[:, b]
            codes[:, t] = code + (t << np.int64(40))  # table id in high bits
        out = list(codes)
        return pd.Series(out)

    return buckets


def ann_lsh_topk(corpus: DataFrame, queries: DataFrame, k: int,
                 n_bits: int = 4, n_tables: int = 24,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets, exact rerank in-bucket.

    The bucket join carries only ids (query side broadcast), candidates
    dedup on (q_id, p_id), and vectors re-attach in ``_rerank_topk`` —
    two corpus scans, zero corpus shuffles."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    bud = _bucket_udf(planes)
    c = (corpus.select(F.col(id_col).alias("p_id"), F.col(vec_col).alias("vb"))
         .withColumn("bucket", F.explode(bud(F.col("vb"))))
         .select("p_id", "bucket"))
    q = (queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("va"))
         .withColumn("bucket", F.explode(bud(F.col("va"))))
         .select("q_id", "bucket"))
    cand_ids = (c.join(F.broadcast(q), "bucket")
                .filter(F.col("q_id") != F.col("p_id"))
                .select("q_id", "p_id").distinct())
    return _rerank_topk(corpus, queries, cand_ids, k, id_col, vec_col)


def train_ivf_centroids(corpus: DataFrame, n_lists: int, dim: int = 64,
                        vec_col: str = "embedding", sample: int = 4096,
                        iters: int = 8, seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample → (n_lists, dim).

    At 10^12 scale the sample is a tiny limit-pushdown scan; training cost
    is O(sample · n_lists · iters) on the driver, broadcast afterwards."""
    pdf = corpus.select(vec_col).limit(sample).toPandas()
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), n_lists, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(df: DataFrame, centroids: np.ndarray, out: str = "list_id",
               vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid lists."""
    cent = centroids

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cent.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return df.withColumn(out, assign(F.col(vec_col)))


def ann_ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
                 n_lists: int = 16, nprobe: int = 8,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, seed: int = 42) -> DataFrame:
    """IVF ANN: corpus partitioned by nearest centroid; queries probe the
    nprobe nearest lists; exact rerank within probed lists.

    Same shuffle discipline as ``ann_lsh_topk``: the list join carries
    only ids (query side broadcast), vectors re-attach after dedup."""
    cent = train_ivf_centroids(corpus, n_lists, dim, vec_col, seed=seed)
    c = (ivf_assign(corpus, cent, "lists", vec_col, nprobe=1)
         .select(F.col(id_col).alias("p_id"),
                 F.explode("lists").alias("list_id")))
    q = (ivf_assign(queries, cent, "lists", vec_col, nprobe=nprobe)
         .select(F.col(id_col).alias("q_id"),
                 F.explode("lists").alias("list_id")))
    cand_ids = (c.join(F.broadcast(q), "list_id")
                .filter(F.col("q_id") != F.col("p_id"))
                .select("q_id", "p_id").distinct())
    return _rerank_topk(corpus, queries, cand_ids, k, id_col, vec_col)


def ann_recall_vs_bruteforce(corpus: DataFrame, queries: DataFrame, k: int,
                             approx: DataFrame,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """recall@k of an approximate top-k against the exact brute force:
    one row (n_queries, recall). Deterministic for fixed seeds, so the
    value is pinnable as a VALUES oracle."""
    exact = ann_bruteforce_topk(corpus, queries, k, id_col, vec_col)
    hit = exact.join(approx.select("q_id", "p_id").withColumn("hit", F.lit(1)),
                     ["q_id", "p_id"], "left")
    per_q = (hit.groupBy("q_id")
             .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                   / F.count(F.lit(1))).alias("recall_q")))
    return per_q.agg(F.count(F.lit(1)).alias("n_queries"),
                     F.round(F.avg("recall_q"), 4).alias("recall"))


def embedding_centroids(embeddings: DataFrame, label_col: str = "label",
                        vec_col: str = "embedding",
                        scale: float = 1e6) -> DataFrame:
    """Per-label centroid components, engine-exact.

    A float centroid (avg of array elements) is summation-order
    dependent — useless for cross-engine verification and flaky under
    shuffle nondeterminism. Here each component quantizes to
    ``floor(x·scale)`` int64 FIRST; integer sums are order-insensitive,
    and the final ``sum/(scale·n)`` division is one deterministic float
    op. Plan: posexplode → groupBy(label, pos) — Spark's partial
    aggregation means the shuffle carries ≤ |labels|·dim·partitions
    rows, never the raw vectors. Output is (label, pos, centroid, n) —
    row-per-component, so the DuckDB oracle (unnest WITH ORDINALITY)
    compares values exactly without array-format ambiguity."""
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "x"))
    return (exploded
            .groupBy("label", "pos")
            .agg(F.sum(F.floor(F.col("x") * scale).cast("long")).alias("_s"),
                 F.count(F.lit(1)).alias("n_vecs"))
            .withColumn("centroid",
                        F.col("_s") / (F.lit(scale) * F.col("n_vecs")))
            .select("label", "pos", "centroid", "n_vecs"))


def quantized_mips_topk(corpus: DataFrame, queries: DataFrame, k: int,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Scalar-quantized (int8-style) maximum-inner-product top-k — the
    FAISS-SQ8/IP pattern: per-dimension symmetric quantization
    ``q = round(v·127/s_d)`` (s_d = corpus max |v| in dimension d),
    then EXACT int64 dot products. Quantization is the scale play
    (4 bytes → 1 per component, SIMD int dots); exactness of the
    integer arithmetic is what lets a DuckDB oracle pin the whole
    operator hash-exact — float dots are summation-order noise.

    The per-dim scales are the corpus's index statistic: one scan
    (posexplode → groupBy(pos).max — combinable), DIM scalars
    collected to the driver and inlined as literals (same pattern as
    kNN's density sample). Zero-range dims quantize to 0. Scoring
    joins the (small, broadcast) query side against the corpus —
    corpus never shuffles; the top-k window partitions by query id
    (bounded by the corpus, one query's candidates per partition).

    Output: (q_id, p_id, dot_q, rank) with (dot_q DESC, p_id ASC)
    tie order; self-matches excluded.
    """
    scales = sorted(
        corpus.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos").agg(F.max(F.abs(F.col("v"))).alias("s"))
        .collect())
    sarr = F.array(*[F.lit(float(r["s"])) for r in scales])

    def quant(col):
        return F.transform(
            col,
            lambda v, i: F.when(
                F.element_at(sarr, i + 1) > 0,
                F.round(v * F.lit(127.0) / F.element_at(sarr, i + 1))
                .cast("long")).otherwise(F.lit(0).cast("long")))

    cq = corpus.select(F.col(id_col).alias("p_id"),
                       quant(F.col(vec_col)).alias("pq"))
    qq = queries.select(F.col(id_col).alias("q_id"),
                        quant(F.col(vec_col)).alias("qq"))
    dot = F.aggregate(F.zip_with("qq", "pq", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (cq.join(F.broadcast(qq),
                      F.col("p_id") != F.col("q_id"))
              .withColumn("dot_q", dot))
    w = Window.partitionBy("q_id").orderBy(F.col("dot_q").desc(),
                                           F.col("p_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "dot_q", "rank"))
