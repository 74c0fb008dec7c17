"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: local algorithms for document fingerprinting", SIGMOD —
the MOSS scheme): hash every k-token shingle, slide a window of w
consecutive shingle hashes, and keep the minimum of each window. The
guarantee: any shared run of w+k−1 tokens between two documents yields
at least one SHARED fingerprint, while storage drops to ~2/(w+1) of
the shingle count — the plagiarism/near-dup primitive between exact
hashing (too brittle) and MinHash (whole-doc granularity; this one
localizes the match).

Spark-first, pure SQL, ONE Exchange: tokens posexplode, k-gram
assembly via k−1 ``lead`` windows, the winnowing min via a
ROWS-BETWEEN window, and the full-window guard via a count window —
all four window frames share the doc-id hash partitioning, so the
physical plan carries a single shuffle (the staypoints.py discipline).
No Python worker anywhere.

Determinism: the selected fingerprint is the minimum of the combined
key ``hash·2²² + pos`` (40-bit salted-md5 shingle hash, 22-bit
position) — total order, no ties, leftmost-minimum winnowing variant;
identical arithmetic on any engine with md5 (the DuckDB oracle).
Documents beyond 2²² = 4.19M shingles are truncated at that position
(explicit filter; the paper's guarantee then holds per truncated
prefix).

Scale: the only shuffle key is the doc id — skew is bounded by the
longest single document, the same envelope every per-doc text op here
carries. Output ≈ 2·n_shingles/(w+1) rows, each a (doc, pos, hash)
triple ready for the inverted-index join (`pipeline/index.py`) that
turns shared fingerprints into candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["winnow_fingerprints"]

_POS_BITS = 22


def winnow_fingerprints(df: DataFrame, k: int = 4, w: int = 5,
                        text_col: str = "text", id_col: str = "doc_id",
                        seed: int = 1) -> DataFrame:
    """(doc_id, fp_hash, fp_pos) — the distinct winnowed fingerprints:
    ``fp_hash`` the 40-bit shingle hash, ``fp_pos`` the token position
    of the selected shingle. Documents with fewer than k+w−1 tokens
    emit nothing (no full window exists — the scheme's contract)."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), " +")
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.posexplode(toks).alias("pos", "tok"))

    order = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", i).over(order)
                             for i in range(1, k)])
    last = F.lead("tok", k - 1).over(order) if k > 1 else F.col("tok")
    grams = (base.withColumn("_last", last).withColumn("gram", gram)
             .filter(F.col("_last").isNotNull()
                     & (F.col("pos") < F.lit(1 << _POS_BITS))))

    h40 = F.conv(F.substring(
        F.md5(F.concat(F.col("gram"), F.lit(f":win{seed}"))),
        1, 10), 16, 10).cast("long")
    key = h40 * F.lit(1 << _POS_BITS) + F.col("pos")

    pick = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(0, w - 1)
    per_doc = Window.partitionBy("doc_id")
    sel = (grams.withColumn("_key", key)
           .withColumn("_fp", F.min("_key").over(pick))
           .withColumn("_ng", F.count(F.lit(1)).over(per_doc))
           .filter(F.col("pos") <= F.col("_ng") - w))
    return (sel.select("doc_id", F.col("_fp").alias("_f")).distinct()
            .select("doc_id",
                    F.expr(f"_f DIV {1 << _POS_BITS}").alias("fp_hash"),
                    (F.col("_f") % F.lit(1 << _POS_BITS))
                    .alias("fp_pos")))
