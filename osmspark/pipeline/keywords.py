"""TextRank keyword extraction — PageRank over the word graph.

Mihalcea & Tarau 2004: build the token co-occurrence graph (an edge
between words appearing within ``window`` positions of each other,
weighted by co-occurrence count) and rank words by PageRank; the top
of the ranking is the corpus's keyword list. This module is
deliberately a COMPOSITION of operators the engine already proves
exact — the tokenizer/posexplode discipline of ``winnow.py``, the
df-census vocabulary bound of ``index.py`` (words below ``min_df``
never enter the graph, so stop-list-free noise stays out AND the
graph is bounded by the kept vocabulary, not corpus size), and the
weighted integer-mass ``graph.pagerank_mass`` — so the ranking is
bit-identical on any engine and the DuckDB oracle replays the same
derivation with the weighted recursive-CTE PageRank.

Scale shape: one posexplode + ONE doc-keyed window pass (all
``window`` lead offsets share the same Window spec → one Exchange),
two combinable censuses (df, edge weights), then pagerank_mass's
join+agg iterations over the O(vocab²)-bounded-by-cooccurrence edge
table. Top-k is a TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph.pagerank import pagerank_mass

__all__ = ["textrank_keywords"]


def textrank_keywords(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", window: int = 2,
                      min_df: int = 2, n_iter: int = 4,
                      top_k: int = 50) -> DataFrame:
    """Top-``top_k`` (word, mass) by weighted integer PageRank over
    the co-occurrence graph; ties broken by word so the cut is total.

    Windows slide over the ORIGINAL token sequence (the published
    formulation); pairs keep only words with document frequency ≥
    ``min_df`` at both ends. Self-pairs (repeated words inside the
    window) are dropped by pagerank_mass's canonical edge handling
    upstream: the graph is undirected, expressed as both directions.
    """
    toks = (docs.select(F.col(id_col).alias("d"),
                        F.posexplode(F.split(F.trim(F.col(text_col)),
                                             " +"))
                        .alias("pos", "tok"))
            .filter(F.col("tok") != ""))
    dfc = (toks.select("d", "tok").distinct()
           .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    kept = dfc.filter(F.col("df") >= F.lit(min_df)).select("tok")

    w = Window.partitionBy("d").orderBy("pos")
    pairs = None
    for off in range(1, window + 1):
        p = toks.select(F.col("tok").alias("a"),
                        F.lead("tok", off).over(w).alias("b"))
        pairs = p if pairs is None else pairs.unionAll(p)
    und = (pairs.filter(F.col("b").isNotNull()
                        & (F.col("a") != F.col("b")))
           .select(F.least("a", "b").alias("u"),
                   F.greatest("a", "b").alias("v")))
    edges = (und
             .join(kept.select(F.col("tok").alias("u")), "u")
             .join(kept.select(F.col("tok").alias("v")), "v")
             .groupBy("u", "v")
             .agg(F.count(F.lit(1)).cast("long").alias("w")))
    sym = (edges.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                        "w")
           .unionAll(edges.select(F.col("v").alias("src"),
                                  F.col("u").alias("dst"), "w")))
    ranks = pagerank_mass(sym, n_iter=n_iter, weight="w")
    return (ranks.select(F.col("node").alias("word"), "mass")
            .orderBy(F.desc("mass"), F.asc("word"))
            .limit(top_k))
