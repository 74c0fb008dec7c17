"""Edge-structure summary statistics: reciprocity and the rich club.

Two classic one-pass structural signals over web-scale link graphs
(the crawl host graph `pipeline/urls.py:link_graph` emits):

- **reciprocity** — what fraction of directed links is returned?
  (Garlaschelli & Loffredo 2004; near 0 on the web, near 1 on social
  follow graphs.)
- **rich-club coefficient** — do high-degree hubs link to each other
  more densely than random? φ(k) = E_k / C(N_k, 2) over the subgraph
  of nodes with degree > k (Zhou & Mondragón 2004).

Both are exact-integer censuses with one final float division per row
(rounded 9 dp) — the repo-wide engine-exactness discipline.

Scale shape: reciprocity is one distinct + one self-equi-join on the
reversed key + one global aggregate. The rich club is a degree census
joined back to edges (|V| rows against |E| — broadcast below the AQE
threshold), then ONE explode over the requested k-thresholds; no
per-k re-scan of the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["reciprocity", "rich_club"]


def reciprocity(edges: DataFrame, src: str = "src",
                dst: str = "dst") -> DataFrame:
    """One-row directed-reciprocity summary.

    Self-loops dropped, duplicate directed edges collapsed first (a
    link is a link, not a weight). r = |{(a,b) ∈ E : (b,a) ∈ E}| /
    |E| — the numerator counts DIRECTED edges whose reverse exists,
    so a mutual pair contributes 2. Output: (n_edges, n_reciprocal,
    reciprocity); NULL r on an empty edge set.
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct())
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = e.join(rev, ["a", "b"], "left_semi")
    tot = e.agg(F.count(F.lit(1)).alias("n_edges"))
    mut = mutual.agg(F.count(F.lit(1)).alias("n_reciprocal"))
    out = tot.crossJoin(mut)
    r = F.when(F.col("n_edges") > 0,
               F.round(F.col("n_reciprocal").cast("double")
                       / F.col("n_edges").cast("double"), 9))
    return out.select("n_edges", "n_reciprocal", r.alias("reciprocity"))


def rich_club(edges: DataFrame, ks: list[int], src: str = "src",
              dst: str = "dst") -> DataFrame:
    """Rich-club coefficient φ(k) for each threshold in ``ks`` over
    the undirected canonical graph (a<b, self-loops dropped).

    φ(k) = E_k / (N_k·(N_k−1)/2) where N_k = #nodes with degree > k
    and E_k = #edges with BOTH endpoint degrees > k. Both censuses
    come from ONE explode over the k list (an edge/node contributes a
    row per threshold it clears) — never a per-k rescan; the division
    is the only float op, 9 dp. Thresholds where N_k < 2 report NULL
    φ with the integer witnesses kept. Output: (k, n_nodes, n_edges,
    phi), one row per requested k (always — zero counts included).
    """
    karr = F.array(*[F.lit(int(k)) for k in sorted(set(ks))])
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))

    nk = (deg.select(F.explode(karr).alias("k"), "d")
          .groupBy("k")
          .agg(F.sum((F.col("d") > F.col("k")).cast("long"))
               .alias("n_nodes")))
    e = (canon
         .join(deg.select(F.col("node").alias("a"),
                          F.col("d").alias("da")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("d").alias("db")), "b")
         .select(F.least("da", "db").alias("dmin")))
    ek = (e.select(F.explode(karr).alias("k"), "dmin")
          .groupBy("k")
          .agg(F.sum((F.col("dmin") > F.col("k")).cast("long"))
               .alias("n_edges")))
    base = nk.join(ek, ["k"], "left")
    n_edges = F.coalesce(F.col("n_edges"), F.lit(0)).cast("long")
    possible = (F.col("n_nodes").cast("decimal(38,0)")
                * (F.col("n_nodes").cast("decimal(38,0)") - 1))
    phi = F.when(F.col("n_nodes") > 1,
                 F.round(F.lit(2.0) * n_edges.cast("double")
                         / possible.cast("double"), 9))
    return base.select("k", F.col("n_nodes").cast("long").alias("n_nodes"),
                       n_edges.alias("n_edges"), phi.alias("phi"))
