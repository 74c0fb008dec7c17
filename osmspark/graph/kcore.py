"""k-core decomposition via the distributed h-index fixpoint.

Core number c(v) = the largest k such that v belongs to a subgraph
where every node has degree ≥ k — the standard graph-density peel
(community cores, crawl-frontier pruning, spam-farm detection). The
sequential algorithm peels minimum-degree nodes one at a time — an
inherently serial order — so the distributed form uses the h-index
iteration of Montresor, De Pellegrini & Miorandi ("Distributed k-core
decomposition", IEEE TPDS 2013) / Lü et al. 2016: initialize every
estimate to the node's degree, then repeatedly replace it with the
H-index of its neighbors' estimates (the largest h such that at least
h neighbors currently have estimate ≥ h). Estimates decrease
monotonically and the fixpoint is exactly the core number, so extra
iterations past convergence are no-ops — a FIXED iteration count
past the convergence point yields the exact decomposition, and both
engines running the same count are bit-identical even mid-convergence.

Scale shape per iteration: one equi-join of the O(V) estimate table
onto the symmetrized edge list (join key is the neighbor id — constant
across iterations, so a bucketed edge table makes the edge side
shuffle-free every round), then one row_number window + max aggregate
both keyed on the node id (the aggregate reuses the window's hash
partitioning — single Exchange for the H-index step, plan-pinned).
Integer-only: no float appears anywhere. A 10^8-degree hub makes a
10^8-row window partition — the same per-node neighbor scan every
published distributed k-core performs; cap total work with ``n_iter``
(convergence radius is bounded by the graph's degeneracy ordering
depth, typically ≪ 32 on web graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["kcore_hindex"]


def kcore_hindex(edges: DataFrame, n_iter: int = 16,
                 src: str = "src", dst: str = "dst",
                 materialize: bool = False) -> DataFrame:
    """Core-number estimates after ``n_iter`` h-index iterations:
    (node, core) with core int64 — exact core numbers once ``n_iter``
    reaches the convergence depth (monotone, so overshooting is safe).

    Input is an undirected edge list in any shape — duplicates, both
    directions, self-loops all tolerated (canonicalized first).

    ``materialize`` repartitions the symmetrized edge table on the
    JOIN key (``nbr``) and local-checkpoints it, making every round's
    estimate join exchange-free on both sides (the estimate table
    exits each round hash-partitioned on the node id, which the
    alias-aware planner matches to the edge side) — exactly ONE
    edge-scale shuffle per round remains, the window's node
    partitioning. Default OFF on measurement: at the scaling suite's
    n_iter=3 / 25M edges the one-time checkpoint write cost exceeded
    the saved shuffles (level-8 kcore 73 s → 211 s with it on — the
    RDD-storage write serializes and the checkpointed scan loses
    whole-stage fusion with the join). Worth enabling only when
    n_iter is large enough to amortize one materialization against
    n_iter saved edge shuffles, or when the edge lineage is itself
    expensive to recompute; a warehouse table BUCKETED on the node id
    gets the same exchange-free join with none of the cost — the
    100 TB answer (see pagerank_mass's docstring, same contract).
    """
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    sym = (canon.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .union(canon.select(F.col("b").alias("node"),
                               F.col("a").alias("nbr"))))
    est = (sym.groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    if materialize:
        sym = (sym.repartition(F.col("nbr"))
               .localCheckpoint(eager=False))
    w = Window.partitionBy("node").orderBy(F.desc("nc"), F.asc("nbr"))
    for _ in range(n_iter):
        nb = sym.join(est.select(F.col("node").alias("nbr"),
                                 F.col("c").alias("nc")), "nbr")
        # H-index identity on the desc-sorted neighbor estimates:
        # H = max_r min(r, c_r). Ties in nc don't affect the max, so
        # the nbr tiebreak is for plan stability only.
        est = (nb.withColumn("r", F.row_number().over(w))
               .groupBy("node")
               .agg(F.max(F.least(F.col("r").cast("long"),
                                  F.col("nc"))).alias("c")))
    return est.select("node", F.col("c").alias("core"))
