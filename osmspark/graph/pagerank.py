"""Deterministic integer-mass PageRank over a directed edge list.

Power iteration re-expressed in exact int64 "mass" units so the result
is bit-identical on ANY engine and ANY partitioning: floating-point
PageRank sums contributions in shuffle order (last-ulp drift per
iteration), while integer mass sums commute exactly. Start with
``total_mass // N`` per node; each iteration a node sends
``mass // outdeg`` along every out-edge and the new mass is
``teleport + (num · incoming) // den`` with damping ``num/den``
(default 17/20 = 0.85). Division remainders and dangling-node mass
evaporate — total mass is not conserved, but the operator is a RANKING:
the quantization perturbs scores by O(outdeg/mass) ≪ one rank step.
Production engines run the float variant; this fixed-point form is the
same iteration with deterministic rounding, chosen so the DuckDB oracle
can pin it hash-exact.

Scale shape per iteration: one equi-join of ranks onto edges keyed on
``src`` (both sides can be pre-bucketed on node id — the join key never
changes across iterations, so a bucketed edge table makes every
iteration's join shuffle-free on the edge side) and one
map-side-combinable int64 sum keyed on ``dst``. Hub skew (a node with
10^8 in-links) is a partial-aggregate hot key, not a window — AQE
skew-split applies. The rank vector is O(nodes), never collected to the
driver; only the scalar node count is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank_mass"]


def _int_div(a: F.Column, b: F.Column) -> F.Column:
    """Exact floor division for nonnegative int64 columns: subtract the
    integer remainder first so the double division is exact (the
    quotient is then an integer ≤ 2^53 — correctly-rounded division
    returns it exactly; a raw a/b double floor can be off by one when
    the true fraction is within double error of an integer)."""
    return ((a - a % b) / b).cast("long")


def pagerank_mass(edges: DataFrame, n_iter: int = 5,
                  damping_num: int = 17, damping_den: int = 20,
                  total_mass: int = 10 ** 12,
                  src: str = "src", dst: str = "dst",
                  weight: str | None = None,
                  seeds: DataFrame | None = None) -> DataFrame:
    """Ranks after ``n_iter`` exact integer power iterations.

    Nodes are ``distinct(src) ∪ distinct(dst)``; dangling nodes (no
    out-edges) keep receiving teleport mass but forward nothing.
    Output: (node, mass) with mass int64.

    ``weight``: optional int64 edge-weight column — a node's mass
    splits proportionally, ``share(u→v) = (mass·w_uv) // W_u`` (W_u =
    u's total out-weight; exact integer division, remainders
    evaporate like the unweighted variant's).

    ``seeds``: optional one-column (node) DataFrame → PERSONALIZED
    PageRank: teleport mass flows only to the seed set (split evenly,
    ``(1−d)·M // (den·|seeds|)`` each), non-seeds receive a 0 teleport
    term. The random-surfer restart distribution, exactly.
    """
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    n = nodes.count()  # single scalar to the driver
    if n == 0:
        return nodes.withColumn("mass", F.lit(0).cast("long"))
    w_col = (F.col(weight).cast("long") if weight
             else F.lit(1).cast("long"))
    if weight:
        # Drop non-positive-weight edges up front: an all-zero-weight
        # node would make outdeg=0 and _int_div's a%b NULL, silently
        # dropping its shares (a zero-weight edge carries no mass by
        # definition, so this changes nothing for valid inputs).
        # int64 envelope: the mass*e_w product requires
        # max_mass * max_weight < 2^63 — at the default total_mass of
        # 10^12 that caps weights at ~9.2e6; larger weights need a
        # smaller total_mass or pre-normalized weights.
        edges = edges.filter(F.col(weight).cast("long") > 0)
    deg = (edges.groupBy(F.col(src).alias("node"))
           .agg(F.sum(w_col).alias("outdeg")))
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                     w_col.alias("e_w"))

    if seeds is None:
        tele = F.lit(((damping_den - damping_num) * total_mass)
                     // (damping_den * n)).cast("long")
        teleported = nodes.withColumn("tele", tele)
    else:
        s = seeds.toDF("node").distinct()
        k = s.count()
        per_seed = ((damping_den - damping_num) * total_mass) \
            // (damping_den * max(k, 1))
        teleported = (nodes.join(s.withColumn("_s", F.lit(1)),
                                 "node", "left")
                      .select("node",
                              F.when(F.col("_s").isNotNull(),
                                     F.lit(per_seed))
                              .otherwise(F.lit(0))
                              .cast("long").alias("tele")))

    ranks = nodes.withColumn("mass",
                             F.lit(total_mass // n).cast("long"))
    for _ in range(n_iter):
        share = (ranks.join(deg, "node")
                 .select(F.col("node").alias("s_src"), "mass",
                         F.col("outdeg")))
        contrib = (e.join(share, e.e_src == F.col("s_src"))
                   .select(F.col("e_dst").alias("node"),
                           _int_div(F.col("mass") * F.col("e_w"),
                                    F.col("outdeg")).alias("share")))
        inm = (contrib.groupBy("node")
               .agg(F.sum("share").alias("in_mass")))
        ranks = (teleported.join(inm, "node", "left")
                 .select("node",
                         (F.col("tele")
                          + _int_div(F.lit(damping_num)
                                     * F.coalesce(F.col("in_mass"),
                                                  F.lit(0).cast("long")),
                                     F.lit(damping_den).cast("long")))
                         .cast("long").alias("mass")))
    return ranks
