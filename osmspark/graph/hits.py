"""HITS hubs-and-authorities in exact integer mass.

Kleinberg's link-analysis pair to PageRank (web-search ranking,
crawl-seed selection): authority(v) = Σ hub(u) over in-links,
hub(u) = Σ authority(v) over out-links, renormalized each half-step.
Float HITS sums in shuffle order (last-ulp drift), so — exactly like
``pagerank_mass`` — the iteration runs in int64 "mass" units:
each half-step computes the raw in/out sums exactly, then rescales to
total mass M by the exact integer division ``(raw · M) div S`` (S =
Σ raw, carried as a one-row broadcast aggregate — never a driver
collect). The rescale product overflows int64 (raw ≤ S ≈ maxdeg·M),
so it runs in decimal(38,0) with Spark's integral-divide, which both
engines reproduce bit-exact. Division remainders evaporate: the
operator is a RANKING, perturbed O(1/M) ≪ one rank step.

Scale shape per half-step: one equi-join of the O(V) score table onto
the edge list (join key alternates src/dst but both are node ids — a
bucketed edge table co-locates either side), one map-side-combinable
int64 sum, and one broadcast of a single-row total. Hub skew is a
partial-aggregate hot key (AQE skew-split), never a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hits_mass"]


def _rescale(raw: F.Column, total: F.Column, mass: int) -> F.Column:
    """Exact ``(raw · mass) div total`` in decimal(38,0) → int64."""
    num = raw.cast("decimal(38,0)") * F.lit(mass).cast("decimal(38,0)")
    return F.when(total > 0, (num - num % total.cast("decimal(38,0)"))
                  / total.cast("decimal(38,0)")) \
            .otherwise(F.lit(0)).cast("long")


def hits_mass(edges: DataFrame, n_iter: int = 4,
              total_mass: int = 10 ** 9,
              src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, auth, hub) int64 masses after ``n_iter`` full iterations
    (each = authority half-step from hubs, then hub half-step from the
    JUST-updated authorities — the classic Gauss-Seidel order).

    Nodes are ``distinct(src) ∪ distinct(dst)``; a node with no
    in-links holds authority 0, one with no out-links hub 0. Each
    half-step renormalizes so scores sum to ≈ ``total_mass`` (minus
    floor losses), keeping every later product inside decimal(38,0).
    """
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    nodes = (e.select(F.col("e_src").alias("node"))
             .union(e.select(F.col("e_dst").alias("node")))
             .distinct())
    n = nodes.count()  # single scalar to the driver
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("auth"),
                            F.lit(0).cast("long").alias("hub"))
    init = F.lit(total_mass // n).cast("long")
    auth = nodes.withColumn("s", init)
    hub = nodes.withColumn("s", init)
    for _ in range(n_iter):
        raw_a = (e.join(hub.select(F.col("node").alias("e_src"),
                                   F.col("s").alias("hs")), "e_src")
                 .groupBy(F.col("e_dst").alias("node"))
                 .agg(F.sum("hs").alias("raw")))
        tot_a = raw_a.agg(F.sum("raw").alias("tot"))
        auth = (nodes.join(raw_a, "node", "left").crossJoin(tot_a)
                .select("node",
                        _rescale(F.coalesce(F.col("raw"),
                                            F.lit(0).cast("long")),
                                 F.col("tot"), total_mass).alias("s")))
        raw_h = (e.join(auth.select(F.col("node").alias("e_dst"),
                                    F.col("s").alias("as_")), "e_dst")
                 .groupBy(F.col("e_src").alias("node"))
                 .agg(F.sum("as_").alias("raw")))
        tot_h = raw_h.agg(F.sum("raw").alias("tot"))
        hub = (nodes.join(raw_h, "node", "left").crossJoin(tot_h)
               .select("node",
                       _rescale(F.coalesce(F.col("raw"),
                                           F.lit(0).cast("long")),
                                F.col("tot"), total_mass).alias("s")))
    return (auth.select("node", F.col("s").alias("auth"))
            .join(hub.select("node", F.col("s").alias("hub")), "node"))
