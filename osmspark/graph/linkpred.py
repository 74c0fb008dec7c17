"""Neighborhood-overlap link prediction: common neighbors + Jaccard.

The classic missing-edge scorers (Liben-Nowell & Kleinberg 2003) over
an undirected graph: for every NON-adjacent pair (u, v) at distance 2,
``cn = |N(u) ∩ N(v)|`` and ``jaccard = cn / (deg_u + deg_v − cn)``.
Recommendation candidates, crawl-frontier prioritization, knowledge-
graph completion all reduce to this join shape.

Pair enumeration is the wedge self-join on the shared middle node —
the SAME candidate shape as triangle counting before orientation, so
the hub caveat is explicit rather than hidden: a middle node of degree
d contributes d·(d−1)/2 candidate pairs. ``max_mid_deg`` caps it the
way production recommenders do (a 10^6-degree hub's co-citation says
nothing about affinity; dropping super-hub MIDDLES loses only
pairs whose sole witness is the hub). Every other step is combinable:
one distinct for canonicalization, one degree census, one groupBy
count on the (u, v) pair, one anti-join against the existing edge
set, one broadcast-size degree re-attach. Integer-exact counts; the
single Jaccard division rounds to 9 dp so both engines agree bit-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["link_predictions"]


def link_predictions(edges: DataFrame, src: str = "src",
                     dst: str = "dst", min_cn: int = 1,
                     max_mid_deg: int | None = None) -> DataFrame:
    """(u, v, cn, deg_u, deg_v, jaccard) for every non-adjacent pair
    with ≥ ``min_cn`` common neighbors, u < v canonical.

    Input is an undirected edge list in any shape (duplicates, both
    directions, self-loops tolerated). ``max_mid_deg`` drops middle
    nodes above that degree from pair GENERATION only — degrees in
    the Jaccard denominator stay exact.
    """
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    sym = (canon.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .union(canon.select(F.col("b").alias("node"),
                               F.col("a").alias("nbr"))))
    deg = (sym.groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    mids = sym.select(F.col("node").alias("mid"), F.col("nbr"))
    if max_mid_deg is not None:
        mids = (mids.join(deg.select(F.col("node").alias("mid"),
                                     F.col("deg").alias("mid_deg")), "mid")
                .filter(F.col("mid_deg") <= F.lit(max_mid_deg))
                .drop("mid_deg"))
    left = mids.select("mid", F.col("nbr").alias("u"))
    right = mids.select(F.col("mid").alias("mid2"), F.col("nbr").alias("v"))
    pairs = (left.join(right, (F.col("mid") == F.col("mid2"))
                       & (F.col("u") < F.col("v")))
             .groupBy("u", "v")
             .agg(F.count(F.lit(1)).cast("long").alias("cn")))
    cand = (pairs.join(canon, (pairs.u == canon.a) & (pairs.v == canon.b),
                       "left_anti")
            .filter(F.col("cn") >= F.lit(min_cn)))
    out = (cand
           .join(deg.select(F.col("node").alias("u"),
                            F.col("deg").alias("deg_u")), "u")
           .join(deg.select(F.col("node").alias("v"),
                            F.col("deg").alias("deg_v")), "v"))
    den = F.col("deg_u") + F.col("deg_v") - F.col("cn")
    return out.select(
        "u", "v", "cn", "deg_u", "deg_v",
        F.round(F.col("cn").cast("double") / den.cast("double"), 9)
        .alias("jaccard"))
