"""Triangle counting via degree-ordered edge orientation.

The clustering-coefficient / community-density primitive. The naive
3-way self-join explodes on hubs (a 10^6-degree node contributes
~10^12 wedges); the classic fix (Schank-Wagner / Cohen's MapReduce
formulation) orients every undirected edge from the LOWER-ranked
endpoint to the higher, rank = (degree, id):

- every triangle is counted EXACTLY ONCE, as a wedge at its
  lowest-ranked vertex closed by the oriented third edge;
- max out-degree after orientation is O(√m) for ANY graph — a hub
  becomes a SINK (everything orients into it, almost nothing out), so
  the wedge join's per-key fan-out is bounded and hub skew is gone by
  construction, not by AQE rescue.

Plan shape: canonicalize (dedup + drop self-loops) is one combinable
distinct; degrees one combinable count; the wedge generation is a
self-equi-join on the source node; closure is an equi-join on the
(v, w) pair. All integer keys, all hash joins, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["triangle_counts"]


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts: (node, n_triangles),
    nodes in no triangle omitted.

    Input is an undirected edge list in any shape — duplicates, both
    directions, self-loops all tolerated (canonicalized first).
    """
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))

    # orient low rank → high rank, rank = (degree, id)
    e = (canon
         .join(deg.select(F.col("node").alias("a"),
                          F.col("d").alias("da")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("d").alias("db")), "b"))
    lower_first = (F.col("da") < F.col("db")) | \
                  ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"))

    # wedges at u: pairs (v, w) of out-neighbors, ordered by rank so
    # each unordered pair appears once; closed iff v→w is oriented
    e1 = oriented.select("u", F.col("v").alias("x"),
                         F.col("dv").alias("dx"))
    e2 = oriented.select(F.col("u").alias("u2"), F.col("v").alias("y"),
                         F.col("dv").alias("dy"))
    wedge_order = (F.col("dx") < F.col("dy")) | \
                  ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    wedges = (e1.join(e2, (F.col("u") == F.col("u2")))
              .filter(wedge_order)
              .select("u", F.col("x").alias("v"), F.col("y").alias("w")))
    closing = oriented.select(F.col("u").alias("v"),
                              F.col("v").alias("w"))
    tris = wedges.join(closing, ["v", "w"])

    nodes = (tris.select(F.col("u").alias("node"))
             .union(tris.select(F.col("v").alias("node")))
             .union(tris.select(F.col("w").alias("node"))))
    return (nodes.groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))


def clustering_coefficients(edges: DataFrame, src: str = "src",
                            dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per node: (node, degree,
    n_triangles, coeff) with coeff = 2·tri / (deg·(deg−1)), the
    closed-wedge fraction. Exact integer numerator/denominator; the
    single division is the only float op (rounded 9 dp). Zero-degree-1
    nodes get coeff 0.0. One extra combinable aggregate + a left join
    on top of :func:`triangle_counts` — same skew-free shape."""
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).cast("long")
                                .alias("degree")))
    tri = triangle_counts(edges, src=src, dst=dst)
    den = F.col("degree") * (F.col("degree") - 1)
    return (deg.join(tri, "node", "left")
            .select("node", "degree",
                    F.coalesce(F.col("n_triangles"),
                               F.lit(0).cast("long")).alias("n_triangles"),
                    F.round(F.when(
                        den > 0,
                        (F.lit(2) * F.coalesce(F.col("n_triangles"),
                                               F.lit(0))).cast("double")
                        / den.cast("double")).otherwise(F.lit(0.0)), 9)
                    .alias("coeff")))
