"""Degree assortativity — Newman's degree-degree Pearson correlation.

Does the graph wire hubs to hubs (social networks, r > 0) or hubs to
leaves (the web / internet topology, r < 0)? Newman 2002's r is the
Pearson correlation of the degree pair (j, k) at the two ends of a
uniformly random undirected edge:

    r = [ M⁻¹ Σ jk − (M⁻¹ Σ ½(j+k))² ] / [ M⁻¹ Σ ½(j²+k²) − (M⁻¹ Σ ½(j+k))² ]

Multiplying through by 4M² clears every fraction, leaving pure integer
moments over the canonical edge list:

    r = (4M·Sjk − S1²) / (2M·S2 − S1²)
        Sjk = Σ j·k,  S1 = Σ (j+k),  S2 = Σ (j² + k²)

Exactness: the three moment sums run as decimal(38,0) (order-
insensitive, overflow → NULL, never a wrap), and r is ONE float
division of identical exact operands, rounded to 9 dp — hash-exact on
any engine.

Scale shape: canonicalize (one distinct), degree census (one
combinable count), two broadcast-friendly equi-joins back to the edge
list (the degree table is |V| rows against |E| edges; Spark broadcasts
it below the threshold and hash-joins above), then one global
combinable aggregation. No windows, no Python, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["degree_assortativity"]


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """One-row degree-assortativity summary over an undirected edge
    list (duplicates, reversed copies and self-loops tolerated —
    canonicalized to a<b first, matching ``triangle_counts``).

    Output: (m_edges, s_jk, s_1, s_2, assortativity); NULL r for a
    degenerate denominator (all endpoint degrees equal — e.g. a pure
    cycle or a perfect matching, where the correlation is undefined).
    """
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))

    e = (canon
         .join(deg.select(F.col("node").alias("a"),
                          F.col("d").alias("j")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("d").alias("k")), "b"))
    jd = F.col("j").cast("decimal(38,0)")
    kd = F.col("k").cast("decimal(38,0)")
    g = e.agg(F.count(F.lit(1)).alias("m"),
              F.sum(jd * kd).alias("s_jk"),
              F.sum(jd + kd).alias("s_1"),
              F.sum(jd * jd + kd * kd).alias("s_2"))
    m_d = F.col("m").cast("decimal(38,0)")
    num = F.lit(4).cast("decimal(38,0)") * m_d * F.col("s_jk") \
        - F.col("s_1") * F.col("s_1")
    den = F.lit(2).cast("decimal(38,0)") * m_d * F.col("s_2") \
        - F.col("s_1") * F.col("s_1")
    r = F.when(den != 0,
               F.round(num.cast("double") / den.cast("double"), 9))
    return g.select(F.col("m").alias("m_edges"),
                    F.col("s_jk").cast("long").alias("s_jk"),
                    F.col("s_1").cast("long").alias("s_1"),
                    F.col("s_2").cast("long").alias("s_2"),
                    r.alias("assortativity"))
