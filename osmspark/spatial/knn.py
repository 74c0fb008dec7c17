"""kNN join: hex k-ring expansion equi-join + window top-k, with an exact
brute-force fallback for under-served queries.

North-rule operator "grid-partitioned kNN via H3 k-ring expansion with a
sort-merge refine step". Construction (SURVEY.md §7.3):

1. queries explode to their k-ring cells (ring_k × |Q| rows — queries are
   the small side).
2. equi-join points on cell — a hash/sort-merge join on the cell key; the
   point side can be pre-bucketed by cell so repeated kNN runs co-locate.
3. per-query ``row_number() over (partition by q_id order by dist, id)``
   ≤ k — the sort-merge refine.
4. EXACTNESS GUARD: a point outside the k-ring at hex edge ``e`` is at
   planar distance ≥ (1.5·ring − 0.5)·e from the query (hex-center
   geometry). Queries whose k-th candidate lies beyond that bound (or with
   < k candidates) are re-run brute-force and unioned back, so the result
   equals the exact brute-force join — which is what the DuckDB oracle
   checks via ``knn_bruteforce``.

Distance = squared planar degrees, written with identical expression shape
in Spark and the oracle SQL so float64 results agree bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from ..grid import hexgrid

__all__ = ["knn_join", "knn_bruteforce"]


def _dist2(qlat, qlon, plat, plon):
    # (qlat-plat)² + (qlon-plon)² — keep this exact shape in oracle SQL
    return (qlat - plat) * (qlat - plat) + (qlon - plon) * (qlon - plon)


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int,
                   point_id: str = "id") -> DataFrame:
    """Exact kNN by cross join + window — the oracle-checkable baseline.

    O(|P|·|Q|): fine when one side is small (it is broadcast); the scale
    path is ``knn_join``."""
    p = points.select(F.col(point_id).alias("p_id"),
                      F.col("lat").alias("p_lat"), F.col("lon").alias("p_lon"))
    q = queries.select(F.col("q_id"), F.col("lat").alias("q_lat"),
                       F.col("lon").alias("q_lon"))
    joined = q.crossJoin(p).withColumn(
        "dist2", _dist2(F.col("q_lat"), F.col("q_lon"),
                        F.col("p_lat"), F.col("p_lon")))
    w = Window.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("p_id").asc())
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "dist2", "rank"))


def knn_join(points: DataFrame, queries: DataFrame, k: int,
             res: int = 6, ring: int = 2, point_id: str = "id") -> DataFrame:
    """Exact kNN via k-ring candidate join + brute-force repair pass."""
    from .tiles import with_hex_cell

    edge = hexgrid.edge_deg(res)
    guarantee2 = ((1.5 * ring - 0.5) * edge) ** 2

    pts = (with_hex_cell(points, res, out="cell")
           .select(F.col(point_id).alias("p_id"),
                   F.col("lat").alias("p_lat"),
                   F.col("lon").alias("p_lon"), "cell")
           # stage split: keep the encode UDF out of the join+window stage
           # (two fused python evals oversubscribe CPUs — see pip.py note);
           # at scale this is the stored cell-bucketed point table
           .localCheckpoint(eager=False))

    ring_size = 3 * ring * (ring + 1) + 1

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def kring_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        cells = hexgrid.cell_id(lat.to_numpy(), lon.to_numpy(), res)
        rings = hexgrid.k_ring(cells, ring)
        return pd.Series(list(rings))

    q = queries.select("q_id", F.col("lat").alias("q_lat"),
                       F.col("lon").alias("q_lon"))
    q_cells = (q.withColumn("cell", F.explode(kring_udf(F.col("q_lat"),
                                                        F.col("q_lon")))))

    # queries-side exploded table is |Q|·ring_size rows; points side only
    # shuffles on cell (and can be bucketed by cell to avoid even that)
    cand = (q_cells.join(pts, "cell", "inner")
            .withColumn("dist2", _dist2(F.col("q_lat"), F.col("q_lon"),
                                        F.col("p_lat"), F.col("p_lon"))))
    w = Window.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("p_id").asc())
    topk = (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "dist2", "rank"))
    # topk is tiny (|Q|·k) but sits on the big join — cache it so the
    # good/repair branches below don't re-execute the join
    topk = topk.cache()

    # exactness repair: queries whose ring didn't provably contain their
    # kNN — including queries with ZERO candidates (absent from topk), so
    # flag by anti-joining against the provably-complete set. Fully lazy:
    # when no query needs repair the brute-force branch joins against an
    # empty (broadcast) set and AQE collapses it.
    per_q = topk.groupBy("q_id").agg(F.count("*").alias("n_cand"),
                                     F.max("dist2").alias("kth_dist2"))
    good_q = per_q.filter((F.col("n_cand") >= k)
                          & (F.col("kth_dist2") <= F.lit(guarantee2))).select("q_id")
    bad_q = queries.select("q_id").join(F.broadcast(good_q), "q_id", "left_anti")
    good = topk.join(F.broadcast(good_q), "q_id", "left_semi")
    redo = knn_bruteforce(points,
                          queries.join(F.broadcast(bad_q), "q_id", "left_semi"),
                          k, point_id)
    return good.unionByName(redo)
