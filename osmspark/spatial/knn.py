"""kNN join: hex k-ring candidate join + partial top-k, exact via repair.

North-rule operator "grid-partitioned kNN via H3 k-ring expansion with a
sort-merge refine step". Scale-first construction (SURVEY.md §7.3):

``knn_join`` (the 10^12-point path):

1. points get a hex cell id via a pure-SQL expression (JVM codegen — no
   Python, see grid/hexgrid_sql.py).
2. queries explode to their k-ring cells via a pure-SQL array expression
   and are **broadcast** — the candidate join is a BroadcastHashJoin, so
   the big (point) side never shuffles. This is the whole game at scale:
   the only data movement is candidates, a ~1e-4 fraction of points at
   res 9.
3. distance is a SQL expression; a map-side **partial top-k**
   (``mapInPandas``, one Python stage fused after the JVM join) reduces
   each partition's candidates to ≤ |Q|·k rows before the final
   ``row_number() over (partition by q_id order by dist2, p_id)`` — the
   sort-merge refine now sorts ~parts·|Q|·k rows instead of all
   candidates.
4. EXACTNESS GUARD: a point outside the k-ring at hex edge ``e`` is at
   planar distance ≥ (1.5·ring − 0.5)·e from the query. Queries whose
   k-th candidate lies beyond that bound (or with < k candidates) are
   re-run through ``knn_broadcast`` and unioned back, so the result
   equals the exact brute-force join — which the DuckDB oracle checks.

``knn_broadcast`` (exact, O(|P|·|Q|) work but map-only): queries ride to
every partition in the UDF closure; each Arrow batch emits a superset of
its local top-k (ties at the k-th distance kept, so the global merge is
exact); a final window over the tiny union picks the true top-k. No
shuffle of points, near-perfect scaling — the right tool when |Q| is
small and the guarantee radius can't be tuned.

``knn_bruteforce`` (crossJoin + window) stays as the oracle-shaped
reference implementation for small inputs.

Distance = squared planar degrees, written with identical expression
shape in Spark SQL and the oracle SQL so float64 results agree
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..grid import hexgrid
from ..grid.hexgrid_sql import hex_cell_col, hex_kring_explode

__all__ = ["knn_join", "knn_broadcast", "knn_bruteforce"]

_OUT_SCHEMA = "q_id long, p_id long, dist2 double"


def _dist2(qlat, qlon, plat, plon):
    # (qlat-plat)² + (qlon-plon)² — keep this exact shape in oracle SQL
    return (qlat - plat) * (qlat - plat) + (qlon - plon) * (qlon - plon)


def _topk_window(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("p_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "p_id", "dist2", "rank"))


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int,
                   point_id: str = "id") -> DataFrame:
    """Exact kNN by cross join + window — the oracle-shaped baseline.

    O(|P|·|Q|) rows through a window sort: only for small inputs; the
    scale paths are ``knn_join`` / ``knn_broadcast``."""
    p = points.select(F.col(point_id).alias("p_id"),
                      F.col("lat").alias("p_lat"), F.col("lon").alias("p_lon"))
    q = queries.select(F.col("q_id"), F.col("lat").alias("q_lat"),
                       F.col("lon").alias("q_lon"))
    joined = q.crossJoin(p).withColumn(
        "dist2", _dist2(F.col("q_lat"), F.col("q_lon"),
                        F.col("p_lat"), F.col("p_lon")))
    return _topk_window(joined, k)


def knn_broadcast(points: DataFrame, queries_pdf: pd.DataFrame, k: int,
                  point_id: str = "id", q_chunk: int = 256,
                  p_chunk: int = 16384) -> DataFrame:
    """Exact kNN, queries broadcast in-closure, map-side partial top-k.

    ``queries_pdf`` is a driver-side pandas frame (q_id, lat, lon) — the
    documented small side (≤ ~10^5 queries). Each Arrow batch of points
    computes a chunked distance matrix and emits every row whose distance
    is ≤ its query's local k-th smallest (ties kept → exact superset);
    the final window over ~batches·|Q|·k rows picks the true top-k.
    """
    if len(queries_pdf) == 0:
        spark = points.sparkSession
        return spark.createDataFrame([], _OUT_SCHEMA + ", rank int")
    q_id = queries_pdf["q_id"].to_numpy()
    q_lat = queries_pdf["lat"].to_numpy(dtype=np.float64)
    q_lon = queries_pdf["lon"].to_numpy(dtype=np.float64)

    def local_topk(batches):
        for pdf in batches:
            p_id = pdf["p_id"].to_numpy()
            p_lat = pdf["p_lat"].to_numpy(dtype=np.float64)
            p_lon = pdf["p_lon"].to_numpy(dtype=np.float64)
            n = len(p_id)
            if n == 0:
                continue
            out_q, out_p, out_d = [], [], []
            for ps in range(0, n, p_chunk):
                pe = min(ps + p_chunk, n)
                pla, plo = p_lat[ps:pe], p_lon[ps:pe]
                for qs in range(0, len(q_id), q_chunk):
                    qe = min(qs + q_chunk, len(q_id))
                    dla = q_lat[qs:qe][None, :] - pla[:, None]
                    dlo = q_lon[qs:qe][None, :] - plo[:, None]
                    d2 = dla * dla + dlo * dlo
                    kk = min(k, d2.shape[0])
                    kth = np.partition(d2, kk - 1, axis=0)[kk - 1]
                    rows, cols = np.nonzero(d2 <= kth[None, :])
                    out_q.append(q_id[qs + cols])
                    out_p.append(p_id[ps + rows])
                    out_d.append(d2[rows, cols])
            yield pd.DataFrame({
                "q_id": np.concatenate(out_q),
                "p_id": np.concatenate(out_p),
                "dist2": np.concatenate(out_d)})

    pts = points.select(F.col(point_id).alias("p_id"),
                        F.col("lat").alias("p_lat"),
                        F.col("lon").alias("p_lon"))
    local = pts.mapInPandas(local_topk, _OUT_SCHEMA)
    return _topk_window(local, k)


def _ring_pass(points: DataFrame, queries: DataFrame, k: int, res: int,
               ring: int, partial_topk: bool, point_id: str = "id",
               guarantee2: float | None = None) -> DataFrame:
    """One k-ring candidate pass → per-query top-k (possibly incomplete)."""
    pts = points.select(F.col(point_id).alias("p_id"),
                        F.col("lat").alias("p_lat"),
                        F.col("lon").alias("p_lon"),
                        hex_cell_col(F.col("lat"), F.col("lon"), res).alias("cell"))
    q_cells = (hex_kring_explode(queries, "lat", "lon", res, ring, out="cell")
               .select(F.col("q_id"), F.col("lat").alias("q_lat"),
                       F.col("lon").alias("q_lon"), "cell"))

    # broadcast the exploded query side: BroadcastHashJoin — the point
    # side is scanned in place, never shuffled
    cand = (pts.join(F.broadcast(q_cells), "cell", "inner")
            .withColumn("dist2", _dist2(F.col("q_lat"), F.col("q_lon"),
                                        F.col("p_lat"), F.col("p_lon")))
            .select("q_id", "p_id", "dist2"))

    if guarantee2 is not None:
        # the k-ring contains EVERY point within the guarantee radius, so
        # candidates ≤ guarantee² are a complete ball around the query:
        # if ≥ k survive, their top-k is the exact global top-k. The
        # filter runs map-side inside the scan stage and cuts the window
        # input ~6× (ring-disk area vs guarantee-disk area) — measured
        # 50M → 8M rows for 2048 city-core queries at res 9.
        cand = cand.filter(F.col("dist2") <= F.lit(guarantee2))

    if partial_topk:
        # map-side reduction: each partition keeps ≤ |Q|·k candidate rows
        # before the window, so the final sort shuffles parts·|Q|·k rows,
        # not all candidates. Worth it only when candidates per partition
        # vastly exceed |Q|·k (a Python hop costs ~1-2s here; off by
        # default at test scale, on for warehouse-scale candidate sets).
        def local_topk(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                d2 = pdf["dist2"].to_numpy()
                order = np.lexsort((pdf["p_id"].to_numpy(), d2,
                                    pdf["q_id"].to_numpy()))
                qs = pdf["q_id"].to_numpy()[order]
                starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
                rank = np.arange(len(qs)) - np.repeat(
                    starts, np.diff(np.r_[starts, len(qs)]))
                yield pdf.iloc[order[rank < k]]

        cand = cand.mapInPandas(local_topk, _OUT_SCHEMA)

    return _topk_window(cand, k)


def knn_join(points: DataFrame, queries: DataFrame, k: int,
             res: int = 9, ring: int = 1, point_id: str = "id",
             partial_topk: bool = False, max_passes: int = 6) -> DataFrame:
    """Exact kNN via hierarchical k-ring candidate passes + top-k refine.

    ``res``/``ring`` tune the first-pass radius: guarantee radius is
    (1.5·ring − 0.5)·edge_deg(res); pick it to likely contain k neighbors
    at your point density — too coarse explodes candidates (a res-7/ring-2
    first pass produced 39M candidate rows for 128 city-center queries;
    res 9/ring 1 produces ~450k), too fine routes more queries into later
    passes (correct either way).

    Exactness: the k-ring at hex edge ``e`` contains EVERY point within
    planar distance (1.5·ring − 0.5)·e, so candidates inside that radius
    are a complete ball — if ≥ k survive the in-scan distance filter, the
    windowed top-k is provably the global top-k and the query retires.
    Unresolved queries escalate to a COARSER resolution (aperture-7
    hierarchy: same constant-size ring, ×7 candidate area per res step —
    unlike growing the ring, whose O(ring²) offset array blew up Catalyst
    analysis time). The escalation target is DENSITY-ADAPTIVE: pass 0's
    candidate count is a local density estimate, so each unresolved query
    jumps straight to the res whose guarantee ball should hold ≥ k points
    (one extra pass for the whole group at the coarsest such res, instead
    of walking res−1, res−2, … with ~2 Spark jobs of launch latency per
    walk step). Queries still unresolved after ``max_passes`` fall back
    to the exact ``knn_broadcast``. Result rows equal the brute-force
    join.

    At warehouse scale, store the point table partitioned by a coarse
    cell prefix: the first (finest) pass then prunes partitions, and only
    escalation passes — a tiny query fraction — scan wider.
    """
    spark = points.sparkSession

    # queries are the contract's small side: per-query completeness
    # bookkeeping runs on the driver (one toPandas per pass — the frame is
    # |Q_remaining| rows), so each pass costs ONE Spark job over the
    # cached top-k instead of a chain of semi/anti joins and counts
    remaining = queries.select("q_id", "lat", "lon").toPandas()
    remaining = remaining.assign(next_res=res)
    parts: list[DataFrame] = []
    factor = 1.5 * ring - 0.5

    def _target_res(res_now: int, guarantee: float, n_cand: float) -> int:
        # density-adaptive: a ball of radius g held n < k points → a ball
        # expected to hold k needs radius ≈ g·sqrt(k/n); 2× safety because
        # density decays outward from cluster cores (1.5× re-failed ~25%
        # of escalated queries); n floored at 0.5 for empty balls
        need = guarantee * np.sqrt(k / max(n_cand, 0.5)) * 3.0
        need_edge = need / factor
        r = res_now - 1
        while r > 0 and hexgrid.edge_deg(r) < need_edge:
            r -= 1
        return r

    for _ in range(max_passes):
        if len(remaining) == 0:
            break
        # process the FINEST needed resolution first: each query escalates
        # only as far as its own local density requires (one globally-worst
        # query must not drag dense-area queries to a coarse res, where
        # their candidate join output explodes — measured 48s vs 8s on a
        # 160M-point table). Adjacent-res groups merge into one pass at
        # the coarser res (coarser is always complete ⊇ finer) — every
        # pass is a full table scan, so fewer passes beats tighter balls.
        res_max = int(remaining["next_res"].max())
        if res_max < 0:
            break
        res_i = (res_max - 1 if (remaining["next_res"] == res_max - 1).any()
                 else res_max)
        grp = remaining[remaining["next_res"] >= res_i]
        rest = remaining[remaining["next_res"] < res_i]
        guarantee = factor * hexgrid.edge_deg(res_i)
        # very coarse passes (guarantee ≳ 0.05°) near a dense cluster can
        # swallow the whole cluster into one tail query's guarantee ball
        # (tens of millions of window rows for a handful of queries) —
        # force the map-side partial top-k there so the window sees
        # ≤ parts·|grp|·k rows. Mid-res passes stay pure-JVM: the Arrow
        # hop costs more than the window saves (measured 16s vs 4s).
        partial_i = partial_topk or res_i <= 5
        topk = _ring_pass(points,
                          spark.createDataFrame(grp[["q_id", "lat", "lon"]]),
                          k, res_i, ring, partial_i, point_id,
                          guarantee2=guarantee * guarantee).cache()
        # candidates are pre-filtered to the guarantee ball (a complete
        # neighborhood), so n_cand ≥ k alone proves exactness
        per_q = (topk.groupBy("q_id")
                 .agg(F.count("*").alias("n_cand")).toPandas())
        good_ids = set(per_q[per_q["n_cand"] >= k]["q_id"].tolist())
        bad_ids = [q for q in grp["q_id"].tolist() if q not in good_ids]
        if good_ids:
            # exclude the (small) unresolved set rather than filtering by
            # the large resolved set — a 2k-element isin() cost 1.6s of
            # expression evaluation per job
            parts.append(topk.filter(~F.col("q_id").isin(bad_ids))
                         if bad_ids else topk)
        else:
            topk.unpersist()
        counts = dict(zip(per_q["q_id"], per_q["n_cand"]))
        bad = grp[grp["q_id"].isin(bad_ids)].assign(
            next_res=[_target_res(res_i, guarantee, counts.get(q, 0))
                      for q in bad_ids])
        remaining = pd.concat([rest, bad], ignore_index=True)

    if len(remaining):
        parts.append(knn_broadcast(points, remaining[["q_id", "lat", "lon"]],
                                   k, point_id))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
