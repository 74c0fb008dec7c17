"""Scaling evidence for the round-4 trajectory/graph operators.

Same measurement protocol as BENCH/scaling.py (its docstring carries
the host-calibration rationale for the 2→8 gate pair): one subprocess
per (level, rep), levels interleaved, per-stage MIN over reps, every
stage run once untimed (codegen warm) before its timed run. Kept in a
SEPARATE artifact (traj_scaling.json) so the published north-rule gate
numbers in scaling.json never move when new operators are added.

Workload — the 320M-point fixed-point table from scaling.py, reshaped
into trajectories (trip = id DIV 10000 → 8k trips × 10k points over the
first 80M ids; ts = id seconds — monotone inside a trip), plus a
synthetic 25M-edge host graph:

- staypoints    detect_staypoints, 0.02° cells (city gaussians hop
                cells at that quantum) — the 1-Exchange window+agg pass
- speed_filter  implied-speed flags at 30 m/s — lag window + haversine
- resample      2-second grid interpolation (~0.5 ticks/point)
- od_matrix     trip collapse + flow count — two combinable aggs
- pagerank      3 integer-mass iterations, 25M edges / 4M nodes
- sssp          frontier-pruned Bellman-Ford from node 0 over a 12M-edge
                / 1M-node weighted graph (weights in {1,2} keep the round
                count near the hop diameter, so per-round driver sync
                stays a small fraction of the relaxation work)
- dwithin_m     geodesic 100 m self-join on a 320k-point slice
- geofence      enter/exit transitions vs 6 literal city fences over the
                80M-point trajectories — fence-set window + array diff
- idw           IDW 0.02° grid over a 40M-point slice — 9× scatter +
                one skewed-cell groupBy (map-side combine is the claim)
- gi_star_st    space-time Getis-Ord Gi* over the (0.02° cell × day)
                census of the 80M-point trajectories — the r5
                emerging-hot-spot cube: one combinable 3-key census,
                a 27-offset explode equi-join, broadcast moments
- kcore         3 h-index rounds over the 25M-edge host graph — per
                round one estimate join + one node-keyed window/agg
                (the window and the aggregate share one Exchange)

(hausdorff_pairs is deliberately absent: its pair stage is quadratic
per surviving trip pair by definition, and this workload's trips all
overlap every city so the bbox gate that bounds it at planet scale
would be defeated by construction.)

Usage: python BENCH/traj_scale.py [--levels 2,8] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

TRAJ_N = 80_000_000
TRIP_LEN = 10_000
EDGE_N = 25_000_000
NODE_MOD = 1 << 22
SSSP_EDGE_N = 12_000_000
SSSP_NODE_MOD = 1 << 20
STAGES = ["staypoints", "speed_filter", "resample", "od_matrix",
          "pagerank", "sssp", "dwithin_m", "geofence", "idw",
          "gi_star_st", "kcore"]

# inner/outer boxes around the three heaviest cities (london/paris/nyc
# carry ~2/3 of the point mass; σ = 0.02° gaussians)
FENCES = [
    {"fence_id": 2 * i + k,
     "min_lat": lat - d, "max_lat": lat + d,
     "min_lon": lon - d, "max_lon": lon + d}
    for i, (lat, lon) in enumerate([(51.5074, -0.1278),
                                    (48.8566, 2.3522),
                                    (40.7128, -74.0060)])
    for k, d in ((0, 0.02), (1, 0.05))
]


def worker(n_threads: int) -> None:
    import time

    only = os.environ.get("TRAJ_STAGES")
    selected = only.split(",") if only else STAGES

    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    import numpy as np
    from pyspark.sql import functions as F

    import scaling  # BENCH/scaling.py — reuse the big-table cache
    from osmspark.graph import pagerank_mass, shortest_paths
    from osmspark.graph.kcore import kcore_hindex
    from osmspark.session import INFER_FILTERS_RULE, get_spark
    from osmspark.spatial import (detect_staypoints, dwithin_meters_join,
                                  read_points_fixedpoint)
    from osmspark.spatial.flows import od_matrix
    from osmspark.spatial.geofence import geofence_transitions
    from osmspark.spatial.interp import idw_grid
    from osmspark.spatial.spacetime import gi_star_spacetime
    from osmspark.spatial.traj import resample_trips, speed_filter

    spark = get_spark(app=f"traj{n_threads}", master=f"local[{n_threads}]",
                      shuffle_partitions=max(8, n_threads))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
    spark.conf.set("spark.sql.optimizer.excludedRules", INFER_FILTERS_RULE)

    scaling.build_big_points(spark, scaling.BIG_CACHE, scaling.N_BIG)
    points = read_points_fixedpoint(spark, scaling.BIG_CACHE)

    traj = (points.filter(F.col("id") < TRAJ_N)
            .select((F.col("id") / F.lit(TRIP_LEN)).cast("long")
                    .alias("trip_id"),
                    (F.col("id") * F.lit(1_000_000)).alias("ts_us"),
                    "id", "lat", "lon"))
    edges = (spark.range(EDGE_N, numPartitions=64)
             .select((F.col("id") % NODE_MOD).alias("src"),
                     F.pmod(F.xxhash64("id"), F.lit(NODE_MOD)).alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    slice_pts = points.filter(F.col("id") % 1000 == 0) \
                      .select("id", "lat", "lon")
    wedges = (spark.range(SSSP_EDGE_N, numPartitions=64)
              .select((F.col("id") % SSSP_NODE_MOD).alias("src"),
                      F.pmod(F.xxhash64("id"), F.lit(SSSP_NODE_MOD))
                      .alias("dst"),
                      (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(2)) + 1)
                      .alias("w"))
              .filter(F.col("src") != F.col("dst")))

    # warm every stage shape on tiny slices (codegen, not throughput)
    tiny = traj.filter(F.col("id") < 100_000).cache()
    tiny.count()
    detect_staypoints(tiny, cell_deg=0.02).count()
    speed_filter(tiny, 30_000).count()
    resample_trips(tiny, 2_000_000).count()
    od_matrix(tiny, cell_deg=0.02).count()
    tiny.unpersist()
    pagerank_mass(spark.createDataFrame([(1, 2), (2, 1)],
                                        "src long, dst long"),
                  n_iter=2).count()
    shortest_paths(spark.createDataFrame([(1, 2, 1), (2, 3, 2)],
                                         "src long, dst long, w long"),
                   source=1).count()
    wsl = slice_pts.limit(1000)
    dwithin_meters_join(wsl, wsl, 100.0, keep_self=False).count()
    tiny2 = traj.filter(F.col("id") < 100_000)
    geofence_transitions(tiny2, FENCES, trip_col="trip_id",
                         ts_col="ts_us", id_col="id").count()
    idw_grid(tiny2.select("lat", "lon",
                          (F.col("id") % 1000).alias("value_int")),
             cell_deg=0.02).count()
    gi_star_spacetime(spark.createDataFrame(
        [(0, 0, 0, 3), (0, 1, 0, 5), (1, 0, 1, 2)],
        "cell_x long, cell_y long, tbin long, n long")).count()
    kcore_hindex(spark.createDataFrame([(1, 2), (2, 3)],
                                       "src long, dst long"),
                 n_iter=1).count()

    # every stage is forced through an aggregate over COMPUTED columns:
    # a bare .count() lets Catalyst prune cardinality-preserving work
    # (the speed_filter window + haversine vanished entirely — 80M rows
    # "ran" in 0.6 s), so each stage sums the expensive output instead
    def _force(df, *cols):
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     *[F.sum(c).alias(f"s{i}")
                       for i, c in enumerate(cols)]).collect()[0]
        return int(row["n"])

    stages = {
        "staypoints": lambda: _force(
            detect_staypoints(traj, cell_deg=0.02), "duration_us",
            "centroid_lat_e6"),
        "speed_filter": lambda: _force(
            speed_filter(traj, 30_000),
            F.col("plausible").cast("long"), "seg_mm"),
        "resample": lambda: _force(
            resample_trips(traj, 2_000_000), "lat", "lon"),
        "od_matrix": lambda: _force(
            od_matrix(traj, cell_deg=0.02), "total_duration_us"),
        "pagerank": lambda: _force(pagerank_mass(edges, n_iter=3),
                                   "mass"),
        "sssp": lambda: _force(shortest_paths(wedges, source=0), "dist"),
        "dwithin_m": lambda: _force(
            dwithin_meters_join(slice_pts, slice_pts, 100.0,
                                keep_self=False), "dist_m"),
        "geofence": lambda: _force(
            geofence_transitions(traj, FENCES, trip_col="trip_id",
                                 ts_col="ts_us", id_col="id"),
            # ts stays out of the sum: 60M rows x ~8e13 µs wraps int64
            "fence_id", F.length("kind").cast("long")),
        "idw": lambda: _force(
            idw_grid(traj.filter(F.col("id") < TRAJ_N // 2)
                     .select("lat", "lon",
                             (F.col("id") % 1000).alias("value_int")),
                     cell_deg=0.02),
            "idw", "n_samples"),
        "gi_star_st": lambda: _force(
            gi_star_spacetime(
                traj.groupBy(
                    F.floor(F.col("lon") / 0.02).cast("long")
                    .alias("cell_x"),
                    F.floor(F.col("lat") / 0.02).cast("long")
                    .alias("cell_y"),
                    (F.col("ts_us") / F.lit(86_400_000_000))
                    .cast("long").alias("tbin"))
                .agg(F.count(F.lit(1)).alias("n"))),
            "l_sum", "w_i"),
        "kcore": lambda: _force(kcore_hindex(edges, n_iter=3), "core"),
    }
    out = {}
    for name, fn in stages.items():
        if name not in selected:
            continue
        fn()  # untimed: codegen + broadcast warm
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 3)
        out[f"n_{name}"] = n
    spark.stop()
    print("TRAJ_RESULT " + json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json-out",
                    default=os.path.join(HERE, "traj_scaling.json"))
    ap.add_argument("--worker-threads", type=int, default=None)
    ap.add_argument("--stages", default=None,
                    help="comma list to run a subset (fresh-artifact "
                         "runs for newly added stages)")
    args = ap.parse_args()
    if args.stages:
        os.environ["TRAJ_STAGES"] = args.stages
    if args.worker_threads:
        worker(args.worker_threads)
        return

    lo, hi = (int(x) for x in args.levels.split(","))
    results: dict[int, list[dict]] = {lo: [], hi: []}
    for rep in range(args.reps):
        for level in (lo, hi):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker-threads", str(level)],
                capture_output=True, text=True, cwd=REPO)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("TRAJ_RESULT ")]
            if not line:
                print(f"rep{rep} level{level} FAILED:\n"
                      f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            res = json.loads(line[0].removeprefix("TRAJ_RESULT "))
            results[level].append(res)
            print(f"rep{rep} level{level}: {res}", flush=True)

    sel = args.stages.split(",") if args.stages else STAGES
    best = {level: {s: min(r[s] for r in runs) for s in sel}
            for level, runs in results.items() if runs}
    counters = {s: results[lo][0][f"n_{s}"] for s in sel} \
        if results.get(lo) else {}
    report = {
        "levels": [lo, hi],
        "reps": args.reps,
        "traj_points": TRAJ_N,
        "trip_len": TRIP_LEN,
        "edges": EDGE_N,
        "counters": counters,
        "all_runs": {str(k): v for k, v in results.items()},
        "stage_sec_min": {str(k): v for k, v in best.items()},
        "speedup": {s: round(best[lo][s] / best[hi][s], 3) for s in sel},
        "efficiency": {s: round(best[lo][s] / best[hi][s] / (hi / lo), 3)
                       for s in sel},
        "total_sec": {str(k): round(sum(v.values()), 3)
                      for k, v in best.items()},
        "total_efficiency": round(
            sum(best[lo].values()) / sum(best[hi].values()) / (hi / lo), 3),
        "points_per_sec_staypoints": {
            str(k): round(TRAJ_N / best[k]["staypoints"], 1)
            for k in best} if "staypoints" in sel else {},
    }
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("speedup", "efficiency", "total_efficiency",
                       "total_sec", "counters")}))


if __name__ == "__main__":
    main()
