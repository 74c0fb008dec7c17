"""DBSCAN scaling measurement: same job, two parallelism levels.

Companion to BENCH/scaling.py (same protocol: interleaved subprocess
reps, per-level min, warm-up untimed) for the grid-DBSCAN operator —
too heavy for the 5-rep headline bench, so it gets its own artifact.

Workload: a 16M-point slice of the 320M fixed-point city-gaussian
table (id < N — ids are hash-assigned to cities, so the slice keeps
the full skew mixture), eps = 7.2e-5°, min_pts = 12: at this density
the densest cores (London/Paris/NYC σ-cores, peak ~80 neighbors per
eps-ball) cluster while the gaussian shoulders grade through border to
noise — all three DBSCAN classes present, ~330M candidate pairs, so
the timed stage is dominated by the cell-keyed pair join + degree
aggregation (the parts that scale), with the hash-greater-to-min CC
rounds (latency-floor ~0.3 s/round × ~15 rounds) amortized against it.

Usage: python BENCH/dbscan_scale.py [--levels 2,8] [--reps 2]
       [--json-out BENCH/dbscan_scale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_POINTS = 16_000_000
EPS = 7.2e-5
MIN_PTS = 12


def worker(n_threads: int) -> None:
    import time

    import numpy as np  # noqa: F401

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from osmspark.session import INFER_FILTERS_RULE, get_spark
    from osmspark.spatial import read_points_fixedpoint
    from osmspark.spatial.cluster import dbscan

    sys.path.insert(0, HERE)
    from scaling import BIG_CACHE, N_BIG, build_big_points

    spark = get_spark(app=f"dbscan{n_threads}",
                      master=f"local[{n_threads}]",
                      shuffle_partitions=max(8, n_threads))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.optimizer.excludedRules", INFER_FILTERS_RULE)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
    build_big_points(spark, BIG_CACHE, N_BIG)
    points = (read_points_fixedpoint(spark, BIG_CACHE)
              .filter(F.col("id") < N_POINTS))

    # codegen/shuffle warm on a small slice (untimed)
    dbscan(points.filter(F.col("id") < 200_000), EPS, MIN_PTS).count()

    best = float("inf")
    n_rows = n_clusters = 0
    for _ in range(2):
        t0 = time.time()
        out = dbscan(points, EPS, MIN_PTS)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cluster_id").alias("k"),
            F.sum(F.col("is_core").cast("long")).alias("c")).collect()[0]
        best = min(best, time.time() - t0)
        n_rows, n_clusters, n_cores = agg["n"], agg["k"], agg["c"]
    print(json.dumps({"threads": n_threads, "secs": round(best, 2),
                      "pts_per_sec": round(n_rows / best, 1),
                      "n_points": n_rows, "n_clusters": n_clusters,
                      "n_cores": int(n_cores)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json-out", default=os.path.join(HERE,
                                                       "dbscan_scale.json"))
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker)
        return
    levels = [int(x) for x in args.levels.split(",")]
    results: dict[int, dict] = {}
    for rep in range(args.reps):
        for lv in levels:  # interleaved: both levels see the same host
            env = dict(os.environ)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(lv)],
                capture_output=True, text=True, env=env, check=True)
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            if lv not in results or r["secs"] < results[lv]["secs"]:
                results[lv] = r
            print(f"rep {rep} level {lv}: {r}", file=sys.stderr)
    lo, hi = levels[0], levels[-1]
    speedup = results[lo]["secs"] / results[hi]["secs"]
    eff = speedup / (hi / lo)
    doc = {"levels": levels,
           "eps": EPS, "min_pts": MIN_PTS, "n_points": N_POINTS,
           "per_level": {str(k): v for k, v in results.items()},
           "speedup": round(speedup, 3),
           "efficiency": round(eff, 3)}
    with open(args.json_out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
