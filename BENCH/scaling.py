"""Scaling-efficiency measurement: same job, two parallelism levels.

The north rule requires ≥0.8 throughput-scaling efficiency going N → 4N
executors. This sandbox has no cluster; the documented proxy is the same
job at two local parallelism levels (driver instruction / SURVEY.md §6).

Measurement protocol (this VM is HOSTILE to timing):
* nproc=32; a pinned-thread pure-python burn scales 1→4→16→32 procs at
  4.0×/13.7×/24× (0.86 efficiency at 4→16), so we measure N=4 → 4N=16
  — the host itself sustains ≥0.8 over that span, anything below is
  ours (the rule's "e.g. … or N and 4N cores").
* host CPU throughput fluctuates (Firecracker neighbors): identical
  NumPy kernels vary 10-200× run to run. Each (level, rep) runs in its
  own subprocess and reps are INTERLEAVED (4,16,4,16,…); per-stage MIN
  over reps is the steady-state estimate both levels get fairly.
* every subprocess warms all python workers + codegen before timing,
  then each stage runs once UNTIMED (codegen/broadcast/UDF-pickle
  warm-up — those are per-query fixed costs, not throughput) and the
  recorded figure is the min of 2 subsequent timed runs. The workload
  (12M nodes) is sized so the timed stages are compute-dominated: at
  the old 1.5M-node size, ~1s stages measured nothing but task-launch
  overhead, which GROWS with parallelism (more workers to pickle to)
  and reported fake negative scaling.

Usage: python BENCH/scaling.py [--levels 4,16] [--reps 3] [--json-out F]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_PAGES = 3072
NODES_PER_PAGE = 4000
CACHE = f"/tmp/osmspark_scaling/p{N_PAGES}_n{NODES_PER_PAGE}"

STAGES = ["decode", "hex_tiles", "raster_tiles", "pip_join", "knn"]


def worker(n_threads: int) -> None:
    """Run one timed pass at ``n_threads``; print one JSON line."""
    import time

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    sys.path.insert(0, REPO)
    from osmspark.pages import CITIES, read_pages, write_pages
    from osmspark.pbf.source import nodes_from_pages
    from osmspark.session import get_spark
    from osmspark.spatial import knn_join, pip_join, raster_tile_counts, tile_counts

    spark = get_spark(app=f"scale{n_threads}", master=f"local[{n_threads}]",
                      shuffle_partitions=max(8, n_threads))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{CACHE}/_SUCCESS"):
        write_pages(spark, CACHE, N_PAGES, nodes_per_page=NODES_PER_PAGE,
                    partitions=64)
    pages = read_pages(spark, CACHE)

    def _warm_worker(batches):
        from osmspark.grid import hexgrid, s2
        from osmspark.pages import golden_pbf_bytes
        from osmspark.pbf.source import decode_page, render_text
        from osmspark.spatial.pip import ray_cast_contains

        render_text(decode_page(golden_pbf_bytes()))
        la = np.linspace(-60, 60, 100_000)
        lo = np.linspace(-170, 170, 100_000)
        hexgrid.k_ring(hexgrid.cell_id(la, lo, 7), 2)
        s2.cell_id(la, lo, 10)
        np.unique((la * 7).astype(np.int64))
        ray_cast_contains(la, lo, np.array([0.0, 0.0, 50.0, 50.0]),
                          np.array([0.0, 50.0, 50.0, 0.0]))
        for pdf in batches:
            yield pdf[:1]

    (spark.range(4 * n_threads, numPartitions=4 * n_threads)
     .mapInPandas(_warm_worker, "id long").count())

    nodes_path = f"{CACHE}_nodes"
    if not os.path.exists(f"{nodes_path}/_SUCCESS"):
        (nodes_from_pages(pages).select("id", "lat", "lon")
         .repartition(64).write.mode("overwrite").parquet(nodes_path))
    points = spark.read.parquet(nodes_path)

    polys = []
    pid = 0
    for name, clat, clon, _w in CITIES:
        for dla, dlo in ((-0.08, -0.08), (0.0, 0.0)):
            polys.append({
                "poly_id": pid, "name": f"{name}-{pid}",
                "min_lat": clat + dla, "max_lat": clat + dla + 0.08,
                "min_lon": clon + dlo, "max_lon": clon + dlo + 0.08,
                "ring_lat": [clat + dla, clat + dla, clat + dla + 0.08, clat + dla + 0.08],
                "ring_lon": [clon + dlo, clon + dlo + 0.08, clon + dlo + 0.08, clon + dlo]})
            pid += 1
    polys = pd.DataFrame(polys)
    rng = np.random.default_rng(7)
    n_q = 4096
    qpdf = pd.DataFrame({
        "q_id": np.arange(n_q),
        "lat": 51.5 + rng.normal(0, 0.03, n_q),
        "lon": -0.12 + rng.normal(0, 0.03, n_q)})
    queries_df = spark.createDataFrame(qpdf)

    # JVM/codegen warm for each stage shape on small slices
    warm = pages.limit(2)
    nodes_from_pages(warm).count()
    wpts = nodes_from_pages(warm).select("id", "lat", "lon").cache()
    wpts.count()
    tile_counts(wpts, 7, grid="hex").count()
    raster_tile_counts(wpts, 8).count()
    pip_join(wpts, polys, res=6).count()
    knn_join(wpts, queries_df.limit(2), 3).count()
    wpts.unpersist()

    # (stage, repeats-per-timed-run): sub-second stages loop so the
    # recorded figure is throughput, not single-job launch latency (which
    # GROWS with worker count and would fake negative scaling)
    stages = {
        "decode": (lambda: nodes_from_pages(pages).count(), 1),
        "hex_tiles": (lambda: tile_counts(points, 7, grid="hex").count(), 6),
        "raster_tiles": (lambda: raster_tile_counts(points, 8).count(), 6),
        "pip_join": (lambda: pip_join(points, polys, res=6).count(), 3),
        "knn": (lambda: knn_join(points, queries_df, 10).count(), 1),
    }
    out = {}
    for name, (fn, repeats) in stages.items():
        fn()  # untimed warm run: codegen + broadcast + UDF pickle
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            for _ in range(repeats):
                fn()
            best = min(best, (time.time() - t0) / repeats)
        out[name] = round(best, 3)
    spark.stop()
    print("SCALING_RESULT " + json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json-out", default=os.path.join(HERE, "scaling.json"))
    ap.add_argument("--worker-threads", type=int, default=None)
    args = ap.parse_args()
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
                    if ln.startswith("SCALING_RESULT ")]
            if not line:
                print(f"rep{rep} level{level} FAILED:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            res = json.loads(line[0].removeprefix("SCALING_RESULT "))
            results[level].append(res)
            print(f"rep{rep} level{level}: {res}", flush=True)

    best = {level: {s: min(r[s] for r in runs) for s in STAGES}
            for level, runs in results.items() if runs}
    n_nodes = N_PAGES * NODES_PER_PAGE + 6 + 3000 - 2 * NODES_PER_PAGE
    report = {
        "levels": [lo, hi],
        "reps": args.reps,
        "n_pages": N_PAGES,
        "n_nodes": n_nodes,
        "all_runs": {str(k): v for k, v in results.items()},
        "stage_sec_min": {str(k): v for k, v in best.items()},
        "speedup": {s: round(best[lo][s] / best[hi][s], 3) for s in STAGES},
        "efficiency": {s: round(best[lo][s] / best[hi][s] / (hi / lo), 3)
                       for s in STAGES},
        "total_sec": {str(k): round(sum(v.values()), 3) for k, v in best.items()},
        "total_efficiency": round(
            sum(best[lo].values()) / sum(best[hi].values()) / (hi / lo), 3),
        "docs_per_sec": {str(k): round(N_PAGES / best[k]["decode"], 1) for k in best},
        "nodes_per_sec": {str(k): round(n_nodes / best[k]["decode"], 1) for k in best},
    }
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("speedup", "efficiency", "total_efficiency",
                       "docs_per_sec", "nodes_per_sec", "total_sec")}))


if __name__ == "__main__":
    main()
