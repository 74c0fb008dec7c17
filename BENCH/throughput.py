"""Single-node decode throughput across parallelism levels.

Fills BENCH/BASELINE.md §1 (reference comparison): the decode stage (the
reference's entire job) timed at local[1]/[4]/[16]/[32] over the same
cached 12M-node pages table ``scaling.py`` builds. ``local[1]`` is the
sequential proxy for the reference (see BASELINE.md §1 for why the
reference itself can't execute here). Same measurement protocol as
scaling.py: subprocess per level, warm workers, untimed first run, min
of 2 timed runs.

Usage: python BENCH/throughput.py [--levels 1,4,16,32] [--json-out F]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def worker(n_threads: int) -> None:
    import time

    import numpy as np

    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    from scaling import CACHE, N_PAGES, NODES_PER_PAGE, write_pages_if_needed

    from osmspark.pages import read_pages
    from osmspark.pbf.source import nodes_from_pages
    from osmspark.session import get_spark

    spark = get_spark(app=f"thr{n_threads}", master=f"local[{n_threads}]",
                      shuffle_partitions=max(8, n_threads))
    spark.sparkContext.setLogLevel("ERROR")
    write_pages_if_needed(spark)
    pages = read_pages(spark, CACHE)

    def _warm_worker(batches):
        from osmspark.pages import golden_pbf_bytes
        from osmspark.pbf.source import decode_page, render_text

        render_text(decode_page(golden_pbf_bytes()))
        np.cumsum(np.arange(1000, dtype=np.int64))
        for pdf in batches:
            yield pdf[:1]

    (spark.range(4 * n_threads, numPartitions=4 * n_threads)
     .mapInPandas(_warm_worker, "id long").count())
    nodes_from_pages(pages.limit(2)).count()

    n_nodes = nodes_from_pages(pages).count()  # untimed warm run
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        nodes_from_pages(pages).count()
        best = min(best, time.time() - t0)
    spark.stop()
    print("THR_RESULT " + json.dumps({
        "threads": n_threads, "sec": round(best, 3), "n_nodes": int(n_nodes),
        "n_pages": N_PAGES, "nodes_per_page": NODES_PER_PAGE,
        "nodes_per_sec": round(n_nodes / best, 1),
        "docs_per_sec": round(N_PAGES / best, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,4,16,32")
    ap.add_argument("--json-out", default=os.path.join(HERE, "throughput.json"))
    ap.add_argument("--worker-threads", type=int, default=None)
    args = ap.parse_args()
    if args.worker_threads:
        worker(args.worker_threads)
        return
    results = []
    for level in (int(x) for x in args.levels.split(",")):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--worker-threads", str(level)],
            capture_output=True, text=True, cwd=REPO)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("THR_RESULT ")]
        if not line:
            print(f"level{level} FAILED:\n{proc.stdout[-1500:]}\n"
                  f"{proc.stderr[-1500:]}", file=sys.stderr)
            continue
        res = json.loads(line[0].removeprefix("THR_RESULT "))
        results.append(res)
        print(f"level{level}: {res}", flush=True)
    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
