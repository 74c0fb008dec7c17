"""A/B the adaptive scan-merge in knn_join: alternate reps with the
scan-vs-candidates merge ON (scan_rows from the sample) and OFF
(scan_rows=None → ≤max_groups branches), same process, same session.

Usage: python tools/ab_knn_merge.py <threads> [pairs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH"))

import numpy as np
import pandas as pd

import scaling as SC
from osmspark.session import INFER_FILTERS_RULE, get_spark
from osmspark.spatial import knn_join, read_points_fixedpoint
from osmspark.spatial import knn as knn_mod
from osmspark.spatial.knn import density_sample
from osmspark.pages import CITIES

threads = int(sys.argv[1])
pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(app=f"knnab{threads}", master=f"local[{threads}]",
                  shuffle_partitions=max(8, threads))
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
spark.conf.set("spark.sql.files.openCostInBytes", str(2 << 20))
spark.conf.set("spark.sql.optimizer.excludedRules", INFER_FILTERS_RULE)

SC.build_big_points(spark, SC.BIG_CACHE, SC.N_BIG)
points = read_points_fixedpoint(spark, SC.BIG_CACHE)


def _warm(batches):
    from osmspark.grid import hexgrid
    la = np.linspace(-60, 60, 100_000)
    lo = np.linspace(-170, 170, 100_000)
    hexgrid.k_ring(hexgrid.cell_id(la, lo, 7), 2)
    for pdf in batches:
        yield pdf[:1]


(spark.range(4 * threads, numPartitions=4 * threads)
 .mapInPandas(_warm, "id long").count())

rng = np.random.default_rng(7)
n_q = 8192
w = np.array([c[3] for c in CITIES], dtype=np.float64)
city_idx = rng.choice(len(CITIES), size=n_q, p=w / w.sum())
qpdf = pd.DataFrame({
    "q_id": np.arange(n_q),
    "lat": np.array([CITIES[i][1] for i in city_idx]) + rng.normal(0, 0.03, n_q),
    "lon": np.array([CITIES[i][2] for i in city_idx]) + rng.normal(0, 0.03, n_q)})

sample_pdf, sample_rate = density_sample(points)

_orig = knn_mod._quantize_levels


def _no_adapt(r_est, max_groups, scan_rows=None, cand_per_query=0.0):
    return _orig(r_est, max_groups, None, cand_per_query)


def run(adaptive: bool) -> float:
    knn_mod._quantize_levels = _orig if adaptive else _no_adapt
    spark.catalog.clearCache()
    t0 = time.time()
    n = knn_join(points, qpdf, 10, res=12, sample=sample_pdf,
                 sample_rate=sample_rate).count()
    dt = time.time() - t0
    assert n == 81920, n
    return dt


run(True)   # warm codegen both shapes
run(False)
res = {"on": [], "off": []}
for p in range(pairs):
    res["on"].append(run(True))
    res["off"].append(run(False))
    print(f"pair{p}: on={res['on'][-1]:.2f}s off={res['off'][-1]:.2f}s",
          flush=True)
print(f"RESULT threads={threads} on_min={min(res['on']):.2f} "
      f"off_min={min(res['off']):.2f}", flush=True)
spark.stop()
