"""Profile knn_join phase timings at one parallelism level on the
320M-point scaling table (build-once cache shared with BENCH/scaling.py).

Usage: python tools/profile_knn_scale.py <threads> [n_reps]
Prints [knn <phase>] lines (OSMSPARK_KNN_DEBUG) + total per rep.
"""

import os
import sys
import time

os.environ["OSMSPARK_KNN_DEBUG"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

threads = int(sys.argv[1])
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH"))
import scaling as SC  # noqa: E402

from osmspark.session import INFER_FILTERS_RULE, get_spark  # noqa: E402
from osmspark.spatial import knn_join, read_points_fixedpoint  # noqa: E402
from osmspark.spatial.knn import density_sample  # noqa: E402
from osmspark.pages import CITIES  # noqa: E402

spark = get_spark(app=f"knnprof{threads}", master=f"local[{threads}]",
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

t0 = time.time()
sample_pdf, sample_rate = density_sample(points)
print(f"[prof] density_sample build: {time.time()-t0:.1f}s", flush=True)

knn_join(points, qpdf.head(2), 3, res=12, sample=sample_pdf,
         sample_rate=sample_rate).count()
print("[prof] warm done", flush=True)

for rep in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    n = knn_join(points, qpdf, 10, res=12, sample=sample_pdf,
                 sample_rate=sample_rate).count()
    print(f"[prof] rep{rep} total {time.time()-t0:.2f}s rows={n}", flush=True)
spark.stop()
