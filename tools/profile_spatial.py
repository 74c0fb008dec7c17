"""One-off profiler: where do pip_join / knn_join spend time? (not shipped API)

Usage: python tools/profile_spatial.py <n_threads>
"""
import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = 384
NODES_PER_PAGE = 4000
CACHE = f"/tmp/osmspark_scaling/p{N_PAGES}_n{NODES_PER_PAGE}"


def main(n_threads: int) -> None:
    from pyspark.sql import functions as F

    from osmspark.pages import CITIES, read_pages, write_pages
    from osmspark.pbf.source import nodes_from_pages
    from osmspark.session import get_spark
    from osmspark.spatial import knn_join, pip_join
    from osmspark.spatial.tiles import with_hex_cell

    spark = get_spark(app=f"prof{n_threads}", master=f"local[{n_threads}]",
                      shuffle_partitions=max(8, n_threads))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{CACHE}/_SUCCESS"):
        write_pages(spark, CACHE, N_PAGES, nodes_per_page=NODES_PER_PAGE,
                    partitions=64)
    pages = read_pages(spark, CACHE)
    nodes_path = f"{CACHE}_nodes"
    if not os.path.exists(f"{nodes_path}/_SUCCESS"):
        (nodes_from_pages(pages).select("id", "lat", "lon")
         .repartition(64).write.mode("overwrite").parquet(nodes_path))
    points = spark.read.parquet(nodes_path)

    # warm
    def _warm(batches):
        from osmspark.grid import hexgrid, s2
        from osmspark.spatial.pip import ray_cast_contains
        la = np.linspace(-60, 60, 100_000)
        lo = np.linspace(-170, 170, 100_000)
        hexgrid.k_ring(hexgrid.cell_id(la, lo, 7), 2)
        s2.cell_id(la, lo, 10)
        ray_cast_contains(la, lo, np.array([0.0, 0.0, 50.0, 50.0]),
                          np.array([0.0, 50.0, 50.0, 0.0]))
        for pdf in batches:
            yield pdf[:1]
    (spark.range(4 * n_threads, numPartitions=4 * n_threads)
     .mapInPandas(_warm, "id long").count())

    out = {"threads": n_threads}

    t0 = time.time(); n = points.count(); out["count_points"] = round(time.time() - t0, 2)
    out["n_points"] = n

    # --- hex encode alone
    t0 = time.time()
    with_hex_cell(points, 7).count()
    out["hex_encode_r7"] = round(time.time() - t0, 2)

    # --- kNN breakdown
    rng = np.random.default_rng(7)
    qpdf = pd.DataFrame({
        "q_id": np.arange(128),
        "lat": 51.5 + rng.normal(0, 0.03, 128),
        "lon": -0.12 + rng.normal(0, 0.03, 128)})
    queries_df = spark.createDataFrame(qpdf)

    from osmspark.grid import hexgrid
    from pyspark.sql import types as T

    for res, ring in ((7, 2), (9, 1)):
        pts = with_hex_cell(points, res, out="cell")

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def kring_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
            cells = hexgrid.cell_id(lat.to_numpy(), lon.to_numpy(), res)
            rings = hexgrid.k_ring(cells, ring)
            return pd.Series(list(rings))

        q_cells = queries_df.withColumn(
            "cell", F.explode(kring_udf(F.col("lat"), F.col("lon"))))
        t0 = time.time()
        n_cand = pts.join(F.broadcast(q_cells.select("q_id", "cell")), "cell").count()
        out[f"cand_count_r{res}k{ring}_bcast"] = round(time.time() - t0, 2)
        out[f"n_cand_r{res}k{ring}"] = n_cand

    t0 = time.time()
    knn_join(points, queries_df, 10, res=7, ring=2).count()
    out["knn_current"] = round(time.time() - t0, 2)

    # --- PIP breakdown
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

    from osmspark.spatial.pip import polygon_cover_cells
    cover = spark.createDataFrame(polygon_cover_cells(polys, 6))
    pts6 = with_hex_cell(points, 6, out="cell").localCheckpoint(eager=False)
    t0 = time.time()
    n_cand = pts6.join(F.broadcast(cover), "cell").count()
    out["pip_cand_count"] = round(time.time() - t0, 2)
    out["n_pip_cand"] = n_cand

    t0 = time.time()
    pip_join(points, polys, res=6).count()
    out["pip_current"] = round(time.time() - t0, 2)
    t0 = time.time()
    pip_join(points, polys, res=6).count()
    out["pip_current_2nd"] = round(time.time() - t0, 2)

    spark.stop()
    print("PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]))
