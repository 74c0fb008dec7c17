"""Matrix experiment: hugeMethodLimit x levels-per-round for the S2 SQL
encode (VERDICT r2 item 1). Each cell = min-of-3 of encode+agg over the
1M-row bench nodes parquet, run in a FRESH SparkSession so JIT warm-up
is paid (and visible) per config.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

NODES = "/tmp/osmspark_bench/sf0.1_p512_n2000_nodes"


def fresh_spark(huge_limit):
    b = (SparkSession.builder.master("local[32]")
         .appName("s2matrix")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false"))
    if huge_limit:
        b = b.config("spark.sql.codegen.hugeMethodLimit", str(huge_limit))
    return b.getOrCreate()


def run(huge_limit, lpr):
    import osmspark.grid.s2_sql as s2sql
    s2sql._LEVELS_PER_ROUND = lpr
    spark = fresh_spark(huge_limit)
    spark.sparkContext.setLogLevel("ERROR")
    points = spark.read.parquet(NODES)
    points.count()
    ts = []
    for _ in range(4):
        t0 = time.time()
        s2sql.with_s2_cell_sql(points, 10).groupBy("cell").count().count()
        ts.append(round(time.time() - t0, 3))
    spark.stop()
    return ts


if __name__ == "__main__":
    for huge in [None, 8000]:
        for lpr in [3, 5, 6, 10]:
            ts = run(huge, lpr)
            print(f"huge={huge} lpr={lpr}: first={ts[0]} min_rest={min(ts[1:])} all={ts}",
                  flush=True)
