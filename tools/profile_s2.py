"""Profile the pure-SQL S2 encode vs alternatives (VERDICT r2 item 1).

Times tile_counts(points, 10, grid=s2) variants over the bench nodes
parquet (~1M rows), min-of-N, and dumps codegen info for the SQL path.
"""
import os
import sys
import time

os.environ.setdefault("OSMSPARK_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from osmspark.session import get_spark

spark = get_spark(app="profile-s2", master=os.environ["OSMSPARK_MASTER"])
spark.sparkContext.setLogLevel("ERROR")

points = spark.read.parquet("/tmp/osmspark_bench/sf0.1_p512_n2000_nodes")
print("rows:", points.count())

from osmspark.grid.s2_sql import with_s2_cell_sql
from osmspark.spatial.tiles import _s2_udf


def timeit(name, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")


def sql_count():
    df = with_s2_cell_sql(points, 10)
    return df.groupBy("cell").count().count()


def udf_count():
    df = points.withColumn("cell", _s2_udf(10)(F.col("lat"), F.col("lon")))
    return df.groupBy("cell").count().count()


def sql_noagg():
    df = with_s2_cell_sql(points, 10)
    return df.select(F.max("cell")).collect()


def plain_scan():
    return points.select(F.sum("lat")).collect()


timeit("plain_scan_sum", plain_scan)
timeit("sql_encode+agg", sql_count)
timeit("sql_encode_sum_only", sql_noagg)
timeit("udf_encode+agg", udf_count)

# codegen inspection: is the encode inside WholeStageCodegen, and how big?
df = with_s2_cell_sql(points.limit(0), 10).select("cell")
code = df._jdf.queryExecution().debug().codegenToSeq()
print("num codegen subtrees:", code.size())
for i in range(code.size()):
    tup = code.apply(i)
    src = tup._2()
    print(f"--- subtree {i}: {len(src)} chars of generated code")
spark.stop()
