"""Inspect the optimized plan / codegen of the S2 SQL encode."""
import os
import re
import sys

os.environ.setdefault("OSMSPARK_MASTER", "local[4]")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from osmspark.session import get_spark

spark = get_spark(app="profile-s2-plan", master=os.environ["OSMSPARK_MASTER"])
spark.sparkContext.setLogLevel("ERROR")

points = spark.read.parquet("/tmp/osmspark_bench/sf0.1_p512_n2000_nodes")

from osmspark.grid.s2_sql import with_s2_cell_sql

df = with_s2_cell_sql(points, 10).select("cell")
opt = df._jdf.queryExecution().optimizedPlan().toString()
print("optimized plan length:", len(opt))
print("element_at count in optimized plan:", opt.count("element_at"))
print("Project nodes:", opt.count("Project"))

code = df._jdf.queryExecution().debug().codegenToSeq()
print("num codegen subtrees:", code.size())
for i in range(code.size()):
    src = code.apply(i)._2()
    print(f"subtree {i}: {len(src)} chars, element_at-ish lookups:",
          src.count("getInt"))
spark.stop()
