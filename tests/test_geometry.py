"""Way-geometry assembly against the reference's pinned golden values.

Expected coordinates are osm-read's own pinned node values
(test/pbfTest.js:116-130 and the node table in __spark_entry__'s
decode_nodes_golden oracle); way 27776903's ref walk is
pbfTest.js:189-197.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from osmspark.spatial import (
    assemble_way_geometries, with_way_centroid, with_way_length_deg)

# ref walk of golden way 27776903 → (lat, lon) per ref, all present
GOLDEN_WALK = [
    (51.507406, -0.1083348),   # 304994979
    (51.5074343, -0.1081264),  # 319408587
    (51.5074089, -0.1080108),  # 319408586
    (51.5074645, -0.1075735),  # 304994980
    (51.5074723, -0.1075014),  # 304994981
]


def _golden_tables(spark, golden_pbf):
    from osmspark.pbf.source import nodes_from_pages, ways_from_pages

    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["https://fixture.test/doc/0"],
                      "html": [golden_pbf]}))
    return ways_from_pages(pages), nodes_from_pages(pages)


def test_golden_way_assembles_in_ref_order(spark, golden_pbf):
    ways, nodes = _golden_tables(spark, golden_pbf)
    out = assemble_way_geometries(ways, nodes).collect()
    assert len(out) == 1
    row = out[0]
    assert row["way_id"] == 27776903
    assert row["n_refs"] == 5 and row["n_missing"] == 0
    assert row["lats"] == [p[0] for p in GOLDEN_WALK]
    assert row["lons"] == [p[1] for p in GOLDEN_WALK]


def test_missing_ref_counted_not_dropped_row(spark, golden_pbf):
    ways, nodes = _golden_tables(spark, golden_pbf)
    nodes2 = nodes.filter(F.col("id") != 319408586)  # drop walk position 2
    row = assemble_way_geometries(ways, nodes2).collect()[0]
    assert row["n_refs"] == 5 and row["n_missing"] == 1
    expect = [p for i, p in enumerate(GOLDEN_WALK) if i != 2]
    assert row["lats"] == [p[0] for p in expect]
    assert row["lons"] == [p[1] for p in expect]


def test_duplicate_refs_preserved_for_rings(spark):
    ways = spark.createDataFrame(
        pd.DataFrame({"id": [7], "node_refs": [[1, 2, 3, 1]]}))
    nodes = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2, 3], "lat": [0.0, 1.0, 1.0], "lon": [0.0, 0.0, 1.0]}))
    row = assemble_way_geometries(ways, nodes).collect()[0]
    assert row["lats"] == [0.0, 1.0, 1.0, 0.0]
    assert row["n_refs"] == 4 and row["n_missing"] == 0


def test_centroid_and_length_match_fold_order(spark, golden_pbf):
    ways, nodes = _golden_tables(spark, golden_pbf)
    geoms = with_way_length_deg(with_way_centroid(
        assemble_way_geometries(ways, nodes)))
    row = geoms.collect()[0]
    lats = [p[0] for p in GOLDEN_WALK]
    lons = [p[1] for p in GOLDEN_WALK]
    acc = 0.0
    for x in lats:
        acc += x
    assert row["centroid_lat"] == acc / 5  # same IEEE fold order
    exp_len = 0.0
    for (a0, o0), (a1, o1) in zip(GOLDEN_WALK, GOLDEN_WALK[1:]):
        exp_len += math.sqrt((a1 - a0) * (a1 - a0) + (o1 - o0) * (o1 - o0))
    assert row["length_deg"] == exp_len


def test_bucketed_way_join_no_exchange_and_exact(spark, tmp_path_factory):
    """The warehouse layout: write_way_join_bucketed + the bucketed
    assembly must (a) plan the refs×nodes join as a SortMergeJoin with
    ZERO Exchange — both sides read co-bucketed — and (b) return exactly
    the shuffle path's rows. Also pins that a FRESH catalog re-registers
    the same files (register_way_join_tables: bucket ids recovered from
    file names) without losing the shuffle-free plan."""
    from osmspark.spatial import (
        assemble_way_geometries,
        assemble_way_geometries_bucketed,
        register_way_join_tables,
        write_way_join_bucketed,
    )

    n = 2000
    nodes = spark.range(n).select(
        "id", (F.col("id") % 90 * 1.0).alias("lat"),
        (F.col("id") % 180 * 1.0).alias("lon"))
    ways = (nodes.groupBy(F.expr("id DIV 4").alias("id"))
            .agg(F.sort_array(F.collect_list("id")).alias("node_refs")))
    root = str(tmp_path_factory.mktemp("bkt"))
    write_way_join_bucketed(nodes, ways, root, n_buckets=8,
                            refs_table="t_refs", nodes_table="t_nodes")
    # fresh-catalog path: drop the catalog entries, re-register over files
    spark.sql("DROP TABLE t_refs")
    spark.sql("DROP TABLE t_nodes")
    register_way_join_tables(spark, root, 8, "t_refs", "t_nodes")

    confs = {"spark.sql.adaptive.enabled": "false",
             "spark.sql.autoBroadcastJoinThreshold": "-1"}
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = spark.table("t_refs").join(
            spark.table("t_nodes").withColumnRenamed("id", "ref"), "ref")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan

        def key(rows):
            return {(r["way_id"], tuple(r["lats"]), tuple(r["lons"]),
                     r["n_refs"], r["n_missing"]) for r in rows}

        got = key(assemble_way_geometries_bucketed(
            spark, "t_refs", "t_nodes").collect())
        want = key(assemble_way_geometries(ways, nodes).collect())
        assert got == want and len(want) == n // 4
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS t_refs")
        spark.sql("DROP TABLE IF EXISTS t_nodes")


def test_empty_and_null_refs_ways_surface(spark):
    """Degenerate ways (empty / null node_refs) must NOT vanish — the
    never-silently-dropped-rows contract (posexplode_outer, not inner)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("node_refs", T.ArrayType(T.LongType()))])
    ways = spark.createDataFrame(
        [(1, [10]), (2, []), (3, None)], schema)
    nodes = spark.createDataFrame(pd.DataFrame(
        {"id": [10], "lat": [5.0], "lon": [6.0]}))
    rows = {r["way_id"]: r
            for r in assemble_way_geometries(ways, nodes).collect()}
    assert set(rows) == {1, 2, 3}
    for wid in (2, 3):
        assert rows[wid]["lats"] == [] and rows[wid]["lons"] == []
        assert rows[wid]["n_refs"] == 0 and rows[wid]["n_missing"] == 0


def test_single_point_and_empty_ways(spark):
    ways = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "node_refs": [[10], [11, 12]]}))
    nodes = spark.createDataFrame(pd.DataFrame(
        {"id": [10], "lat": [5.0], "lon": [6.0]}))
    rows = {r["way_id"]: r for r in with_way_length_deg(with_way_centroid(
        assemble_way_geometries(ways, nodes))).collect()}
    assert rows[1]["length_deg"] == 0.0
    assert rows[1]["centroid_lat"] == 5.0
    assert rows[2]["n_missing"] == 2
    assert rows[2]["centroid_lat"] is None
    assert rows[2]["length_deg"] == 0.0
