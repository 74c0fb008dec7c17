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


def test_golden_relation_assembles_member_way(spark, golden_pbf):
    """Relation 56688's ordered members are the reference's own pinned
    values (test/xmlPbfTest.js:115-133: node 319408586 role '', way
    27776903 role ''); the assembled walk is the member way's ref walk."""
    from osmspark.pbf.source import (
        nodes_from_pages, relations_from_pages, ways_from_pages)
    from osmspark.spatial import assemble_relation_geometries

    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["https://fixture.test/doc/0"],
                      "html": [golden_pbf]}))
    out = assemble_relation_geometries(
        relations_from_pages(pages), ways_from_pages(pages),
        nodes_from_pages(pages)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["rel_id"] == 56688 and r["role"] == ""
    assert r["way_ids"] == [27776903]
    assert r["n_members"] == 2 and r["n_way_members"] == 1
    assert r["n_missing_ways"] == 0 and r["n_missing_nodes"] == 0
    assert r["lats"] == [p[0] for p in GOLDEN_WALK]
    assert r["lons"] == [p[1] for p in GOLDEN_WALK]
    assert r["ring_closed"] is False  # open service way, not a ring


def test_multipolygon_roles_stitching_missing_and_nodeonly(spark):
    """Synthetic multipolygon: the outer ring split across two ways
    stitches closed in member order; the inner role keeps its own row;
    a way member absent from the ways table is counted, not dropped;
    node members surface as an empty-walk row; a node-only relation
    still appears."""
    from pyspark.sql import types as T
    from osmspark.spatial import assemble_relation_geometries

    nodes = spark.createDataFrame(pd.DataFrame({
        "id": [10, 11, 12, 13, 20, 21, 22],
        "lat": [0.0, 0.0, 1.0, 1.0, 0.2, 0.2, 0.4],
        "lon": [0.0, 1.0, 1.0, 0.0, 0.2, 0.4, 0.3]}))
    ways = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3],
        "node_refs": [[10, 11, 12], [12, 13, 10], [20, 21, 22, 20]]}))
    member_t = T.ArrayType(T.StructType([
        T.StructField("ref", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("type", T.StringType())]))
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("members", member_t)])
    rels = spark.createDataFrame([
        (9, [("1", "outer", "way"), ("2", "outer", "way"),
             ("3", "inner", "way"), ("99", "inner", "way"),
             ("10", "", "node")]),
        (8, [("10", "", "node"), ("11", "", "node")]),
    ], schema)
    rows = {(r["rel_id"], r["role"]): r
            for r in assemble_relation_geometries(rels, ways, nodes).collect()}
    assert set(rows) == {(9, "outer"), (9, "inner"), (9, ""), (8, "")}

    outer = rows[(9, "outer")]
    assert outer["way_ids"] == [1, 2]
    assert outer["lats"] == [0.0, 0.0, 1.0, 1.0, 1.0, 0.0]  # w1 then w2
    assert outer["ring_closed"] is True  # walk returns to (0, 0)
    assert outer["n_way_members"] == 2 and outer["n_missing_ways"] == 0

    inner = rows[(9, "inner")]
    assert inner["way_ids"] == [3, 99]
    assert inner["n_missing_ways"] == 1  # way 99 absent, counted
    assert inner["ring_closed"] is True  # w3 alone closes; 99 adds nothing
    assert len(inner["lats"]) == 4

    assert rows[(9, "")]["n_way_members"] == 0
    assert rows[(9, "")]["lats"] == [] and rows[(9, "")]["ring_closed"] is False
    assert rows[(8, "")]["n_members"] == 2  # node-only relation surfaces


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


def test_relation_assembly_over_bucketed_way_geoms(spark, tmp_path_factory):
    """The docstring's scale shape: build way geometries ONCE from the
    co-bucketed layout and feed them to relation assembly via way_geoms=
    — results identical to the direct relations→ways→nodes path."""
    from pyspark.sql import types as T
    from osmspark.spatial import (
        assemble_relation_geometries,
        assemble_way_geometries_bucketed,
        write_way_join_bucketed,
    )

    nodes = spark.range(400).select(
        "id", (F.col("id") % 90 * 1.0).alias("lat"),
        (F.col("id") % 180 * 1.0).alias("lon"))
    ways = (nodes.groupBy(F.expr("id DIV 4").alias("id"))
            .agg(F.sort_array(F.collect_list("id")).alias("node_refs")))
    member_t = T.ArrayType(T.StructType([
        T.StructField("ref", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("type", T.StringType())]))
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("members", member_t)])
    rels = spark.createDataFrame(
        [(1, [(str(w), "outer", "way") for w in (3, 4, 5)]),
         (2, [("7", "inner", "way"), ("999", "outer", "way")])], schema)
    root = str(tmp_path_factory.mktemp("rel_bkt"))
    write_way_join_bucketed(nodes, ways, root, n_buckets=4,
                            refs_table="r_refs", nodes_table="r_nodes")
    try:
        def key(rows):
            return {(r["rel_id"], r["role"], tuple(r["way_ids"]),
                     tuple(r["lats"]), r["n_missing_ways"]) for r in rows}
        via_bucketed = key(assemble_relation_geometries(
            rels, way_geoms=assemble_way_geometries_bucketed(
                spark, "r_refs", "r_nodes")).collect())
        direct = key(assemble_relation_geometries(
            rels, ways, nodes).collect())
        assert via_bucketed == direct and len(direct) == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS r_refs")
        spark.sql("DROP TABLE IF EXISTS r_nodes")


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


def test_way_length_m_matches_independent_haversine(spark):
    """Floored-meter haversine sum vs an independent NumPy haversine
    (different op order / no floor): must agree within n_segments
    meters — the floor's worst case — on a varied global walk."""
    import numpy as np
    from osmspark.spatial import EARTH_RADIUS_M, with_way_length_m

    lats = [51.5074, 48.8566, -33.8688, 35.6895, 64.1466, -54.8019]
    lons = [-0.1278, 2.3522, 151.2093, 139.6917, -21.9426, -68.3030]
    geoms = spark.createDataFrame(
        pd.DataFrame({"way_id": [1], "lats": [lats], "lons": [lons]}))
    got = with_way_length_m(geoms).collect()[0]["length_m"]

    la, lo = np.radians(np.array(lats)), np.radians(np.array(lons))
    h = (np.sin(np.diff(la) / 2) ** 2
         + np.cos(la[:-1]) * np.cos(la[1:]) * np.sin(np.diff(lo) / 2) ** 2)
    expect = float(np.sum(2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))))
    assert expect > 3.0e7  # a real multi-continent walk, not a degenerate 0
    assert abs(got - expect) <= len(lats) - 1


def test_ring_area_square_winding_and_closure(spark):
    """Shoelace: unit square = ±1 deg² by winding; explicit closure
    (repeating vertex 0) must not change the area (the wrap edge is
    implicit); < 3 points has no area (null)."""
    from osmspark.spatial import with_ring_area

    sq_lats, sq_lons = [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]
    rows = spark.createDataFrame(pd.DataFrame({
        "way_id": [1, 2, 3, 4],
        "lats": [sq_lats, sq_lats[::-1], sq_lats + sq_lats[:1], [0.0, 1.0]],
        "lons": [sq_lons, sq_lons[::-1], sq_lons + sq_lons[:1], [0.0, 1.0]],
    }))
    out = {r["way_id"]: r["ring_area_deg2"]
           for r in with_ring_area(rows).collect()}
    assert out[1] == 1.0       # counter-clockwise in (lon, lat)
    assert out[2] == -1.0      # reversed walk flips the sign
    assert out[3] == 1.0       # explicitly closed ring, same area
    assert out[4] is None      # a segment encloses nothing
