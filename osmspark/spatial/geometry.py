"""Way-geometry assembly: the canonical OSM ways×nodes join.

The reference hands its consumer ways as ``{id, nodeRefs: [...]}`` and
nodes as ``{id, lat, lon}`` (osm-read lib/pbfParser.js:502-540 way
projection; README's way callback) and leaves joining refs to coordinates
entirely to the caller — every real OSM consumer then does exactly that
join. This module provides it natively as a DataFrame plan:

    posexplode(node_refs) → shuffle equi-join on node id → groupBy(way)
    → array_sort by ref position → coordinate arrays.

Scale notes: the refs→nodes join is the single biggest shuffle in any
planet-scale OSM pipeline (planet: ~9×10^8 ways averaging ~9 refs vs
~8×10^9 nodes). It shuffles both sides on node id — co-locate by
bucketing/sorting both decoded tables on id at write time to make it a
shuffle-free sort-merge join (that layout is built by
:func:`write_way_join_bucketed` and consumed by
:func:`assemble_way_geometries_bucketed`; the absent Exchange is pinned
by tests/test_geometry.py); the aggregation shuffles (way_id, pos, lat,
lon) — 20 bytes/ref with map-side combine. Nothing ever collects to the
driver; missing refs (nodes filtered out upstream, or absent from the
extract — common with bbox-clipped extracts) are counted per way, never
silently dropped rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["assemble_way_geometries", "assemble_way_geometries_bucketed",
           "assemble_from_exploded_refs", "assemble_relation_geometries",
           "explode_way_refs", "explode_relation_members",
           "write_way_join_bucketed", "register_way_join_tables",
           "with_way_centroid", "with_way_length_deg",
           "with_way_length_m", "with_ring_area"]


def assemble_way_geometries(ways: DataFrame, nodes: DataFrame,
                            way_id: str = "id",
                            refs_col: str = "node_refs",
                            node_id: str = "id") -> DataFrame:
    """(way_id, lats, lons, n_refs, n_missing) with points in ref order.

    A ref whose node is absent is dropped from the polyline and counted
    in ``n_missing`` so downstream can filter incomplete geometries
    (``n_missing = 0`` ⇒ the polyline is exactly the way's ref walk).
    Duplicate refs (closed rings repeat their first node) are preserved:
    the join fans out per occurrence and position sorting restores the
    walk order. Degenerate ways (empty or null ``refs_col``) surface as
    (way_id, [], [], 0, 0) rows — ``posexplode_outer`` keeps them, per
    the module's never-silently-dropped-rows contract.
    """
    return assemble_from_exploded_refs(
        explode_way_refs(ways, way_id, refs_col), nodes, node_id)


def explode_way_refs(ways: DataFrame, way_id: str = "id",
                     refs_col: str = "node_refs") -> DataFrame:
    """(way_id, n_refs, pos, ref) — the storable exploded-refs shape.

    At warehouse scale this IS the layout to persist: bucketed by ``ref``
    against a node table bucketed by id, the refs×nodes join needs no
    shuffle (see :func:`write_way_join_bucketed`). Degenerate ways keep
    one (pos=null, ref=null) row (``posexplode_outer``)."""
    n_refs = F.greatest(F.coalesce(F.size(refs_col), F.lit(0)), F.lit(0))
    return ways.select(F.col(way_id).alias("way_id"),
                       n_refs.alias("n_refs"),
                       F.posexplode_outer(refs_col).alias("pos", "ref"))


def assemble_from_exploded_refs(refs: DataFrame, nodes: DataFrame,
                                node_id: str = "id") -> DataFrame:
    """Assembly over a pre-exploded refs table (way_id, n_refs, pos, ref):
    the shared tail of the shuffle and bucketed paths."""
    nd = nodes.select(F.col(node_id).alias("ref"), "lat", "lon")
    joined = refs.join(nd, "ref", "left")
    # collect_list drops nulls: missing refs vanish from pts but stay in
    # n_refs; array_sort on struct orders by the leading pos field
    pts = F.array_sort(F.collect_list(
        F.when(F.col("lat").isNotNull(),
               F.struct(F.col("pos"), F.col("lat"), F.col("lon")))))
    return (joined.groupBy("way_id", "n_refs")
            .agg(pts.alias("pts"))
            .select("way_id",
                    F.transform("pts", lambda p: p["lat"]).alias("lats"),
                    F.transform("pts", lambda p: p["lon"]).alias("lons"),
                    "n_refs",
                    (F.col("n_refs") - F.size("pts")).alias("n_missing")))


_REFS_DDL = "way_id BIGINT, n_refs INT, pos INT, ref BIGINT"
_NODES_DDL = "id BIGINT, lat DOUBLE, lon DOUBLE"


def write_way_join_bucketed(nodes: DataFrame, ways: DataFrame, path: str,
                            n_buckets: int = 128,
                            refs_table: str = "osm_way_refs",
                            nodes_table: str = "osm_nodes_bkt",
                            way_id: str = "id", refs_col: str = "node_refs",
                            node_id: str = "id") -> None:
    """Bucket+sort BOTH sides of the refs×nodes join on node id — the
    planet-scale layout the module docstring prescribes.

    Writes two external bucketed parquet tables under ``path`` (one file
    per bucket: the repartition keys each bucket to one task, so the
    read-back scan satisfies the sort spec without re-sorting) and
    registers them in the session catalog. Reading them back through
    :func:`assemble_way_geometries_bucketed` plans the join as a
    SortMergeJoin over the two bucketed scans with NO Exchange on either
    side — at planet scale that deletes the 8×10^9-row node shuffle from
    every geometry build. Pick ``n_buckets`` so a bucket is O(1 GB)
    (buckets = read tasks for the join)."""
    spark = nodes.sparkSession
    refs = explode_way_refs(ways, way_id, refs_col).select(
        F.col("way_id").cast("long"), F.col("n_refs").cast("int"),
        F.col("pos").cast("int"), F.col("ref").cast("long"))
    nd = nodes.select(F.col(node_id).cast("long").alias("id"),
                      F.col("lat").cast("double"),
                      F.col("lon").cast("double"))
    for name, df, col in ((refs_table, refs, "ref"), (nodes_table, nd, "id")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.repartition(n_buckets, F.col(col))
         .write.mode("overwrite")
         .bucketBy(n_buckets, col).sortBy(col)
         .option("path", os.path.join(path, name))
         .saveAsTable(name))


def register_way_join_tables(spark: SparkSession, path: str,
                             n_buckets: int = 128,
                             refs_table: str = "osm_way_refs",
                             nodes_table: str = "osm_nodes_bkt") -> None:
    """Re-register existing bucketed files in a FRESH session's catalog
    (the in-memory catalog dies with the session; bucket ids are
    recovered from the file names, so external DDL over the same
    CLUSTERED BY spec reads the layout back intact)."""
    for name, ddl, col in ((refs_table, _REFS_DDL, "ref"),
                           (nodes_table, _NODES_DDL, "id")):
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({col}) SORTED BY ({col}) INTO {n_buckets} "
            f"BUCKETS LOCATION '{os.path.join(path, name)}'")


def assemble_way_geometries_bucketed(spark: SparkSession,
                                     refs_table: str = "osm_way_refs",
                                     nodes_table: str = "osm_nodes_bkt"
                                     ) -> DataFrame:
    """Way-geometry assembly over the co-bucketed layout: the refs×nodes
    join reads bucket i of each table in the same task — no Exchange, no
    sort (both sides stored sorted by the key). Only the final
    (way_id)-keyed aggregation shuffles, and that side is 20 bytes/ref."""
    return assemble_from_exploded_refs(spark.table(refs_table),
                                       spark.table(nodes_table))


def explode_relation_members(relations: DataFrame, rel_id: str = "id",
                             members_col: str = "members") -> DataFrame:
    """(rel_id, n_members, mpos, role, m_type, w_ref) — ordered members.

    The reference decodes relation members as an ordered array of
    {ref, role, type} (osm-read lib/pbfParser.js:486-531: delta-decoded
    memids, string-table roles, enum types) and stops there; this is the
    exploded shape its consumers must build. ``w_ref`` is the member ref
    cast to long ONLY for way members (null otherwise), so the
    downstream way-geometry join key never matches a node/relation ref.
    Degenerate relations (empty/null members) keep one null-member row
    (``posexplode_outer`` — never-silently-dropped contract)."""
    n = F.greatest(F.coalesce(F.size(members_col), F.lit(0)), F.lit(0))
    mem = relations.select(F.col(rel_id).alias("rel_id"),
                           n.alias("n_members"),
                           F.posexplode_outer(members_col).alias("mpos", "m"))
    return mem.select(
        "rel_id", "n_members", "mpos",
        F.col("m.role").alias("role"),
        F.col("m.type").alias("m_type"),
        F.when(F.col("m.type") == "way",
               F.col("m.ref").cast("long")).alias("w_ref"))


def assemble_relation_geometries(relations: DataFrame,
                                 ways: DataFrame | None = None,
                                 nodes: DataFrame | None = None,
                                 rel_id: str = "id",
                                 members_col: str = "members",
                                 way_id: str = "id",
                                 refs_col: str = "node_refs",
                                 node_id: str = "id",
                                 way_geoms: DataFrame | None = None
                                 ) -> DataFrame:
    """Relation (multipolygon/route) assembly: the two-level
    relations→ways→nodes join the reference leaves entirely to callers.

    One output row per (relation, role): member-way polylines
    concatenated in member order (a multipolygon's outer and inner rings
    arrive as separate rows keyed by their role), plus never-drop
    accounting — ``n_members`` (whole relation, all types),
    ``n_way_members``/``n_missing_ways`` (way members in this role /
    those absent from the ways table), ``n_missing_nodes`` (refs dropped
    inside member ways), and ``ring_closed`` (the concatenated walk
    returns to its first vertex — true for multipolygon rings whose
    member ways are stored in walk order; torn or partial rings read
    false). Node-only relations and empty-member relations still surface
    with an empty walk.

    Scale shape: the member table is tiny next to the way table (planet:
    ~10^7 relations × ~10 members vs ~9×10^8 ways), so the expensive
    input is ``way_geoms`` — pass the output of
    :func:`assemble_way_geometries_bucketed` (built once from the
    co-bucketed layout) and this function adds only a member-keyed join
    plus a (rel_id, role) agg over ≤ |members| rows.
    """
    mem = explode_relation_members(relations, rel_id, members_col)
    if way_geoms is None:
        way_geoms = assemble_way_geometries(ways, nodes, way_id,
                                            refs_col, node_id)
    wg = way_geoms.select(F.col("way_id").alias("w_ref"),
                          "lats", "lons", "n_missing")
    j = mem.join(wg, "w_ref", "left")
    empty_d = F.array().cast("array<double>")
    seg = F.when(F.col("m_type") == "way",
                 F.struct(F.col("mpos"),
                          F.col("w_ref"),
                          F.coalesce(F.col("lats"), empty_d).alias("lats"),
                          F.coalesce(F.col("lons"), empty_d).alias("lons")))
    is_way = (F.col("m_type") == "way").cast("int")
    grouped = (j.groupBy("rel_id",
                         F.coalesce(F.col("role"), F.lit("")).alias("role"))
               .agg(F.array_sort(F.collect_list(seg)).alias("segs"),
                    F.first("n_members").alias("n_members"),
                    F.sum(is_way).alias("n_way_members"),
                    F.sum(((F.col("m_type") == "way")
                           & F.col("lats").isNull()).cast("int"))
                    .alias("n_missing_ways"),
                    F.sum(F.when(F.col("m_type") == "way",
                                 F.coalesce(F.col("n_missing"), F.lit(0)))
                          .otherwise(0)).alias("n_missing_nodes")))
    walk_lats = F.flatten(F.transform("segs", lambda s: s["lats"]))
    walk_lons = F.flatten(F.transform("segs", lambda s: s["lons"]))
    out = grouped.select(
        "rel_id", "role",
        F.transform("segs", lambda s: s["w_ref"]).alias("way_ids"),
        walk_lats.alias("lats"), walk_lons.alias("lons"),
        "n_members", "n_way_members", "n_missing_ways", "n_missing_nodes")
    n_pts = F.size("lats")
    ring_closed = F.when(
        n_pts >= 3,
        (F.element_at("lats", 1) == F.element_at("lats", -1))
        & (F.element_at("lons", 1) == F.element_at("lons", -1))
    ).otherwise(F.lit(False))
    return out.withColumn("ring_closed", ring_closed)


def _fold_sum(arr):
    # left fold, same IEEE order as a sequential sum — keep this shape in
    # oracles (((0+x0)+x1)+…)
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def with_way_centroid(geoms: DataFrame, out_lat: str = "centroid_lat",
                      out_lon: str = "centroid_lon") -> DataFrame:
    """Vertex-mean centroid (null for fully-missing geometries)."""
    n = F.size("lats")
    return (geoms
            .withColumn(out_lat, F.when(n > 0, _fold_sum(F.col("lats")) / n))
            .withColumn(out_lon, F.when(n > 0, _fold_sum(F.col("lons")) / n)))


def with_way_length_deg(geoms: DataFrame,
                        out: str = "length_deg") -> DataFrame:
    """Planar polyline length in degrees (0.0 for < 2 points).

    Pure array expressions — no Python worker: consecutive deltas via
    zip_with over the drop-last/drop-first slices, then a segment-norm
    fold. (Degrees, not meters, on purpose: the engine's distance
    conventions are planar-degree throughout — see knn._dist2.)
    """
    def seg_len(col_lat, col_lon):
        m = F.greatest(F.size(col_lat) - 1, F.lit(0))
        d_lat = F.zip_with(F.slice(col_lat, 1, m), F.slice(col_lat, 2, m),
                           lambda a, b: b - a)
        d_lon = F.zip_with(F.slice(col_lon, 1, m), F.slice(col_lon, 2, m),
                           lambda a, b: b - a)
        segs = F.zip_with(d_lat, d_lon,
                          lambda x, y: F.sqrt(x * x + y * y))
        return _fold_sum(segs)

    return geoms.withColumn(out, seg_len(F.col("lats"), F.col("lons")))


#: IUGG mean Earth radius — the conventional haversine sphere.
EARTH_RADIUS_M = 6371008.8

_DEG2RAD = 3.141592653589793 / 180.0  # closest double to pi, then /180


def with_way_length_m(geoms: DataFrame, out: str = "length_m",
                      radius_m: float = EARTH_RADIUS_M) -> DataFrame:
    """Great-circle (haversine) polyline length in METERS (0.0 for < 2
    points) — the geodesic companion to :func:`with_way_length_deg`.

    Pure array expressions in whole-stage codegen, no Python worker.
    Each segment is the textbook haversine
    ``2·R·asin(sqrt(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))``; per-segment
    lengths are FLOORED TO WHOLE METERS and summed as int64, so the sum
    is order-insensitive and exact (a bigint add), and a last-ulp
    difference between the JVM's and another engine's sin/cos/asin
    cannot flip the result unless a segment lands within one ulp of a
    meter boundary (probability ~1e-9 per segment; the DuckDB oracle
    relies on this — same rationale as the S2 oracle's boundary note).
    Meter granularity per segment is far below the haversine model error
    itself (the sphere-vs-ellipsoid gap is ~0.3%).
    """
    def hav(col_lat, col_lon):
        m = F.greatest(F.size(col_lat) - 1, F.lit(0))
        la1 = F.transform(F.slice(col_lat, 1, m), lambda x: x * _DEG2RAD)
        la2 = F.transform(F.slice(col_lat, 2, m), lambda x: x * _DEG2RAD)
        lo1 = F.transform(F.slice(col_lon, 1, m), lambda x: x * _DEG2RAD)
        lo2 = F.transform(F.slice(col_lon, 2, m), lambda x: x * _DEG2RAD)
        sin_dla = F.zip_with(la1, la2, lambda a, b: F.sin((b - a) / 2))
        sin_dlo = F.zip_with(lo1, lo2, lambda a, b: F.sin((b - a) / 2))
        cos_prod = F.zip_with(la1, la2,
                              lambda a, b: F.cos(a) * F.cos(b))
        terms = F.zip_with(
            F.zip_with(sin_dla, cos_prod, lambda s, c: F.struct(
                (s * s).alias("s2"), c.alias("c"))),
            sin_dlo,
            lambda sc, s: sc["s2"] + sc["c"] * (s * s))
        metres = F.transform(
            terms, lambda t: F.floor(
                F.lit(2.0 * radius_m) * F.asin(F.sqrt(t))).cast("long"))
        return F.aggregate(metres, F.lit(0).cast("long"),
                           lambda acc, x: acc + x)

    return geoms.withColumn(out, hav(F.col("lats"), F.col("lons")))


def with_ring_area(geoms: DataFrame, out: str = "ring_area_deg2"
                   ) -> DataFrame:
    """Signed shoelace area of the (lon, lat) ring in square degrees.

    The ring is implicitly closed (the wrap-around edge last→first is
    included), so it gives the enclosed area whether or not the walk
    repeats its first vertex; positive = counter-clockwise in (lon, lat)
    axes — the sign distinguishes multipolygon outer/inner winding.
    Null for < 3 points (no area). Every term is multiply/subtract on
    the input doubles — IEEE-exact in any engine — and the fold is the
    same sequential left fold as :func:`with_way_length_deg`'s, so an
    oracle reproduces it bit-for-bit with an ordered left fold.
    """
    n = F.size("lats")
    # x = lon, y = lat; rotate by 1 with wrap for the "next" vertex
    nxt = lambda col: F.concat(
        F.slice(col, 2, F.greatest(F.size(col) - 1, F.lit(0))),
        F.slice(col, 1, 1))
    cross = F.zip_with(
        F.zip_with(F.col("lons"), F.col("lats"),
                   lambda x, y: F.struct(x.alias("x"), y.alias("y"))),
        F.zip_with(nxt(F.col("lons")), nxt(F.col("lats")),
                   lambda x, y: F.struct(x.alias("x"), y.alias("y"))),
        lambda a, b: a["x"] * b["y"] - b["x"] * a["y"])
    signed = F.aggregate(cross, F.lit(0.0), lambda acc, t: acc + t) / 2.0
    return geoms.withColumn(out, F.when(n >= 3, signed))
