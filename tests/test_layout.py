"""Fixed-point point layout: lossless round-trip for OSM-decoded data."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osmspark.spatial import (
    read_points_fixedpoint, tile_counts, write_points_fixedpoint)


def _golden_nodes(spark, golden_pbf):
    from osmspark.pbf.source import nodes_from_pages

    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["http://x/golden"], "html": [golden_pbf]}))
    return nodes_from_pages(pages).select("id", "lat", "lon")


def test_fixedpoint_roundtrip_bit_exact_on_golden(spark, golden_pbf, tmp_path):
    """PBF-decoded coordinates are integer multiples of 1e-7° (the format
    stores nanodegree ints, granularity 100) — the int32 layout must give
    back the decoder's doubles BIT-exactly, division being correctly
    rounded."""
    nodes = _golden_nodes(spark, golden_pbf)
    path = str(tmp_path / "fp")
    write_points_fixedpoint(nodes, path)
    back = read_points_fixedpoint(spark, path)
    joined = (nodes.alias("a")
              .join(back.alias("b"), "id")
              .select(F.col("a.lat").alias("la"), F.col("b.lat").alias("lb"),
                      F.col("a.lon").alias("lo"), F.col("b.lon").alias("lob"))
              .toPandas())
    assert len(joined) == nodes.count()
    # bitwise equality, not approx: the layout claims losslessness
    assert (joined["la"].to_numpy() == joined["lb"].to_numpy()).all()
    assert (joined["lo"].to_numpy() == joined["lob"].to_numpy()).all()


def test_fixedpoint_many_nodes_bit_exact(spark, many_nodes_pbf, tmp_path):
    nodes = _golden_nodes(spark, many_nodes_pbf)
    path = str(tmp_path / "fp_many")
    write_points_fixedpoint(nodes, path)
    back = read_points_fixedpoint(spark, path)
    a = nodes.select("id", "lat", "lon").toPandas().set_index("id").sort_index()
    b = back.select("id", "lat", "lon").toPandas().set_index("id").sort_index()
    assert (a["lat"].to_numpy() == b["lat"].to_numpy()).all()
    assert (a["lon"].to_numpy() == b["lon"].to_numpy()).all()


def test_fixedpoint_schema_is_int32(spark, golden_pbf, tmp_path):
    nodes = _golden_nodes(spark, golden_pbf)
    path = str(tmp_path / "fp_schema")
    write_points_fixedpoint(nodes, path)
    raw = spark.read.parquet(path)
    dt = dict(raw.dtypes)
    assert dt["lat_q"] == "int" and dt["lon_q"] == "int"


def test_fixedpoint_clustered_same_rows_and_tiles(spark, tmp_path):
    """cluster_res reorders rows only — same multiset, identical hex-tile
    aggregation as the unclustered layout."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "id": np.arange(20_000),
        "lat": np.concatenate([51.5 + rng.normal(0, 0.05, 10_000),
                               48.85 + rng.normal(0, 0.05, 10_000)]),
        "lon": np.concatenate([-0.12 + rng.normal(0, 0.05, 10_000),
                               2.35 + rng.normal(0, 0.05, 10_000)])})
    pts = spark.createDataFrame(pdf)
    plain, clustered = str(tmp_path / "plain"), str(tmp_path / "clustered")
    write_points_fixedpoint(pts, plain)
    write_points_fixedpoint(pts, clustered, cluster_res=6, partitions=8)
    a = read_points_fixedpoint(spark, plain)
    b = read_points_fixedpoint(spark, clustered)
    ta = tile_counts(a, 7, grid="hex").toPandas().set_index("cell").sort_index()
    tb = tile_counts(b, 7, grid="hex").toPandas().set_index("cell").sort_index()
    assert (ta["n_points"].to_numpy() == tb["n_points"].to_numpy()).all()
    assert a.count() == b.count() == 20_000
