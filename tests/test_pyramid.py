"""tile_pyramid: per-zoom equality with single-zoom counts, partition
property, and the one-scan/one-shuffle plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmspark.spatial.tiles import raster_tile_counts, tile_pyramid


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"lat": rng.uniform(-88, 88, 4000),
                        "lon": rng.uniform(-180, 180, 4000)})
    return spark.createDataFrame(pdf)


def test_matches_single_zoom_counts(pts):
    pyr = tile_pyramid(pts, (4, 6, 8)).toPandas()
    for z in (4, 6, 8):
        exp = (raster_tile_counts(pts, z).toPandas()
               .sort_values(["tile_x", "tile_y"]).reset_index(drop=True))
        got = (pyr[pyr.zoom == z][["tile_x", "tile_y", "n_points"]]
               .sort_values(["tile_x", "tile_y"]).reset_index(drop=True))
        assert got.equals(exp[["tile_x", "tile_y", "n_points"]]), z


def test_each_zoom_partitions_the_points(pts):
    pyr = tile_pyramid(pts, (2, 5)).toPandas()
    n = pts.count()
    for z in (2, 5):
        assert pyr[pyr.zoom == z]["n_points"].sum() == n


def test_one_expand_one_exchange(pts):
    plan = (tile_pyramid(pts, (4, 6, 8))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange") == 1, plan
