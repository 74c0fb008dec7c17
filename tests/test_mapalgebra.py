"""raster_algebra: dict oracle with zero-fill union semantics and the
NULL conventions for ratio / normalized difference."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from osmspark.spatial.mapalgebra import raster_algebra
from osmspark.spatial.tiles import raster_tile_counts


@pytest.fixture(scope="module")
def layers(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    mk = lambda n, seed: pd.DataFrame({
        "lat": np.random.default_rng(seed).uniform(-40, 40, n),
        "lon": np.random.default_rng(seed).uniform(-40, 40, n)})
    a = raster_tile_counts(spark.createDataFrame(mk(3000, 1)), 5)
    b = raster_tile_counts(spark.createDataFrame(mk(2000, 2)), 5)
    return a, b


def test_matches_dict_oracle(layers):
    a, b = layers
    am = {(r.zoom, r.tile_x, r.tile_y): int(r.n_points)
          for r in a.toPandas().itertuples()}
    bm = {(r.zoom, r.tile_x, r.tile_y): int(r.n_points)
          for r in b.toPandas().itertuples()}
    got = raster_algebra(a, b).toPandas()
    assert len(got) == len(set(am) | set(bm))       # union of cells
    for r in got.itertuples():
        k = (r.zoom, r.tile_x, r.tile_y)
        na, nb = am.get(k, 0), bm.get(k, 0)
        assert (int(r.n_a), int(r.n_b)) == (na, nb)
        assert int(r.diff) == na - nb
        if nb == 0:
            assert r.ratio is None or math.isnan(r.ratio)
        else:
            assert r.ratio == na / nb
        if na + nb == 0:
            assert r.ndiff is None or math.isnan(r.ndiff)
        else:
            assert r.ndiff == (na - nb) / (na + nb)


def test_one_sided_cells_zero_filled(spark):
    a = spark.createDataFrame(pd.DataFrame(
        [{"zoom": 3, "tile_x": 1, "tile_y": 1, "n_points": 5}]))
    b = spark.createDataFrame(pd.DataFrame(
        [{"zoom": 3, "tile_x": 2, "tile_y": 2, "n_points": 7}]))
    got = raster_algebra(a, b).toPandas().sort_values("tile_x")
    assert got[["n_a", "n_b", "diff"]].values.tolist() == [[5, 0, 5],
                                                           [0, 7, -7]]
    # a-only cell: ratio NULL (n_b = 0); ndiff = 1.0
    assert got.iloc[0].ndiff == 1.0 and got.iloc[1].ndiff == -1.0
