"""kring_smooth: focal sum vs a NumPy k_ring reimplementation, zero-count
neighbor emission, and the one-shuffle plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmspark.grid import hexgrid
from osmspark.spatial.tiles import kring_smooth, tile_counts


@pytest.fixture(scope="module")
def tiles(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"lat": rng.uniform(-3, 3, 3000),
                        "lon": rng.uniform(-3, 3, 3000)})
    return tile_counts(spark.createDataFrame(pdf), 6, grid="hex") \
        .select("cell", "n_points")


@pytest.mark.parametrize("ring", [1, 2])
def test_matches_numpy_focal_sum(tiles, ring):
    got = kring_smooth(tiles, ring=ring).toPandas()
    base = tiles.toPandas()
    counts = dict(zip(base["cell"], base["n_points"]))
    cells = base["cell"].to_numpy()
    # expected: for every cell in any tile's disk, sum counts over ITS disk
    disks = hexgrid.k_ring(cells, ring)
    targets = np.unique(disks.ravel())
    exp = {}
    t_disks = hexgrid.k_ring(targets, ring)
    for t, d in zip(targets.tolist(), t_disks.tolist()):
        v = sum(counts.get(c, 0) for c in d)
        exp[t] = v
    got_map = dict(zip(got["cell"], got["n_smooth"]))
    assert got_map == exp
    # a cell with zero own count but nonzero neighborhood is present
    zero_own = [t for t in exp if t not in counts]
    assert zero_own and all(t in got_map for t in zero_own)


def test_one_shuffle(tiles):
    plan = (kring_smooth(tiles)._jdf.queryExecution().executedPlan()
            .toString())
    # one Exchange for the focal re-aggregation (the fixture tile agg is
    # already materialized upstream of this plan's scan boundary)
    assert plan.count("Exchange") <= 2, plan
