"""geohash_sql: parity with a from-scratch bisection reference encoder,
the canonical published example, and boundary clamps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmspark.grid.geohash_sql import geohash_col, geohash_counts

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic interval-bisection geohash (independent of the SQL path)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            bits.append(lon >= mid)
            lon_lo, lon_hi = (mid, lon_hi) if lon >= mid else (lon_lo, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            bits.append(lat >= mid)
            lat_lo, lat_hi = (mid, lat_hi) if lat >= mid else (lat_lo, mid)
        even = not even
    out = []
    for i in range(precision):
        g = 0
        for b in bits[i * 5:(i + 1) * 5]:
            g = (g << 1) | int(b)
        out.append(_B32[g])
    return "".join(out)


@pytest.mark.parametrize("precision", [1, 5, 7, 12])
def test_matches_bisection_reference(spark, precision):
    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({"lat": rng.uniform(-89.9, 89.9, 300),
                        "lon": rng.uniform(-179.9, 179.9, 300)})
    got = (spark.createDataFrame(pdf)
           .select(geohash_col(F.col("lat"), F.col("lon"), precision)
                   .alias("gh")).toPandas()["gh"])
    exp = [_ref_geohash(la, lo, precision)
           for la, lo in zip(pdf["lat"], pdf["lon"])]
    assert got.tolist() == exp


def test_published_example(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"lat": [57.64911], "lon": [10.40744]}))
    got = df.select(geohash_col(F.col("lat"), F.col("lon"), 11)
                    .alias("gh")).collect()[0].gh
    assert got == "u4pruydqqvj"  # the canonical wikipedia example


def test_boundary_clamps(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"lat": [90.0, -90.0], "lon": [180.0, -180.0]}))
    out = df.select(geohash_col(F.col("lat"), F.col("lon"), 4)
                    .alias("gh")).toPandas()["gh"]
    assert out[0] == _ref_geohash(89.999999999, 179.999999999, 4)
    assert out[1] == _ref_geohash(-90.0, -180.0, 4)


def test_counts_partition_points(spark):
    rng = np.random.default_rng(14)
    pdf = pd.DataFrame({"lat": rng.uniform(-80, 80, 2000),
                        "lon": rng.uniform(-170, 170, 2000)})
    out = geohash_counts(spark.createDataFrame(pdf), 3).toPandas()
    assert out["n_points"].sum() == 2000
    assert (out["geohash"].str.len() == 3).all()
