"""Emerging-hot-spot classification over the space-time cube.

The DECISION layer on top of the cube pair this engine already ships —
``spacetime.gi_star_spacetime`` (WHERE is hot, per time bin) and
``trend.mann_kendall`` (is the cell's hotness TRENDING) — the
ESRI-popularized "Emerging Hot Spot Analysis" categories, reduced to
the deterministic subset computable without run-length structure:

    new / oscillating / intensifying / diminishing / persistent /
    sporadic / historical, each in hot and cold flavors, else
    no_pattern.

Every predicate is either an exact-integer census compare (the 90%
threshold is the integer test ``10·n_hot ≥ 9·n_bins`` — no float
fraction) or a comparison of floats both engines already produce
bit-identically (Gi* z and Mann-Kendall z, each rounded 9 dp at their
source), so the CASE cascade — evaluated in ONE fixed order, first
match wins — lands on the same class on any engine.

Bins whose Gi* z is undefined (full-coverage neighborhoods, C_i = 0)
are excluded from BOTH the census and the trend series — the same
observed-bins-only convention the statistics themselves use.

Scale shape: gi_star_spacetime's exploded-27-offset equi-join + one
per-cell census + Mann-Kendall's per-cell pair join (O(T²) in CALENDAR
length, not data volume) + one equi-join of the two O(cells) tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .spacetime import gi_star_spacetime
from .trend import mann_kendall

__all__ = ["emerging_hotspots"]


def emerging_hotspots(bins: DataFrame, z_crit: float = 1.96,
                      x_col: str = "n", cx_col: str = "cell_x",
                      cy_col: str = "cell_y",
                      t_col: str = "tbin") -> DataFrame:
    """(cell_x, cell_y, n_bins, n_hot, n_cold, last_z, mk_z, pattern)
    per cell of the (cell, time-bin, value) cube.

    ``n_hot``/``n_cold`` count bins with z ≥ +z_crit / ≤ −z_crit;
    ``last_z`` is the newest bin's Gi* z; ``mk_z`` the Mann-Kendall
    trend z over the cell's z series (NULL when the series is shorter
    than 2 or fully tied). Classes, first match wins:

    hot-ended cells (last_z ≥ z_crit):
      ``new_hot``           the last bin is the cell's ONLY hot bin
      ``oscillating_hot``   history also contains cold bins
      ``intensifying_hot``  ≥90% of bins hot and trend up
      ``diminishing_hot``   ≥90% of bins hot and trend down
      ``persistent_hot``    ≥90% of bins hot, no significant trend
      ``sporadic_hot``      hot now, patchy history, never cold
    cold mirrors for last_z ≤ −z_crit; then
      ``historical_hot`` / ``historical_cold``  a majority of bins
          hot (cold) but the latest bin is not
      ``no_pattern``        everything else
    """
    g = gi_star_spacetime(bins, x_col=x_col, cx_col=cx_col,
                          cy_col=cy_col, t_col=t_col)
    zs = (g.filter(F.col("gi_z").isNotNull())
          .select("cell_x", "cell_y", "tbin", "gi_z"))
    per = (zs.groupBy("cell_x", "cell_y")
           .agg(F.count(F.lit(1)).alias("n_bins"),
                F.sum((F.col("gi_z") >= F.lit(z_crit)).cast("long"))
                .alias("n_hot"),
                F.sum((F.col("gi_z") <= F.lit(-z_crit)).cast("long"))
                .alias("n_cold"),
                F.max(F.struct("tbin", "gi_z")).alias("_last")))
    per = per.select("cell_x", "cell_y", "n_bins", "n_hot", "n_cold",
                     F.col("_last.gi_z").alias("last_z"))
    mk = mann_kendall(zs, y_col="gi_z", t_col="tbin", y_type="double")
    j = per.join(mk.select("cell_x", "cell_y", "mk_z"),
                 ["cell_x", "cell_y"], "left")

    hot_last = F.col("last_z") >= F.lit(z_crit)
    cold_last = F.col("last_z") <= F.lit(-z_crit)
    up = F.col("mk_z").isNotNull() & (F.col("mk_z") >= F.lit(z_crit))
    down = F.col("mk_z").isNotNull() & (F.col("mk_z") <= F.lit(-z_crit))
    dense_hot = F.lit(10) * F.col("n_hot") >= F.lit(9) * F.col("n_bins")
    dense_cold = F.lit(10) * F.col("n_cold") >= F.lit(9) * F.col("n_bins")
    pattern = (
        F.when(hot_last & (F.col("n_hot") == 1), "new_hot")
        .when(hot_last & (F.col("n_cold") > 0), "oscillating_hot")
        .when(hot_last & dense_hot & up, "intensifying_hot")
        .when(hot_last & dense_hot & down, "diminishing_hot")
        .when(hot_last & dense_hot, "persistent_hot")
        .when(hot_last, "sporadic_hot")
        .when(cold_last & (F.col("n_cold") == 1), "new_cold")
        .when(cold_last & (F.col("n_hot") > 0), "oscillating_cold")
        .when(cold_last & dense_cold & down, "intensifying_cold")
        .when(cold_last & dense_cold & up, "diminishing_cold")
        .when(cold_last & dense_cold, "persistent_cold")
        .when(cold_last, "sporadic_cold")
        .when(F.lit(2) * F.col("n_hot") > F.col("n_bins"),
              "historical_hot")
        .when(F.lit(2) * F.col("n_cold") > F.col("n_bins"),
              "historical_cold")
        .otherwise("no_pattern"))
    return j.select("cell_x", "cell_y", "n_bins", "n_hot", "n_cold",
                    "last_z", "mk_z", pattern.alias("pattern"))
