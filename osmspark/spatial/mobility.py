"""Per-user mobility metrics over trajectory point tables.

The three summary statistics every human-mobility study computes from
raw fixes (González et al. 2008's r_g; OD matrices; visit diversity) —
downstream of the decode surface the reference provides
(`lib/pbfParser.js` emits entity rows only; these consume them).

Exactness discipline (the repo-wide rule): every SUM that crosses a
shuffle is an exact integer/decimal — float sums are order-dependent
and therefore not engine-reproducible — and each result holds at most
ONE final float division/sqrt of identical exact operands, rounded to
9 dp. Coordinates enter as 1e-6° fixed-point integers via round(x·10⁶)
(identical HALF-AWAY-FROM-ZERO semantics in Spark and DuckDB on
identical IEEE inputs).

Scale shape: all three are single combinable aggregations keyed by the
user/trip id (one shuffle; skew bounded by the busiest device, the
standard mobility-table shape AQE handles). No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["radius_of_gyration", "od_matrix", "location_diversity"]


def _udeg(c: F.Column) -> F.Column:
    """1e-6° fixed-point integer coordinate (exact on both engines:
    round-half-away on identical doubles)."""
    return F.round(c * F.lit(1000000.0), 0).cast("long")


def radius_of_gyration(points: DataFrame, user_col: str = "trip_id",
                       lat_col: str = "lat",
                       lon_col: str = "lon") -> DataFrame:
    """Equirectangular radius of gyration per user, in DEGREES:

        r_g² = (1/n) Σ_i ‖p_i − p̄‖²
             = (n·Σ‖p‖² − ‖Σp‖²) / n²          (variance identity)

    The numerator is computed entirely in exact integer µdeg² via the
    N-scaled moment form — n·(Qx+Qy) − Sx² − Sy² with Q the
    decimal(38,0) coordinate-square sums — so the only float ops are
    the final sqrt and division:  r_g = √num / (n·10⁶).

    Planar-degree convention (not great-circle meters): r_g is a
    dispersion statistic, and the equirectangular quadratic keeps the
    whole reduction exact; callers needing meters scale by
    111,195·cos(lat̄) downstream. Output: (user, n_points, rg_deg).
    """
    ux, uy = _udeg(F.col(lat_col)), _udeg(F.col(lon_col))
    g = (points
         .select(F.col(user_col).alias("user"),
                 ux.alias("ux"), uy.alias("uy"))
         .groupBy("user")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("ux").alias("sx"),
              F.sum("uy").alias("sy"),
              F.sum(F.col("ux").cast("decimal(38,0)")
                    * F.col("ux").cast("decimal(38,0)")
                    + F.col("uy").cast("decimal(38,0)")
                    * F.col("uy").cast("decimal(38,0)")).alias("q")))
    num = (F.col("n").cast("decimal(38,0)") * F.col("q")
           - F.col("sx").cast("decimal(38,0)")
           * F.col("sx").cast("decimal(38,0)")
           - F.col("sy").cast("decimal(38,0)")
           * F.col("sy").cast("decimal(38,0)"))
    rg = (F.sqrt(num.cast("double"))
          / (F.col("n").cast("double") * F.lit(1000000.0)))
    return g.select(F.col("user"),
                    F.col("n").alias("n_points"),
                    F.round(rg, 9).alias("rg_deg"))


def od_matrix(points: DataFrame, cell_deg: float = 0.5,
              user_col: str = "trip_id", ts_col: str = "ts_us",
              id_col: str = "id", lat_col: str = "lat",
              lon_col: str = "lon") -> DataFrame:
    """Origin→destination flow matrix: each trip contributes one flow
    from its FIRST fix's cell to its LAST fix's cell (ties on the
    timestamp broken by the point id — a total order, so the endpoint
    choice is deterministic on any engine), then flows aggregate per
    (origin cell, destination cell).

    Both reductions are min/max of a lexicographic struct — combinable,
    order-insensitive, exact — so the whole operator is two shuffles
    (trip endpoints, then cell-pair counts) with integer-only state.
    Output: (o_cx, o_cy, d_cx, d_cy, n_trips).
    """
    inv = F.lit(1.0 / cell_deg)
    pt = F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("pid"),
                  F.floor(F.col(lon_col) * inv).cast("long").alias("cx"),
                  F.floor(F.col(lat_col) * inv).cast("long").alias("cy"))
    ends = (points.groupBy(F.col(user_col).alias("trip"))
            .agg(F.min(pt).alias("o"), F.max(pt).alias("d")))
    return (ends.groupBy(F.col("o.cx").alias("o_cx"),
                         F.col("o.cy").alias("o_cy"),
                         F.col("d.cx").alias("d_cx"),
                         F.col("d.cy").alias("d_cy"))
            .agg(F.count(F.lit(1)).alias("n_trips")))


def location_diversity(points: DataFrame, cell_deg: float = 0.5,
                       user_col: str = "trip_id", lat_col: str = "lat",
                       lon_col: str = "lon") -> DataFrame:
    """Per-user visit-location diversity over ``cell_deg`` grid cells.

    Shannon entropy is the textbook statistic but its Σ c·ln(c) float
    sum is order-dependent across partitions — not engine-exact — so
    this computes the Gini–Simpson index instead (the standard
    alternative, 1 − Σ(c_i/n)², the probability two random fixes fall
    in different cells):

        simpson_div = 1 − Σc_i² / n²      (exact ints, ONE division)

    plus ``top_share`` = max c_i / n (the predictability proxy) and the
    distinct-cell count. Two stacked combinable aggregations on the
    (user, cell) then user key; every cross-engine value is an integer
    until the two final divisions, rounded to 9 dp.
    Output: (user, n_points, n_cells, top_share, simpson_div).
    """
    inv = F.lit(1.0 / cell_deg)
    per_cell = (points
                .groupBy(F.col(user_col).alias("user"),
                         F.floor(F.col(lon_col) * inv).cast("long")
                         .alias("cx"),
                         F.floor(F.col(lat_col) * inv).cast("long")
                         .alias("cy"))
                .agg(F.count(F.lit(1)).alias("c")))
    g = (per_cell.groupBy("user")
         .agg(F.sum("c").alias("n"),
              F.count(F.lit(1)).alias("n_cells"),
              F.max("c").alias("cmax"),
              F.sum(F.col("c").cast("decimal(38,0)")
                    * F.col("c").cast("decimal(38,0)")).alias("q")))
    n_d = F.col("n").cast("double")
    simpson = F.lit(1.0) - (F.col("q").cast("double") / (n_d * n_d))
    return g.select(F.col("user"),
                    F.col("n").alias("n_points"),
                    F.col("n_cells"),
                    F.round(F.col("cmax").cast("double") / n_d, 9)
                    .alias("top_share"),
                    F.round(simpson, 9).alias("simpson_div"))
