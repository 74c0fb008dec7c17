"""Per-cell temporal activity trend — exact OLS over daily counts.

"Which tiles are growing?" — the change-detection companion to the
hot-spot statistics (`autocorr.py` answers WHERE activity clusters;
this answers where it is MOVING). For each grid cell, fit ordinary
least squares y = a + b·x over its (day, event-count) series and
report the slope (events/day) and intercept.

Exactness: with integer day indices x and integer counts y, both OLS
closed forms are ratios of exact integer moments —

    b = (n·Σxy − Σx·Σy) / D        D = n·Σx² − (Σx)²
    a = (Σy·Σx² − Σx·Σxy) / D

so every cross-shuffle sum is int64/decimal(38,0)-exact
(order-insensitive, engine-portable) and each coefficient is ONE float
division of identical exact operands, rounded to 9 dp. NULL when the
cell has a single active day (D = 0).

Scale shape: two stacked combinable aggregations — (cell, day) census
then per-cell moments. One shuffle key each, no window, no Python;
day-skew (a viral tile) stays map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["activity_trend", "burstiness", "lag_autocorr",
           "mann_kendall"]

_US_PER_DAY = 86_400_000_000


def activity_trend(points: DataFrame, cell_deg: float = 0.5,
                   ts_col: str = "ts_us", lat_col: str = "lat",
                   lon_col: str = "lon") -> DataFrame:
    """Per-cell OLS trend of daily event counts.

    ``ts_col`` is epoch MICROSECONDS (int64); the day index is the
    integer division by 86.4e9 (floor semantics — Spark's long
    division and DuckDB ``//`` agree on nonnegative epochs).
    Output: (cell_x, cell_y, n_days, n_events, slope, intercept).
    """
    inv = F.lit(1.0 / cell_deg)
    daily = (points
             .groupBy(F.floor(F.col(lon_col) * inv).cast("long")
                      .alias("cell_x"),
                      F.floor(F.col(lat_col) * inv).cast("long")
                      .alias("cell_y"),
                      (F.col(ts_col) / F.lit(_US_PER_DAY)).cast("long")
                      .alias("day"))
             .agg(F.count(F.lit(1)).alias("y")))
    xd = F.col("day").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    g = (daily.groupBy("cell_x", "cell_y")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("y").alias("n_events"),
              F.sum(xd).alias("sx"),
              F.sum(yd).alias("sy"),
              F.sum(xd * xd).alias("sxx"),
              F.sum(xd * yd).alias("sxy")))
    n_d = F.col("n").cast("decimal(38,0)")
    det = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(det != 0,
                   (n_d * F.col("sxy")
                    - F.col("sx") * F.col("sy")).cast("double")
                   / det.cast("double"))
    intercept = F.when(det != 0,
                       (F.col("sy") * F.col("sxx")
                        - F.col("sx") * F.col("sxy")).cast("double")
                       / det.cast("double"))
    return g.select("cell_x", "cell_y",
                    F.col("n").alias("n_days"),
                    F.col("n_events").cast("long").alias("n_events"),
                    F.round(slope, 9).alias("slope"),
                    F.round(intercept, 9).alias("intercept"))


def mann_kendall(daily: DataFrame, y_col: str = "y",
                 cx_col: str = "cell_x", cy_col: str = "cell_y",
                 t_col: str = "day", y_type: str = "long") -> DataFrame:
    """Per-cell Mann-Kendall monotonic-trend test over a (cell, time,
    value) series — the nonparametric half of "emerging hot spot
    analysis" (``spacetime.gi_star_spacetime`` supplies the other):
    unlike the OLS slope above, M-K only looks at SIGNS, so it is
    robust to outliers and needs no distributional assumption.

        S   = Σ_{i<j} sgn(y_j − y_i)                (time-ordered)
        V18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) (tie-corrected
                                                     18·Var[S])
        z   = (S − sgn(S)) / sqrt(V18 / 18)          (continuity corr.)

    S, n and V18 are exact integers (sgn compares values exactly; the
    tie census groups by the exact value — ``y_type="double"`` admits
    float series such as Gi* z-scores, still engine-portable because
    both sign and equality act on IDENTICAL rounded doubles); z is
    the only new float — two IEEE
    ops (divide by 18.0, sqrt) on identical exact operands then one
    division, rounded 9 dp, engine-portable. NULL z when V18 = 0
    (n < 2 or a completely tied series).

    Scale shape: the pair generation is a per-cell self-equi-join on
    the cell key with t_i < t_j — O(T²) pairs per cell where T is the
    series length (bounded by the calendar: 365 daily bins/year —
    NOT by data volume; a cell with 10^9 events still contributes
    T ≤ 365 rows here because the input is the (cell, day) census).
    Output: (cell_x, cell_y, n_periods, s_stat, v18, mk_z).
    """
    base = daily.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(t_col).alias("t"),
                        F.col(y_col).cast(y_type).alias("y"))
    a = base.select("cx", "cy", F.col("t").alias("ti"),
                    F.col("y").alias("yi"))
    b = base.select("cx", "cy", F.col("t").alias("tj"),
                    F.col("y").alias("yj"))
    pairs = (a.join(b, ["cx", "cy"], "inner")
             .filter(F.col("ti") < F.col("tj")))
    sgn = (F.when(F.col("yj") > F.col("yi"), 1)
           .when(F.col("yj") < F.col("yi"), -1)
           .otherwise(0))
    s = (pairs.groupBy("cx", "cy")
         .agg(F.sum(sgn).alias("s_stat")))

    n = base.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    tg = (base.groupBy("cx", "cy", "y")
          .agg(F.count(F.lit(1)).alias("t_g")))
    ties = (tg.groupBy("cx", "cy")
            .agg(F.sum(F.col("t_g") * (F.col("t_g") - 1)
                       * (2 * F.col("t_g") + 5)).alias("tie_sum")))

    g = (n.join(ties, ["cx", "cy"])
         .join(s, ["cx", "cy"], "left"))
    s_stat = F.coalesce(F.col("s_stat"), F.lit(0)).cast("long")
    v18 = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
           - F.col("tie_sum")).cast("long")
    corr = F.when(s_stat > 0, s_stat - 1) \
        .when(s_stat < 0, s_stat + 1).otherwise(F.lit(0))
    z = F.when(v18 > 0,
               F.round(corr.cast("double")
                       / F.sqrt(v18.cast("double") / F.lit(18.0)), 9))
    return g.select(F.col("cx").alias("cell_x"),
                    F.col("cy").alias("cell_y"),
                    F.col("n").alias("n_periods"),
                    s_stat.alias("s_stat"), v18.alias("v18"),
                    z.alias("mk_z"))


def burstiness(daily: DataFrame, y_col: str = "y",
               cx_col: str = "cell_x", cy_col: str = "cell_y",
               t_col: str = "day") -> DataFrame:
    """Per-cell Fano factor over a (cell, time-bin, count) series —
    the index-of-dispersion burstiness test (F ≈ 1 Poisson-random
    arrivals, F > 1 bursty/clumped, F < 1 regular): the temporal
    companion to the SPATIAL clustering statistics in autocorr.py.

        F = Var[y] / E[y]  =  (T·Q − S²) / (T·S)

    over the cell's T observed bins (population variance; S = Σy,
    Q = Σy²). Both numerator and denominator are exact N-scaled
    integers — Q in decimal(38,0) — and ONE IEEE division (rounded
    9 dp) is the only float, the repo-wide discipline. NULL when
    S = 0 (all-zero series).

    ONE combinable aggregation on the cell key; input is the
    (cell, bin) census, so cost is calendar-bounded like mann_kendall.
    Output: (cell_x, cell_y, n_periods, s_sum, fano).
    """
    base = daily.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(y_col).cast("long").alias("y"))
    g = (base.groupBy("cx", "cy")
         .agg(F.count(F.lit(1)).alias("t"),
              F.sum("y").alias("s"),
              F.sum(F.col("y").cast("decimal(38,0)")
                    * F.col("y").cast("decimal(38,0)")).alias("q")))
    num = (F.col("t").cast("decimal(38,0)") * F.col("q")
           - F.col("s").cast("decimal(38,0)")
           * F.col("s").cast("decimal(38,0)"))
    den = (F.col("t").cast("decimal(38,0)")
           * F.col("s").cast("decimal(38,0)"))
    fano = F.when(F.col("s") > 0,
                  F.round(num.cast("double") / den.cast("double"), 9))
    return g.select(F.col("cx").alias("cell_x"),
                    F.col("cy").alias("cell_y"),
                    F.col("t").alias("n_periods"),
                    F.col("s").alias("s_sum"),
                    fano.alias("fano"))


def lag_autocorr(daily: DataFrame, lag: int = 1, y_col: str = "y",
                 cx_col: str = "cell_x", cy_col: str = "cell_y",
                 t_col: str = "day") -> DataFrame:
    """Per-cell lag-k autocorrelation over a (cell, time-bin, count)
    series — the seasonality/persistence statistic completing the
    time-series family (OLS trend: direction, Mann-Kendall:
    monotonicity, Fano: dispersion, this: memory):

        r_k = Σ (dev_t · dev_{t+k}) / Σ dev²     (dev = T·y − S)

    over the cell's T observed bins, pairing bins exactly ``lag``
    STEPS apart in bin order (calendar gaps allowed — ranks, not
    timestamps, define the lag; the census input makes T
    calendar-bounded). Input must be a CENSUS — one row per
    (cell, bin); duplicate bins would make the rank pairing depend on
    intra-tie row order (every other operator in this module is
    order-insensitive, this one pairs by position).

    The N-scaled deviations are exact integers, so numerator and
    denominator are exact decimal(38,0) sums and ONE 9-dp division is
    the only float (NULL when the series is constant or shorter than
    lag+1). The diagnostic ``num``/``den`` OUTPUT columns cast those
    decimals to int64 — exact while den = Σdev² < 2^63 (≈ a cell
    averaging 5·10^5 events/bin over a year); past that the internal
    decimals (and therefore ``acf``) stay exact while the cast
    overflows to NULL in non-ANSI Spark — visible, never a wrap (the
    morans_i envelope convention).

    Scale shape: one per-cell census for (T, S), one join back, ONE
    lag window on the cell key, two combinable sums. Output:
    (cell_x, cell_y, n_periods, num, den, acf).
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")
    base = daily.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(t_col).alias("t"),
                        F.col(y_col).cast("long").alias("y"))
    tot = (base.groupBy("cx", "cy")
           .agg(F.count(F.lit(1)).alias("tn"), F.sum("y").alias("s")))
    dev = (base.join(tot, ["cx", "cy"])
           .select("cx", "cy", "t",
                   (F.col("tn") * F.col("y") - F.col("s")).alias("dev")))
    w = Window.partitionBy("cx", "cy").orderBy("t")
    paired = dev.withColumn("dj", F.lead("dev", lag).over(w))
    g = (paired.groupBy("cx", "cy")
         .agg(F.count(F.lit(1)).alias("np"),
              F.sum(F.col("dev").cast("decimal(38,0)")
                    * F.col("dj").cast("decimal(38,0)")).alias("num_d"),
              F.sum(F.col("dev").cast("decimal(38,0)")
                    * F.col("dev").cast("decimal(38,0)")).alias("den_d")))
    acf = F.when((F.col("den_d") != 0) & F.col("num_d").isNotNull()
                 & (F.col("np") > lag),
                 F.round(F.col("num_d").cast("double")
                         / F.col("den_d").cast("double"), 9))
    return g.select(F.col("cx").alias("cell_x"),
                    F.col("cy").alias("cell_y"),
                    F.col("np").alias("n_periods"),
                    F.coalesce(F.col("num_d"),
                               F.lit(0).cast("decimal(38,0)"))
                    .cast("long").alias("num"),
                    F.col("den_d").cast("long").alias("den"),
                    acf.alias("acf"))
