"""Standard deviational ellipse (directional distribution) per group.

The classic point-pattern summary (Lefever 1926; ArcGIS "Directional
Distribution"): mean center, major/minor dispersion axes, and the
major-axis orientation — WHERE a user's activity concentrates and
along WHICH corridor it stretches. Complements radius_of_gyration
(isotropic spread) with the anisotropic shape.

Exactness discipline (repo-wide rule, see ``mobility.py``): all five
moment sums run on 1e-6° fixed-point integers — Σx, Σy int64; Σx²,
Σy², Σxy decimal(38,0) — so the N-scaled central moments
``Cxx = n·Σx² − Σx²ᵉ``, ``Cyy``, ``Cxy`` are EXACT decimals on any
engine and any partitioning. The float tail is fixed-shape from those
exact operands: T = √(D² + 4·Cxy²) with D = Cxx − Cyy, eigenvalues
(A ± T)/2 with A = Cxx + Cyy (covariance × n²), axes √λ/(n·10⁶), and
θ = ½·atan2(2·Cxy, D) — each rounded to 9 dp (the ``with_bearing``
precedent: identical IEEE doubles in, identical atan2/sqrt out).

Scale shape: ONE combinable aggregation keyed on the group id — no
window, no Python, skew bounded by the busiest device.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["deviational_ellipse"]


def deviational_ellipse(points: DataFrame, user_col: str = "trip_id",
                        lat_col: str = "lat",
                        lon_col: str = "lon") -> DataFrame:
    """(user, n_points, center_lat, center_lon, major_deg, minor_deg,
    theta_deg) — semi-axes in planar degrees (population covariance
    eigenvalues), θ the major-axis angle from the LAT axis toward
    increasing lon, in (−90, 90] degrees (½·atan2(2·Cxy, Cxx−Cyy)
    with x = lat, y = lon). Single-point groups yield zero axes, θ = 0.
    """
    ux = F.round(F.col(lat_col) * F.lit(1000000.0), 0).cast("long")
    uy = F.round(F.col(lon_col) * F.lit(1000000.0), 0).cast("long")
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = (points
         .select(F.col(user_col).alias("user"),
                 ux.alias("ux"), uy.alias("uy"))
         .groupBy("user")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("ux").alias("sx"), F.sum("uy").alias("sy"),
              F.sum(d("ux") * d("ux")).alias("qxx"),
              F.sum(d("uy") * d("uy")).alias("qyy"),
              F.sum(d("ux") * d("uy")).alias("qxy")))
    n_d = F.col("n").cast("decimal(38,0)")
    cxx = n_d * F.col("qxx") - d("sx") * d("sx")
    cyy = n_d * F.col("qyy") - d("sy") * d("sy")
    cxy = n_d * F.col("qxy") - d("sx") * d("sy")
    g = g.select("user", "n", "sx", "sy",
                 cxx.alias("cxx"), cyy.alias("cyy"), cxy.alias("cxy"))
    a_f = (F.col("cxx") + F.col("cyy")).cast("double")
    d_f = (F.col("cxx") - F.col("cyy")).cast("double")
    cxy2 = (F.col("cxy").cast("double"))
    t = F.sqrt(d_f * d_f + F.lit(4.0) * cxy2 * cxy2)
    scale = F.col("n").cast("double") * F.lit(1000000.0)
    # float T can exceed exact A by an ulp when the minor axis ≈ 0
    major = F.sqrt(F.greatest(F.lit(0.0), (a_f + t) / F.lit(2.0))) / scale
    minor = F.sqrt(F.greatest(F.lit(0.0), (a_f - t) / F.lit(2.0))) / scale
    theta = F.degrees(F.atan2(F.lit(2.0) * cxy2, d_f) / F.lit(2.0))
    return g.select(
        "user", F.col("n").cast("long").alias("n_points"),
        F.round(F.col("sx").cast("double") / scale, 9).alias("center_lat"),
        F.round(F.col("sy").cast("double") / scale, 9).alias("center_lon"),
        F.round(major, 9).alias("major_deg"),
        F.round(minor, 9).alias("minor_deg"),
        F.round(theta, 9).alias("theta_deg"))
