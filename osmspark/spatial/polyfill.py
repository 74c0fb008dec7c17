"""Polygon → tile-set rasterization (polyfill): every web-mercator
``z/x/y`` tile at a zoom whose CENTER lies inside a polygon ring.

Completes the raster↔vector family (``tiles.py`` encodes points→cells
and decodes cells→points; this rasterizes REGIONS→cells): zone/AOI
assignment tables, coverage masks for ``pip_join``-style prefilters,
rollup weights per administrative area.

Construction — per-polygon-row array expressions only, NO shuffle and
NO Python:

1. Ring bbox (``array_min``/``array_max``) → candidate tile ranges via
   the same x/y formulas as ``raster_tile_counts``
   (``tiles.py:134-152``), so a polyfill cell id always equi-joins
   against point tile ids.
2. ``explode(sequence(x0, x1)) × explode(sequence(y0, y1))`` — the
   candidate set is the bbox tile rectangle. Work per polygon is
   O(bbox tiles): pick the zoom so bboxes stay bounded, or split giant
   rings upstream (the same contract as the reference's consumers; a
   polygon is one row, so the fan-out parallelizes per polygon).
3. Tile-center even-odd crossing test as one ``aggregate()`` over the
   ring edges (whole-stage codegen). The crossing expression is the
   exact shape used by ``pip.py``'s refine and its DuckDB oracle —
   ``(yi > lat) != (yj > lat) AND lon < (xj−xi)·(lat−yi)/(yj−yi)+xi``
   — with the division guarded by a nested CASE (the outer inequality
   implies ``yi ≠ yj``; CASE short-circuits in both engines, so
   horizontal edges are safe even under ANSI mode).

Boundary convention: center-in (the cartographic "centroid rule").
A tile whose center sits exactly on an edge follows the even-odd
tie-break of the crossing expression — deterministic, engine-exact.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = ["polyfill_raster", "MERCATOR_LAT_MAX"]

MERCATOR_LAT_MAX = 85.05112878


def _tile_x(lon, n: float):
    return F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))


def _tile_y(lat, n: float):
    lat_c = F.greatest(F.lit(-MERCATOR_LAT_MAX),
                       F.least(F.lit(MERCATOR_LAT_MAX), lat))
    lat_rad = F.radians(lat_c)
    return F.floor((F.lit(1.0) - F.log(F.tan(lat_rad) +
                                       F.lit(1.0) / F.cos(lat_rad))
                    / F.lit(float(np.pi))) / F.lit(2.0) * F.lit(n))


def polyfill_raster(polys: DataFrame, zoom: int, poly_id: str = "poly_id",
                    lat_arr: str = "ring_lat", lon_arr: str = "ring_lon"
                    ) -> DataFrame:
    """(poly_id, zoom, tile_x, tile_y) — tiles whose center is inside.

    ``polys``: one row per ring with ``lat_arr``/``lon_arr`` vertex
    arrays (closing edge implicit, same convention as ``pip_join``).
    """
    n = float(1 << zoom)
    nmax = int(n) - 1
    la, lo = F.col(lat_arr), F.col(lon_arr)

    x0 = F.greatest(F.lit(0), F.least(F.lit(nmax),
                    _tile_x(F.array_min(lo), n).cast("long")))
    x1 = F.greatest(F.lit(0), F.least(F.lit(nmax),
                    _tile_x(F.array_max(lo), n).cast("long")))
    # mercator y grows southward: y-range start comes from max_lat
    y0 = F.greatest(F.lit(0), F.least(F.lit(nmax),
                    _tile_y(F.array_max(la), n).cast("long")))
    y1 = F.greatest(F.lit(0), F.least(F.lit(nmax),
                    _tile_y(F.array_min(la), n).cast("long")))

    cand = (polys
            .select(F.col(poly_id).alias("poly_id"), la.alias("_rla"),
                    lo.alias("_rlo"), x0.alias("_x0"), x1.alias("_x1"),
                    y0.alias("_y0"), y1.alias("_y1"))
            .withColumn("tile_x", F.explode(F.expr("sequence(_x0, _x1)")))
            .withColumn("tile_y", F.explode(F.expr("sequence(_y0, _y1)"))))

    # tile center (inverse mercator); identical IEEE text in the oracle
    ctr_lon = ((F.col("tile_x").cast("double") + F.lit(0.5)) / F.lit(n)
               * F.lit(360.0) - F.lit(180.0))
    merc = F.lit(float(np.pi)) * (F.lit(1.0) - F.lit(2.0)
           * (F.col("tile_y").cast("double") + F.lit(0.5)) / F.lit(n))
    ctr_lat = F.degrees(F.atan((F.exp(merc) - F.exp(-merc)) / F.lit(2.0)))

    crossings = F.expr("""
      aggregate(sequence(0, size(_rla) - 1), 0, (acc, i) -> acc + (
        CASE WHEN (element_at(_rla, i + 1) > _clat) !=
                  (element_at(_rla, CASE WHEN i = size(_rla) - 1
                                         THEN 1 ELSE i + 2 END) > _clat)
             THEN (CASE WHEN _clon <
                     (element_at(_rlo, CASE WHEN i = size(_rla) - 1
                                           THEN 1 ELSE i + 2 END)
                      - element_at(_rlo, i + 1))
                     * (_clat - element_at(_rla, i + 1))
                     / (element_at(_rla, CASE WHEN i = size(_rla) - 1
                                             THEN 1 ELSE i + 2 END)
                        - element_at(_rla, i + 1))
                     + element_at(_rlo, i + 1)
                   THEN 1 ELSE 0 END)
             ELSE 0 END))""")

    return (cand
            .withColumn("_clon", ctr_lon).withColumn("_clat", ctr_lat)
            .withColumn("_cross", crossings)
            .filter(F.col("_cross") % 2 == 1)
            .select("poly_id", F.lit(zoom).alias("zoom"),
                    "tile_x", "tile_y"))
