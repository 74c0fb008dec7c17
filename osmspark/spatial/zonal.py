"""Zonal statistics — the raster↔vector integration operator: aggregate
a point-count raster over polygon zones (admin areas, AOIs), the
canonical "how many events per district per tile" reporting query.

Pipeline shape (two existing pinned primitives composed, no new math):

1. ``raster_tile_counts(points, zoom)`` — the point table collapses to
   per-tile counts FIRST (map-side partial agg + one shuffle on the
   tile id). At 10^12 points this is the only pass over the big table;
   everything after runs on ≤ 4^zoom tile rows.
2. ``polyfill_raster(polys, zoom)`` — each zone rasterizes to its
   center-inside tile set (per-row array codegen, no shuffle).
3. The zone⋈raster join is BROADCAST on the polyfill side (zones ×
   tiles-per-zone rows — the AOI mask, small by construction; compact
   it with ``compact.compact_tiles`` for storage, uncompact to join).
   A tile under k overlapping zones fans out k ways — the join
   multiplicity is zone overlap, never point count.
4. ``groupBy(poly_id)`` over the joined tiles: covered-tile count,
   point sum, hottest tile. Zones whose polyfill is empty or that
   cover only point-free tiles still emit a row (never-drop: left join
   from the zone table, zero-filled).

Scale note: per-zone stats are ≤ |zones| rows; the single heavy stage
is step 1's groupBy, which AQE skew-handles like any tile aggregation.
Reference scope: osm-read decodes entities (lib/pbfParser.js) and
leaves all spatial aggregation to consumers — this is that consumer
layer, Spark-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from osmspark.spatial.polyfill import polyfill_raster
from osmspark.spatial.tiles import raster_tile_counts

__all__ = ["zonal_stats"]


def zonal_stats(points: DataFrame, polys: DataFrame, zoom: int,
                poly_id: str = "poly_id", lat_arr: str = "ring_lat",
                lon_arr: str = "ring_lon", lat_col: str = "lat",
                lon_col: str = "lon") -> DataFrame:
    """(poly_id, n_tiles, n_covered, n_points, max_tile_points) per zone.

    ``n_tiles``: zone tiles from the polyfill (center-inside rule);
    ``n_covered``: those holding ≥ 1 point; ``n_points``: total points
    in zone tiles (boundary semantics are tile-granular: a point counts
    toward every zone whose polyfill contains its tile);
    ``max_tile_points``: hottest tile in the zone (0 when empty).
    """
    raster = raster_tile_counts(points, zoom, lat_col=lat_col,
                                lon_col=lon_col).drop("zoom")
    cells = polyfill_raster(polys, zoom, poly_id=poly_id,
                            lat_arr=lat_arr, lon_arr=lon_arr).drop("zoom")
    # INNER join so the small zone mask is a legal broadcast build side
    # (a left join would preserve cells and force the raster to build);
    # per-zone tile counts come from the mask alone, stitched back on.
    stats = (raster.join(F.broadcast(cells), ["tile_x", "tile_y"])
             .groupBy("poly_id")
             .agg(F.count(F.lit(1)).alias("n_covered"),
                  F.sum("n_points").alias("n_points"),
                  F.max("n_points").alias("max_tile_points")))
    n_tiles = (cells.groupBy("poly_id")
               .agg(F.count(F.lit(1)).alias("n_tiles")))
    return (polys.select(F.col(poly_id).alias("poly_id")).distinct()
            .join(n_tiles, "poly_id", "left")
            .join(stats, "poly_id", "left")
            .select("poly_id",
                    F.coalesce("n_tiles", F.lit(0)).alias("n_tiles"),
                    F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
                    F.coalesce("n_points", F.lit(0)).alias("n_points"),
                    F.coalesce("max_tile_points", F.lit(0))
                    .alias("max_tile_points")))
