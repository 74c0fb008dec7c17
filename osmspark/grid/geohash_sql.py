"""Geohash encode as pure Spark SQL expressions (JVM-side codegen).

The third grid family next to the hex (hexgrid_sql) and S2 (s2_sql)
encoders: standard geohash = the Morton (Z-order) interleave of the
binary subdivisions of lon (even bit positions, MSB first) and lat
(odd), emitted as base32. A geohash of ``precision`` characters carries
``5·precision`` bits — ceil(5p/2) lon bits, floor(5p/2) lat bits.

Construction (no Python, no loops over rows):

1. quantize: ``lon_q = floor((lon+180)/360 · 2^nlon)`` (clamped to the
   max cell so +180/+90 land in the last cell, like every geohash lib);
   same for lat.
2. interleave with the classic magic-number bit spread: x | x<<16 …
   masked by 0x5555… — 5 shift/or/and rounds spread 30 bits to 60, so
   the whole Morton code is ~30 integer ops in one codegen stage.
3. base32: 5-bit groups → ``substring('0123456789bcdefghjkmnpqrstuvwxyz',
   g+1, 1)``, concatenated.

The same arithmetic re-states 1:1 in DuckDB for the oracle; the
``geohash_cell_counts`` contract row pins bit-identical strings. Like
the other encoders this is scan-side work — groupBy(geohash) then
shuffles the (tiny) per-cell aggregates, never the points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["geohash_col", "geohash_counts"]

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _spread_bits(x: Column) -> Column:
    """Interleave-ready spread: bit i of x moves to bit 2i (x ≤ 30 bits).

    The standard Morton magic numbers, 64-bit flavor."""
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return x


def geohash_col(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Base32 geohash string of ``precision`` chars, pure SQL."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be 1..12: {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_q = F.least(F.lit((1 << nlon) - 1),
                    F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                            * F.lit(float(1 << nlon))).cast("long"))
    lat_q = F.least(F.lit((1 << nlat) - 1),
                    F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                            * F.lit(float(1 << nlat))).cast("long"))
    lon_q = F.greatest(F.lit(0), lon_q)
    lat_q = F.greatest(F.lit(0), lat_q)
    # lon owns the even (MSB-first first) positions: when nbits is odd,
    # lon has one extra bit — align by spreading then shifting lon left
    morton = F.shiftleft(_spread_bits(lon_q), 1).bitwiseOR(_spread_bits(lat_q))
    # with nbits odd the lowest lon bit must land at bit 0: spread puts
    # lon bit i at 2i+1; geohash order wants lon first ⇒ for odd nbits
    # swap the roles instead
    if nbits % 2 == 1:
        morton = _spread_bits(lon_q).bitwiseOR(F.shiftleft(_spread_bits(lat_q), 1))
    chars = [
        F.substring(
            F.lit(_B32),
            (F.shiftrightunsigned(morton, (precision - 1 - i) * 5)
             .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"), 1)
        for i in range(precision)]
    return F.concat(*chars)


def geohash_counts(df: DataFrame, precision: int = 7,
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Per-geohash point counts — scan-side encode, aggregate shuffle."""
    return (df.withColumn("geohash",
                          geohash_col(F.col(lat_col), F.col(lon_col),
                                      precision))
            .groupBy("geohash")
            .agg(F.count(F.lit(1)).alias("n_points")))
