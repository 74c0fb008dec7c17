"""S2 cell-id encode as pure Spark SQL expressions (JVM-side codegen).

Same algorithm as :mod:`osmspark.grid.s2` (sphere → cube face → quadratic
ST → leaf (i,j) → 30-round Hilbert walk → 64-bit cell id) expressed as
Column expressions, so the S2 tiling hot path — like the hex path in
:mod:`hexgrid_sql` — runs inside whole-stage codegen with NO Python
worker or Arrow hop. The DuckDB oracle (`__spark_entry__._s2_tiles_oracle_sql`)
re-states the identical arithmetic as a recursive CTE.

The Hilbert iteration can't be one expression tree: ``orient_k`` feeds
both the lookup and the XOR of round k+1, so a naive nested expression
doubles per round (2^30 nodes). ``s2_prepare`` therefore materializes
each round as named intermediate columns (one narrow projection chain);
Catalyst's CollapseProject keeps multiply-referenced non-cheap
expressions in separate projections, so the analyzed plan stays linear.

Float semantics: sin/cos/sqrt run on java.lang.Math here vs NumPy's libm
in ``s2.py`` — both claim ≤ 1 ulp; a disagreement only matters for a
point within ~1e-16 of a cell boundary (probability ~1e-7 per point,
absent on the pinned test data — the same caveat the DuckDB oracle
documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import s2 as _s2

__all__ = ["with_s2_cell_sql"]

_MAX_LEVEL = _s2.MAX_LEVEL


def _build_multilevel_table(levels: int) -> list[int]:
    """Precompute ``levels`` Hilbert steps per lookup (the standard S2
    batching trick): index = (i_bits << (levels+2)) | (j_bits << 2) |
    orient → value = (pos_bits << 2) | orient_out. A 4-level table has
    1024 entries and turns the 30-round walk into 8 rounds."""
    ij_to_pos = _s2._IJ_TO_POS
    pos_to_orient = _s2._POS_TO_ORIENTATION
    n = 1 << levels
    out = [0] * (n * n * 4)
    for orient0 in range(4):
        for i_bits in range(n):
            for j_bits in range(n):
                orient, pos = orient0, 0
                for k in range(levels - 1, -1, -1):
                    ij = (((i_bits >> k) & 1) << 1) | ((j_bits >> k) & 1)
                    sp = int(ij_to_pos[orient, ij])
                    pos = (pos << 2) | sp
                    orient ^= int(pos_to_orient[sp])
                out[(i_bits << (levels + 2)) | (j_bits << 2) | orient0] = \
                    (pos << 2) | orient
    return out


_TABLE4 = _build_multilevel_table(4)   # 1024 entries, 4 levels/round
_TABLE2 = _build_multilevel_table(2)   # 64 entries, final 2 levels


def with_s2_cell_sql(df: DataFrame, level: int, lat_col: str = "lat",
                     lon_col: str = "lon", out: str = "cell") -> DataFrame:
    """Append the S2 cell id at ``level`` as a pure-SQL column.

    Bit-identical to ``s2.cell_id(...).astype(int64)`` (pinned by
    tests/test_grid.py parity test); returns the input columns + ``out``.
    """
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError(f"level must be in [0, {_MAX_LEVEL}]")
    lat, lon = F.col(lat_col), F.col(lon_col)
    phi, theta = F.radians(lat), F.radians(lon)
    cos_phi = F.cos(phi)
    x = F.cos(theta) * cos_phi
    y = F.sin(theta) * cos_phi
    z = F.sin(phi)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    f0 = (F.when(ax >= ay, F.when(ax >= az, F.lit(0)).otherwise(F.lit(2)))
          .otherwise(F.when(ay >= az, F.lit(1)).otherwise(F.lit(2))))

    work = (df.withColumn("_x", x).withColumn("_y", y).withColumn("_z", z)
            .withColumn("_f0", f0))
    face = (F.when((F.col("_f0") == 0) & (F.col("_x") < 0), F.lit(3))
            .when((F.col("_f0") == 1) & (F.col("_y") < 0), F.lit(4))
            .when((F.col("_f0") == 2) & (F.col("_z") < 0), F.lit(5))
            .otherwise(F.col("_f0")))
    work = work.withColumn("_face", face)

    xc, yc, zc, fc = F.col("_x"), F.col("_y"), F.col("_z"), F.col("_face")
    u = (F.when(fc == 0, yc / xc).when(fc == 1, -xc / yc)
         .when(fc == 2, -xc / zc).when(fc == 3, zc / xc)
         .when(fc == 4, zc / yc).otherwise(-yc / zc))
    v = (F.when(fc == 0, zc / xc).when(fc == 1, zc / yc)
         .when(fc == 2, -yc / zc).when(fc == 3, yc / xc)
         .when(fc == 4, -xc / yc).otherwise(-xc / zc))

    def st(c: Column) -> Column:
        # S2_QUADRATIC_PROJECTION; CASE branches evaluate lazily, so no
        # sqrt-domain guard is needed (1±3c ≥ 1 on the taken branch)
        return (F.when(c >= 0.0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * c))
                .otherwise(F.lit(1.0) - F.lit(0.5)
                           * F.sqrt(F.lit(1.0) - F.lit(3.0) * c)))

    def ij(c: Column) -> Column:
        scaled = F.floor(c * F.lit(float(1 << _MAX_LEVEL))).cast("long")
        return F.greatest(F.lit(0).cast("long"),
                          F.least(F.lit((1 << _MAX_LEVEL) - 1).cast("long"),
                                  scaled))

    work = (work.withColumn("_i", ij(st(u))).withColumn("_j", ij(st(v)))
            .withColumn("_orient", F.col("_face").bitwiseAND(F.lit(1)))
            .withColumn("_pos", F.lit(0).cast("long")))

    # Hilbert walk, 4 levels per round via the precomputed table: 8
    # projection boundaries instead of 30 (each Project copies the row,
    # so round count — not expression size — dominated the 1-level
    # variant), and within each round pos/orient share one lookup
    t4 = F.lit(_TABLE4)
    t2 = F.lit(_TABLE2)
    rounds = [(k, 4, t4) for k in range(_MAX_LEVEL - 4, 1, -4)] + [(0, 2, t2)]
    for shift, width, table in rounds:
        mask = (1 << width) - 1
        i_bits = F.shiftright(F.col("_i"), shift).bitwiseAND(F.lit(mask)).cast("int")
        j_bits = F.shiftright(F.col("_j"), shift).bitwiseAND(F.lit(mask)).cast("int")
        idx = (F.shiftleft(i_bits, width + 2)
               .bitwiseOR(F.shiftleft(j_bits, 2))
               .bitwiseOR(F.col("_orient")))
        val = F.element_at(table, idx + 1)
        work = work.withColumns({
            "_pos": F.shiftleft(F.col("_pos"), 2 * width)
                    .bitwiseOR(F.shiftright(val, 2).cast("long")),
            "_orient": val.bitwiseAND(F.lit(3)),
        })

    # [3b face][2·30b pos][1]: shifts wrap like the uint64 NumPy pack,
    # then mask to the requested level (lsb arithmetic on the signed
    # bit pattern — identical to s2.parent)
    leaf = (F.shiftleft(F.col("_face").cast("long"), 61)
            .bitwiseOR(F.shiftleft(F.col("_pos"), 1))
            .bitwiseOR(F.lit(1).cast("long")))
    lsb = 1 << (2 * (_MAX_LEVEL - level))
    cell = (leaf.bitwiseAND(F.lit(-lsb).cast("long"))
            .bitwiseOR(F.lit(lsb).cast("long")))
    return (work.withColumn(out, cell)
            .drop("_x", "_y", "_z", "_f0", "_face", "_i", "_j",
                  "_orient", "_pos"))
