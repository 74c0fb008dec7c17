"""Raster hydrology — D8 flow direction + flow accumulation.

The classic terrain pair (watershed delineation, drainage density,
runoff modeling): every cell of an elevation raster drains to its
steepest DOWNHILL 8-neighbor (D8), and a cell's accumulation is the
number of cells whose flow path passes through it — the upstream-area
statistic hydrologists threshold to extract stream networks.

Determinism discipline: steepness comparisons are EXACT integers —
drop/distance ranks via cross-multiplied squares (drop² · dist²_other,
valid because drops are nonnegative and squaring is monotone there;
dist² ∈ {1, 2} for cardinal/diagonal) — and ties break by a fixed
(drop², then offset index) order, so the flow forest is bit-identical
on any engine. Cells with no lower neighbor are SINKS (no out-edge);
run :func:`fill_depressions` first when interior pits should drain
to the border instead of terminating basins.

Scale shape: D8 is one 8-offset explode equi-join on the cell key +
one min(struct) argmin — the autocorr/k-ring neighborhood pattern,
never an all-pairs join. Accumulation iterates
``acc(v) ← 1 + Σ_{u→v} acc(u)`` (exact int64; converges in flow-path
depth, signature-checked like cc.py) — each round one equi-join of the
O(cells) accumulator onto the flow forest + one combinable sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["d8_flow", "flow_accumulation", "watershed_labels",
           "fill_depressions", "slope_aspect", "ruggedness_index"]

_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         if not (dx == 0 and dy == 0)]


def _sig(df: DataFrame, cols: tuple[str, ...]) -> tuple:
    """cc.py convergence signature: count + two independent
    order-insensitive hash sums (simultaneous-collision odds
    ~2^-128)."""
    rev = tuple(reversed(cols))
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h1"),
        F.sum(F.xxhash64(*rev, F.lit(7))
              .cast("decimal(38,0)")).alias("h2")).collect()[0]
    return (row["n"], row["h1"], row["h2"])


def d8_flow(cells: DataFrame, elev_col: str = "elev",
            cx_col: str = "cell_x", cy_col: str = "cell_y") -> DataFrame:
    """(cell_x, cell_y, to_x, to_y, drop) — one row per NON-sink cell,
    pointing at its steepest strictly-lower 8-neighbor. ``drop`` is
    the integer elevation difference. Absent neighbors (raster edge,
    nodata holes) simply aren't candidates.
    """
    base = cells.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(elev_col).cast("long").alias("e"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(i).alias("oi"),
                 F.lit(dx * dx + dy * dy).alias("d2"))
        for i, (dx, dy) in enumerate(_OFFS)])
    left = (base.select("cx", "cy", "e", F.explode(offs).alias("o"))
            .select(F.col("cx").alias("ox"), F.col("cy").alias("oy"),
                    F.col("e").alias("oe"), F.col("o.oi").alias("oi"),
                    F.col("o.d2").alias("d2"),
                    (F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy")))
    nbrs = (left.join(base, ["cx", "cy"])
            .filter(F.col("e") < F.col("oe")))
    drop = F.col("oe") - F.col("e")
    # steepness drop/√d2 ranked by the exact integer drop²·(2/d2):
    # cardinals (d2=1) weight 2, diagonals (d2=2) weight 1 — the
    # cross-multiplied square comparison, order-exact for drops ≥ 0
    rank = drop * drop * F.when(F.col("d2") == 1, F.lit(2)) \
        .otherwise(F.lit(1))
    pick = (nbrs.select(
        F.col("ox"), F.col("oy"),
        F.struct((-rank).alias("nr"), F.col("oi").alias("oi"),
                 F.col("cx").alias("tx"), F.col("cy").alias("ty"),
                 drop.alias("drop")).alias("cand"))
        .groupBy("ox", "oy")
        .agg(F.min("cand").alias("best")))
    return pick.select(F.col("ox").alias("cell_x"),
                       F.col("oy").alias("cell_y"),
                       F.col("best.tx").alias("to_x"),
                       F.col("best.ty").alias("to_y"),
                       F.col("best.drop").cast("long").alias("drop"))


def flow_accumulation(cells: DataFrame, flows: DataFrame,
                      cx_col: str = "cell_x", cy_col: str = "cell_y",
                      max_rounds: int = 64) -> DataFrame:
    """(cell_x, cell_y, acc) — acc = number of cells draining THROUGH
    each cell (its own cell included, the standard convention), over
    the D8 flow forest from :func:`d8_flow`. Converges in flow-path
    depth; raises if the accumulator signature still moves after
    ``max_rounds`` (a cyclic "flow" input — impossible from d8_flow,
    whose edges strictly descend — would manifest that way).
    """
    # checkpoint the STATIC inputs: without it every convergence
    # round re-executes the full upstream d8_flow plan (explode +
    # join + argmin + scan) hanging off these frames
    base = (cells.select(F.col(cx_col).alias("cx"),
                         F.col(cy_col).alias("cy"))
            .localCheckpoint(eager=False))
    e = (flows.select(F.col("cell_x").alias("ux"),
                      F.col("cell_y").alias("uy"),
                      F.col("to_x").alias("vx"),
                      F.col("to_y").alias("vy"))
         .localCheckpoint(eager=False))
    acc = (base.select("cx", "cy", F.lit(1).cast("long").alias("acc"))
           .localCheckpoint(eager=False))
    cur = _sig(acc, ("cx", "cy", "acc"))
    for _ in range(max_rounds):
        inflow = (e.join(acc.select(F.col("cx").alias("ux"),
                                    F.col("cy").alias("uy"),
                                    F.col("acc").alias("ua")),
                         ["ux", "uy"])
                  .groupBy(F.col("vx").alias("cx"),
                           F.col("vy").alias("cy"))
                  .agg(F.sum("ua").alias("inflow")))
        new = (base.join(inflow, ["cx", "cy"], "left")
               .select("cx", "cy",
                       (F.lit(1) + F.coalesce(F.col("inflow"),
                                              F.lit(0).cast("long")))
                       .cast("long").alias("acc"))
               .localCheckpoint(eager=False))
        nxt = _sig(new, ("cx", "cy", "acc"))
        stable = nxt == cur
        acc, cur = new, nxt
        if stable:
            return acc.select(F.col("cx").alias("cell_x"),
                              F.col("cy").alias("cell_y"), "acc")
    raise RuntimeError(
        f"flow_accumulation did not converge in {max_rounds} rounds")


def watershed_labels(cells: DataFrame, flows: DataFrame,
                     cx_col: str = "cell_x", cy_col: str = "cell_y",
                     max_rounds: int = 32) -> DataFrame:
    """(cell_x, cell_y, sink_x, sink_y) — each cell labeled with the
    SINK its flow path terminates at: the watershed/basin partition
    (every drainage-area, pollutant-tracing and flood-zone query
    groups by this label).

    POINTER JUMPING, not step-by-step walking: each round replaces
    every cell's pointer with its pointer's pointer (sinks point at
    themselves), so path lengths halve per round and convergence takes
    ⌈log₂ depth⌉ rounds — the classic parallel list-ranking shortcut,
    vs flow-path-depth rounds for naive following. Per round ONE
    equi-join of the O(cells) pointer table with itself on the
    pointee key + the cc.py two-hash convergence signature.
    """
    ptr = (cells.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"))
           .join(flows.select(F.col("cell_x").alias("cx"),
                              F.col("cell_y").alias("cy"),
                              F.col("to_x").alias("px"),
                              F.col("to_y").alias("py")),
                 ["cx", "cy"], "left")
           .select("cx", "cy",
                   F.coalesce(F.col("px"), F.col("cx")).alias("px"),
                   F.coalesce(F.col("py"), F.col("cy")).alias("py"))
           .localCheckpoint(eager=False))
    cur = _sig(ptr, ("cx", "cy", "px", "py"))
    for _ in range(max_rounds):
        hop = ptr.select(F.col("cx").alias("px"),
                         F.col("cy").alias("py"),
                         F.col("px").alias("gx"),
                         F.col("py").alias("gy"))
        new = (ptr.join(hop, ["px", "py"])
               .select("cx", "cy",
                       F.col("gx").alias("px"),
                       F.col("gy").alias("py"))
               .localCheckpoint(eager=False))
        nxt = _sig(new, ("cx", "cy", "px", "py"))
        stable = nxt == cur
        ptr, cur = new, nxt
        if stable:
            return ptr.select(F.col("cx").alias("cell_x"),
                              F.col("cy").alias("cell_y"),
                              F.col("px").alias("sink_x"),
                              F.col("py").alias("sink_y"))
    raise RuntimeError(
        f"watershed_labels did not converge in {max_rounds} "
        "pointer-jumping rounds")


def fill_depressions(cells: DataFrame, elev_col: str = "elev",
                     cx_col: str = "cell_x", cy_col: str = "cell_y",
                     max_rounds: int = 128) -> DataFrame:
    """(cell_x, cell_y, elev, filled) — the Planchon-Darboux (2002)
    depression fill, the conditioning pass real DEM pipelines run
    BEFORE :func:`d8_flow` (an unfilled pit swallows its basin's flow;
    filling raises every interior depression to its spill level so
    every cell drains to the raster border).

    The parallel iteration: water level W starts at the cell's own
    elevation on BORDER cells (any cell with < 8 present neighbors —
    holes in the raster count as border, the standard convention) and
    +∞ inside; each round every interior cell relaxes to

        W(v) ← max(elev(v), min over 8-neighbors of W(u))

    monotonically draining until the fixpoint — exact integers, the
    cc.py two-hash signature detects convergence, rounds bounded by
    the longest interior drainage path (``max_rounds`` guards flats).
    Per round: one 8-offset scatter join of the O(cells) level table +
    one combinable min + one static join — the flow_accumulation
    shape. ``filled = W − elev`` isolates the poured depth.
    """
    base = cells.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(elev_col).cast("long").alias("e"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFS])
    scat = (base.select("cx", "cy", F.explode(offs).alias("o"))
            .select(F.col("cx").alias("sx"), F.col("cy").alias("sy"),
                    (F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy")))
    ncount = (scat.join(base.select("cx", "cy"), ["cx", "cy"])
              .groupBy(F.col("sx").alias("cx"), F.col("sy").alias("cy"))
              .agg(F.count(F.lit(1)).alias("n_nbrs")))
    big = F.lit(1 << 60).cast("long")
    state = (base.join(ncount, ["cx", "cy"], "left")
             .select("cx", "cy", "e",
                     (F.coalesce(F.col("n_nbrs"), F.lit(0)) == 8)
                     .alias("interior"))
             .select("cx", "cy", "e", "interior",
                     F.when(F.col("interior"), big)
                     .otherwise(F.col("e")).alias("w"))
             .localCheckpoint(eager=False))
    cur = _sig(state, ("cx", "cy", "w"))
    for _ in range(max_rounds):
        nbr_min = (state.select(F.col("cx").alias("ox"),
                                F.col("cy").alias("oy"),
                                F.col("w"),
                                F.explode(offs).alias("o"))
                   .select((F.col("ox") + F.col("o.dx")).alias("cx"),
                           (F.col("oy") + F.col("o.dy")).alias("cy"),
                           "w")
                   .groupBy("cx", "cy")
                   .agg(F.min("w").alias("nw")))
        new = (state.join(nbr_min, ["cx", "cy"], "left")
               .select("cx", "cy", "e", "interior",
                       F.when(F.col("interior"),
                              F.greatest(F.col("e"),
                                         F.coalesce(F.col("nw"), big)))
                       .otherwise(F.col("e")).alias("w"))
               .localCheckpoint(eager=False))
        nxt = _sig(new, ("cx", "cy", "w"))
        stable = nxt == cur
        state, cur = new, nxt
        if stable:
            return state.select(
                F.col("cx").alias("cell_x"),
                F.col("cy").alias("cell_y"),
                F.col("e").alias("elev"),
                (F.col("w") - F.col("e")).cast("long").alias("filled"))
    raise RuntimeError(
        f"fill_depressions did not converge in {max_rounds} rounds "
        "(very long interior drainage path or a flat plateau chain)")


def slope_aspect(cells: DataFrame, elev_col: str = "elev",
                 cx_col: str = "cell_x",
                 cy_col: str = "cell_y") -> DataFrame:
    """(cell_x, cell_y, gx, gy, slope, aspect_deg) — Horn's 3×3
    finite-difference terrain derivatives (the hillshade/solar/erosion
    input): per INTERIOR cell (all 8 neighbors present — the standard
    raster-edge convention, documented)

        gx = (e_ne + 2·e_e + e_se) − (e_nw + 2·e_w + e_sw)
        gy = (e_nw + 2·e_n + e_ne) − (e_sw + 2·e_s + e_se)

    both EXACT int64 (the 8× cell-size denominator is the caller's
    unit scaling); ``slope`` = √(gx² + gy²) and ``aspect_deg`` =
    atan2(gy, gx) in (−180, 180] are the only floats — fixed-shape
    IEEE ops on identical integers (the with_bearing trig precedent),
    rounded 9 dp. One 8-offset scatter join + one combinable
    conditional-sum aggregation; the all-8 filter is the exact
    n_nbrs = 8 census.
    """
    base = cells.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(elev_col).cast("long").alias("e"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFS])
    # scatter every cell's elevation to each neighbor, tagged with the
    # RECEIVER-relative offset (the reverse of the scatter direction)
    scat = (base.select("cx", "cy", "e", F.explode(offs).alias("o"))
            .select((F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy"),
                    (-F.col("o.dx")).alias("rdx"),
                    (-F.col("o.dy")).alias("rdy"),
                    F.col("e").alias("ne_")))
    recv = scat.join(base.select("cx", "cy"), ["cx", "cy"])
    wx = F.col("rdx") * F.when(F.col("rdy") == 0, 2).otherwise(1)
    wy = F.col("rdy") * F.when(F.col("rdx") == 0, 2).otherwise(1)
    g = (recv.groupBy("cx", "cy")
         .agg(F.count(F.lit(1)).alias("n_nbrs"),
              F.sum(wx * F.col("ne_")).alias("gx"),
              F.sum(wy * F.col("ne_")).alias("gy"))
         .filter(F.col("n_nbrs") == 8))
    gxd = F.col("gx").cast("double")
    gyd = F.col("gy").cast("double")
    return g.select(
        F.col("cx").alias("cell_x"), F.col("cy").alias("cell_y"),
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.round(F.sqrt(gxd * gxd + gyd * gyd), 9).alias("slope"),
        F.round(F.degrees(F.atan2(gyd, gxd)), 9).alias("aspect_deg"))


def ruggedness_index(cells: DataFrame, elev_col: str = "elev",
                     cx_col: str = "cell_x",
                     cy_col: str = "cell_y") -> DataFrame:
    """(cell_x, cell_y, n_nbrs, sq_sum, tri) — Riley's Terrain
    Ruggedness Index: √Σ(e_nbr − e)² over the 8-neighborhood, the
    local-relief heterogeneity metric (habitat modeling, route-cost
    surfaces). ``sq_sum`` is the EXACT int64 quadratic (partial
    neighborhoods at raster edges use the neighbors present —
    n_nbrs reports how many, Riley's original convention); the single
    sqrt is the only float, 9 dp. One 8-offset scatter + one
    combinable aggregation — the slope_aspect shape without the
    interior restriction.
    """
    base = cells.select(F.col(cx_col).alias("cx"),
                        F.col(cy_col).alias("cy"),
                        F.col(elev_col).cast("long").alias("e"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFS])
    scat = (base.select("cx", "cy", F.explode(offs).alias("o"),
                        F.col("e").alias("ne_"))
            .select((F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy"), "ne_"))
    d = F.col("ne_") - F.col("e")
    g = (scat.join(base, ["cx", "cy"])
         .groupBy("cx", "cy")
         .agg(F.count(F.lit(1)).alias("n_nbrs"),
              F.sum(d * d).alias("sq_sum")))
    return g.select(F.col("cx").alias("cell_x"),
                    F.col("cy").alias("cell_y"),
                    F.col("n_nbrs").cast("long").alias("n_nbrs"),
                    F.col("sq_sum").cast("long").alias("sq_sum"),
                    F.round(F.sqrt(F.col("sq_sum").cast("double")), 9)
                    .alias("tri"))
