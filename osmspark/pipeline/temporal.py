"""Temporal operators: as-of join and gap sessionization.

Spark has no ASOF JOIN (SPARK-22947 is still open); the reference
surface doesn't either — but any event log flowing through this engine
(the ``events`` table shape: user_id, ts, event_type, value) needs
both, and they are the canonical "custom operator the framework lacks"
case: re-expressed as compositions of built-in DataFrame ops so the
whole thing stays in JVM whole-stage codegen, never a Python UDF.

``asof_join`` — the union-window as-of:

1. Tag both inputs and UNION them (no join at all). The right side's
   payload columns ride along, null on left rows.
2. ONE shuffle, on the equi-key; within each key partition a single
   window sorted by (ts, side) computes
   ``last(payload, ignorenulls=true)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each left row sees
   the most recent right row at or before its timestamp.
3. Filter back to left rows.

Why this shape at 100 TB: the naive formulations are a non-equi range
join (O(n·m) BroadcastNestedLoopJoin unless one side is tiny) or a
"max ts per left row then self-join back" double shuffle. The
union-window is one shuffle + one sort — exactly a sort-merge join's
cost — and AQE's skew-split applies to the sort stage. A key whose
event volume is pathological (one user = half the table) serializes
inside its window partition; shard such keys by time range first
(coarse ts bucket in the key, as-of within bucket, stitch boundaries
with the bucket's last row) — documented, not needed at driver scale.

Tie semantics: ``direction='backward'`` matches right rows with
``r_ts <= l_ts`` (inclusive, like pandas merge_asof and DuckDB ASOF);
equal-timestamp right rows sort BEFORE the left row that consumes
them. Among duplicate (key, ts) right rows the one with the largest
``right_id`` wins — deterministic, pinned by tests.

``sessionize`` — gap-based session assignment:

``lag(ts)`` per user (one shuffle), boundary flag
``(ts - prev_ts) > gap``, running ``sum(flag)`` over the SAME window
spec → session ordinal. Catalyst fuses both window functions into one
Window physical node (same partition + order), so the whole operator
is one shuffle + one sort. Session summaries are a plain groupBy on
(user, session_seq) — partial aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _micros(c: F.Column) -> F.Column:
    """unix_micros over either TIMESTAMP or TIMESTAMP_NTZ (parquet default).

    The NTZ cast goes through the session timezone; this engine pins it
    to UTC (session.get_spark), so the mapping is exact. All uses here are
    DIFFERENCES of two casts, so a non-UTC caller tz cancels anyway
    (outside DST transitions)."""
    return F.unix_micros(c.cast("timestamp"))


__all__ = ["asof_join", "forward_fill", "interval_join", "sessionize",
           "session_stats"]


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              right_id: str | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward') or the earliest with
    ``right_ts >= left_ts`` ('forward'), matching on the ``on`` key.

    ``right_cols`` are the right payload columns to surface (default:
    everything except the key and timestamp), returned with an ``r_``
    prefix (``right_ts`` surfaces as ``r_<right_ts>``). Left rows with
    no match keep nulls (LEFT join semantics). ``tolerance_us`` nulls
    out matches farther than that many microseconds away.

    ``right_id`` breaks ties among duplicate (key, ts) right rows
    (largest id wins for backward, smallest for forward); omit it only
    when (key, ts) is unique on the right.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = list(dict.fromkeys([right_ts, *right_cols]))

    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(left_ts))
    for c in payload:
        l_tag = l_tag.withColumn(f"r_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"r_{c}") for c in payload])
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # backward: right rows sort before left at equal ts so the inclusive
    # frame sees them; forward is the mirror (right after left, first()
    # over the following frame)
    if direction == "backward":
        # equal ts: right (0) before the left row that consumes it; among
        # duplicate right (key, ts) rows id ascends so last() = largest id
        order = [F.col("_ats").asc(), F.col("_side").asc()]
        if right_id is not None:
            order.append(F.when(F.col("_side") == 0,
                                F.col(f"r_{right_id}")).asc_nulls_first())
        w = (Window.partitionBy(on).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        picked = {c: F.last(f"r_{c}", ignorenulls=True).over(w)
                  for c in payload}
    else:
        # equal ts: left (1) before right; right ids ascend so first() =
        # smallest id among duplicate (key, ts) right rows
        order = [F.col("_ats").asc(), F.col("_side").desc()]
        if right_id is not None:
            order.append(F.when(F.col("_side") == 0,
                                F.col(f"r_{right_id}")).asc_nulls_first())
        w = (Window.partitionBy(on).orderBy(*order)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        picked = {c: F.first(f"r_{c}", ignorenulls=True).over(w)
                  for c in payload}

    out = unioned
    for c in payload:
        out = out.withColumn(f"r_{c}", picked[c])
    out = out.filter(F.col("_side") == 1).drop("_side", "_ats")
    if tolerance_us is not None:
        # materialize the flag BEFORE nulling: the first nulled column is
        # the matched timestamp itself, which the gap reads
        gap = F.abs(_micros(F.col(left_ts))
                    - _micros(F.col(f"r_{right_ts}")))
        out = out.withColumn("_far", gap > F.lit(tolerance_us))
        for c in payload:
            out = out.withColumn(
                f"r_{c}",
                F.when(F.col("_far"), F.lit(None)).otherwise(F.col(f"r_{c}")))
        out = out.drop("_far")
    return out


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", order_col: str = "event_id",
               gap_s: int = 1800,
               session_col: str = "session_seq") -> DataFrame:
    """Assign a per-user session ordinal: a new session starts when the
    gap from the previous event exceeds ``gap_s`` seconds.

    ``order_col`` makes the order total under duplicate timestamps (the
    boundary flag itself is order-insensitive among equal ts — the gap
    is 0 — but ``lag`` needs a deterministic frame). Both window
    functions share one (partition, order) spec → one Window node, one
    shuffle."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(order_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull() | (_micros(F.col(ts_col)) - _micros(prev)
                         > gap_s * 1_000_000), 1).otherwise(0)
    return events.withColumn(
        session_col,
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", order_col: str = "event_id",
                  value_col: str = "value", gap_s: int = 1800) -> DataFrame:
    """Per-session summary rows.

    ``value_cents`` sums ``round(value·100)`` as int64 so the result is
    order-insensitive and engine-exact (float summation order is not).
    """
    sess = sessionize(events, user_col, ts_col, order_col, gap_s)
    return (sess.groupBy(F.col(user_col), F.col("session_seq"))
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col(value_col) * 100).cast("long"))
                 .alias("value_cents")))


def interval_join(points: DataFrame, intervals: DataFrame, bucket: int,
                  point_col: str = "t", id_col: str = "id",
                  iv_id_col: str = "iv_id", start_col: str = "t_start",
                  end_col: str = "t_end") -> DataFrame:
    """Range join over an int64 domain: all (id, iv_id) pairs with
    ``start <= point < end`` — the 1-D sibling of ``dwithin_join``'s
    grid bucketing, for the join Spark would otherwise plan as a
    nested-loop range join (events × validity windows, trades ×
    sessions, reads × genomic features).

    ``bucket``: cell width in domain units (pick ≈ the median interval
    length). A point maps to ONE bucket, an interval explodes to
    ``floor(start/b) .. floor((end-1)/b)`` — floor is monotone, so the
    candidate set is complete, and since an interval covers each bucket
    once each true pair joins exactly once (no dedup pass). The exact
    range predicate refines in codegen.

    Degenerate intervals (``end <= start``: empty by the half-open
    contract) are dropped up front — they match nothing, and their
    reversed bucket sequence would otherwise DESCEND.

    Scale: one shuffle each side on the bucket int; long intervals
    inflate only the (small) interval side; a hot bucket (dense cities
    → dense hours) is AQE skew-join territory, same as dwithin.
    Timestamps: pass ``unix_micros(ts)`` (exactly ``epoch_us`` in
    DuckDB) — integer microseconds, no float or timezone ambiguity.
    """
    b = int(bucket)
    pts = points.select(
        F.col(id_col).alias("id"), F.col(point_col).alias("t"),
        F.floor(F.col(point_col) / b).cast("long").alias("_b"))
    ivs = (intervals
           .select(F.col(iv_id_col).alias("iv_id"),
                   F.col(start_col).alias("t_start"),
                   F.col(end_col).alias("t_end"))
           .filter(F.col("t_end") > F.col("t_start"))
           .withColumn("_b", F.explode(F.expr(
               f"sequence(cast(floor(t_start / {b}) as bigint),"
               f"         cast(floor((t_end - 1) / {b}) as bigint))"))))
    return (pts.join(ivs, "_b")
            .filter((F.col("t") >= F.col("t_start"))
                    & (F.col("t") < F.col("t_end")))
            .select("id", "iv_id", "t", "t_start", "t_end"))


def forward_fill(df: DataFrame, key_col: str, ts_col: str,
                 value_col: str, id_col: str | None = None,
                 out_col: str | None = None) -> DataFrame:
    """Per-key forward fill (LOCF — last observation carried forward):
    the time-series gap-filling primitive for sensor/metric streams.
    One window per key — ``last(value, ignorenulls)`` over the
    unbounded-preceding frame; a single Exchange on the key, skew
    bounded by the longest series. Rows before the first observation
    stay NULL (no backfill — that would leak the future).
    ``id_col``: optional tiebreak for duplicate timestamps."""
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col or f"{value_col}_filled",
                         F.last(value_col, ignorenulls=True).over(w))
