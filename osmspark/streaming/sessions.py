"""Stateful streaming sessionization — the custom stateful operator the
built-in windowed aggregations can't express (session windows keyed by
inactivity gap, not fixed boundaries).

``applyInPandasWithState`` over ``groupBy(user)``: per-user state holds
ONLY the open session's aggregate (start, last, count, cents) — O(users)
state, never a buffer of raw events. Sessions close two ways:

- intra-batch: a gap > ``gap_s`` between consecutive events of one
  Arrow batch closes the earlier session immediately;
- event-time timeout: when the watermark passes ``last + gap``, the
  open session can never be extended (any extender would be later than
  watermark-late and dropped), so it closes exactly once.

Exactness contract (pinned by tests against the batch operator): closed
sessions equal ``session_stats`` output when each user's events arrive
in event-time order across batches (the common per-key ordering of a
partitioned log, e.g. kafka per-key ordering). An out-of-order event
INSIDE the watermark that lands after its session's successor started
would extend the wrong session — exact out-of-order sessionization
needs buffering events until the watermark passes them (O(lateness)
state); this operator deliberately trades that for O(1) per-key state,
like Spark's own ``session_window`` in update mode.

Value is summed as integer cents — identical to the batch operator, so
results compare exactly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["stream_sessionize", "SESSION_OUT_SCHEMA"]

SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_cents", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("cents", T.LongType()),
])


def _session_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
            yield _emit(user_id, closed)
            return

        cur = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts")
            # normalize to us regardless of pandas datetime unit (ns/us)
            ts_us = pdf["ts"].to_numpy().astype("datetime64[us]") \
                .astype("int64")
            cents = pd.Series(pdf["value"] * 100).round().astype("int64") \
                .to_numpy()
            for t, c in zip(ts_us.tolist(), cents.tolist()):
                if cur is None:
                    cur = (t, t, 1, c)
                elif t - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (t, t, 1, c)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + c)
        if cur is not None:
            state.update(cur)
            # close when the watermark passes last + gap; timeout must be
            # strictly beyond the current watermark or Spark rejects it
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] // 1000 + gap_s * 1000,
                                          wm_ms + 1))
        yield _emit(user_id, closed)

    return fn


def _emit(user_id: int, closed: list[tuple[int, int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
        "session_start": pd.to_datetime(
            pd.Series([c[0] for c in closed], dtype="int64"), unit="us"),
        "session_end": pd.to_datetime(
            pd.Series([c[1] for c in closed], dtype="int64"), unit="us"),
        "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
        "value_cents": pd.Series([c[3] for c in closed], dtype="int64"),
    })


def stream_sessionize(events_stream: DataFrame, gap_s: int = 1800,
                      watermark: str = "0 seconds") -> DataFrame:
    """Closed sessions (append mode) from a streaming events frame with
    (user_id, ts, value) columns. One stateful shuffle on user_id; state
    is one aggregate row per open session."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.col("user_id"))
            .applyInPandasWithState(
                _session_fn(gap_s), SESSION_OUT_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
