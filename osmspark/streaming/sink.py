"""Streaming sink with per-window lineage — the north rule's "killed job
resumes without recomputing completed tiles" applied to the STREAMING
path (C2), closing the gap between the two contracts tested separately in
rounds 1-3: Structured Streaming's checkpoint guarantees the SOURCE
offsets replay after a kill; the idempotent unit layout + lineage table
below guarantee the SINK converges no matter where the kill landed.

Unit = event-time window. In append mode with a watermark a window emits
EXACTLY ONCE (after the watermark passes its end — osm-read's
pause/resume contract has no equivalent; its consumers re-read the whole
file), so a window is a natural resume unit:

* outputs land under ``out_root/unit=<window_start_ms>/`` via DYNAMIC
  partition overwrite — a replayed batch rewrites exactly the partitions
  it carries, byte-identical, and touches nothing else;
* one lineage row per window appends AFTER its data is written, and a
  replayed batch skips rows already present — so (outputs, lineage) are
  consistent under any kill/replay interleaving.

At warehouse scale the same foreachBatch body writes through an Iceberg
``writeTo(...).overwritePartitions()`` instead of the parquet dynamic
overwrite — identical semantics (SURVEY.md §7.0 sandbox note).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from ..state import StateStore

__all__ = ["make_windowed_sink_batch_writer", "sink_windowed_tiles"]


def make_windowed_sink_batch_writer(store: StateStore, out_root: str,
                                    stage: str = "windowed_tiles"):
    """The foreachBatch body, exposed for direct idempotence testing:
    calling it twice with the same batch must leave outputs and lineage
    unchanged (pinned by tests/test_state_streaming.py)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        units = (batch_df
                 .withColumn("unit",
                             (F.col("window_start").cast("double") * 1000)
                             .cast("long")))
        # per-window row counts ride one tiny agg (windows per batch are
        # few; cells per window can be many and stay distributed)
        counts = {r["unit"]: r["n_rows"] for r in
                  units.groupBy("unit")
                  .agg(F.count(F.lit(1)).alias("n_rows")).collect()}
        if not counts:
            return
        (units.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("unit").parquet(out_root))
        done = {r.unit for r in store.completed_units(stage).collect()}
        wall = int((time.time() - t0) * 1000)
        now = int(time.time() * 1000)
        rows = [{"stage": stage, "unit": str(u), "row_count": int(n),
                 "wall_ms": wall, "status": "ok", "finished_at_ms": now}
                for u, n in sorted(counts.items()) if str(u) not in done]
        if rows:
            store.append(rows)

    return write_batch


def sink_windowed_tiles(windowed: DataFrame, store: StateStore,
                        out_root: str, checkpoint_dir: str,
                        stage: str = "windowed_tiles",
                        available_now: bool = True):
    """Run the windowed tile-count stream into the lineage-tracked unit
    layout. ``windowed`` is ``stream_windowed_tile_counts`` output (or
    any append-mode frame with window_start/window_end/cell/n_points).
    Returns the started StreamingQuery; with ``available_now`` the query
    drains the currently-available input and stops — restart with the
    SAME ``checkpoint_dir`` to resume from the committed offsets without
    recomputing emitted windows."""
    writer = make_windowed_sink_batch_writer(store, out_root, stage)
    sq = (windowed.writeStream
          .outputMode("append")
          .option("checkpointLocation", checkpoint_dir)
          .foreachBatch(writer))
    if available_now:
        sq = sq.trigger(availableNow=True)
    return sq.start()
