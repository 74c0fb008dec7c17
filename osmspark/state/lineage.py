"""Checkpointed, resumable stage execution with per-partition lineage.

North rule: "every stage checkpoints per-partition lineage + row-count
metrics to Iceberg so a killed job resumes without recomputing completed
tiles". No Iceberg runtime jar exists in this sandbox (SURVEY.md §7.0), so
the state store is an Iceberg-style parquet layout — an append-only
``lineage`` table plus idempotent per-unit output directories; the same
DataFrame code would write through an Iceberg catalog in production
(swap ``_write_parquet`` for ``writeTo(...).append()``).

Model: a *stage* processes independent *units* (e.g. one unit = one tile
bucket / one page shard). ``run_stage`` computes only units missing from
the lineage table (``left_anti`` join), writes each unit's output under
``out/unit=<id>/``, then appends (stage, unit, row_count, wall_ms,
status) to the lineage table. Re-running after a kill skips completed
units — verified by tests/test_state.py.
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType([
    T.StructField("stage", T.StringType(), False),
    T.StructField("unit", T.StringType(), False),
    T.StructField("row_count", T.LongType(), False),
    T.StructField("wall_ms", T.LongType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("finished_at_ms", T.LongType(), False),
])

__all__ = ["StateStore", "run_stage"]


@dataclass
class StateStore:
    """Parquet-backed lineage + metrics tables under ``root``."""

    spark: SparkSession
    root: str

    @property
    def lineage_path(self) -> str:
        return os.path.join(self.root, "lineage")

    def lineage(self) -> DataFrame:
        if not os.path.exists(self.lineage_path):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_path)

    def completed_units(self, stage: str) -> DataFrame:
        return (self.lineage()
                .filter((F.col("stage") == stage) & (F.col("status") == "ok"))
                .select("unit").distinct())

    def append(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [(r["stage"], r["unit"], r["row_count"], r["wall_ms"],
              r["status"], r["finished_at_ms"]) for r in rows],
            LINEAGE_SCHEMA)
        df.write.mode("append").parquet(self.lineage_path)

    def metrics(self, stage: str | None = None) -> DataFrame:
        lin = self.lineage()
        if stage:
            lin = lin.filter(F.col("stage") == stage)
        return (lin.groupBy("stage")
                .agg(F.count(F.lit(1)).alias("n_units"),
                     F.sum("row_count").alias("total_rows"),
                     F.sum("wall_ms").alias("total_wall_ms")))


def run_stage(store: StateStore, stage: str, units: list[str],
              compute_unit, out_root: str | None = None,
              write: bool = True, max_workers: int = 8) -> dict:
    """Execute ``compute_unit(unit) -> DataFrame`` for every unit not yet
    completed; idempotent outputs under ``out_root/unit=<unit>``.

    Returns {"computed": [...], "skipped": [...]} — a killed-and-restarted
    job recomputes nothing that finished. Unit outputs overwrite their own
    directory only, so a unit killed mid-write is safely re-run.

    Pending units are submitted from a driver thread pool
    (``max_workers`` concurrent Spark jobs — Spark's scheduler runs jobs
    from multiple threads concurrently), so at 10^4 tiles the wall-clock
    is bounded by executor capacity, not units × job-launch latency. The
    resume contract is unchanged: each unit's lineage row appends (under
    a lock — the parquet append is small and serializing it avoids
    committer staging-dir races) only AFTER its output is fully written,
    so a kill mid-flight loses only in-flight units. A failing unit
    raises after the in-flight units drain; queued not-yet-started units
    are CANCELLED (``shutdown(cancel_futures=True)``), and no lineage row
    is written for the failed or cancelled units, so the rerun recomputes
    exactly the failed + cancelled + unfinished set (pinned by
    tests/test_state_streaming.py::test_run_stage_failure_cancels_queued).
    """
    done = {r.unit for r in store.completed_units(stage).collect()}
    pending = [u for u in units if u not in done]
    skipped = [u for u in units if u in done]
    append_lock = threading.Lock()
    stop = threading.Event()  # set by the first failure: queued units bail

    def _run(unit: str) -> str:
        if stop.is_set():
            raise RuntimeError(
                f"unit {unit} cancelled: an earlier unit failed")
        t0 = time.time()
        try:
            df = compute_unit(unit)
            if write:
                path = os.path.join(out_root or store.root, stage,
                                    f"unit={unit}")
                df.write.mode("overwrite").parquet(path)
                n = store.spark.read.parquet(path).count()
            else:
                n = df.count()
        except BaseException:
            stop.set()  # fail fast: units the pool hasn't started yet bail
            raise
        with append_lock:
            store.append([{
                "stage": stage, "unit": unit, "row_count": int(n),
                "wall_ms": int((time.time() - t0) * 1000), "status": "ok",
                "finished_at_ms": int(time.time() * 1000)}])
        return unit

    finished: set[str] = set()
    if pending:
        pool = ThreadPoolExecutor(max_workers=min(max_workers, len(pending)))
        try:
            futures = [pool.submit(_run, u) for u in pending]
            for fut in as_completed(futures):
                finished.add(fut.result())
        finally:
            # first failure: in-flight units drain (their lineage rows
            # commit), queued units never start — the docstring contract
            pool.shutdown(wait=True, cancel_futures=True)
    return {"computed": [u for u in units if u in finished],
            "skipped": skipped}
