"""Checkpoint/resume (lineage) + streaming decode tests."""

import pyspark.sql.functions as F
import pytest

from osmspark.state import StateStore, run_stage


def test_resume_skips_completed_units(spark, tmp_path, pages_df):
    from osmspark.pbf.source import nodes_from_pages

    store = StateStore(spark, str(tmp_path / "state"))
    nodes = nodes_from_pages(pages_df)

    calls = []

    def compute(unit):
        calls.append(unit)
        return nodes.filter(F.col("url").endswith(f"/{unit}"))

    units = ["0", "2", "3"]
    r1 = run_stage(store, "pertile", units, compute,
                   out_root=str(tmp_path / "out"))
    assert r1["computed"] == units and r1["skipped"] == []

    # "kill and restart": same stage again → all units skipped, no recompute
    calls.clear()
    r2 = run_stage(store, "pertile", units, compute,
                   out_root=str(tmp_path / "out"))
    assert r2["computed"] == [] and sorted(r2["skipped"]) == units
    assert calls == []

    # extend with one new unit → only that one computes
    r3 = run_stage(store, "pertile", units + ["4"], compute,
                   out_root=str(tmp_path / "out"))
    assert r3["computed"] == ["4"]

    # lineage metrics: row counts add up to decoded rows per unit
    met = store.metrics("pertile").collect()[0]
    assert met.n_units == 4
    expected = nodes.filter(
        F.col("url").rlike("/(0|2|3|4)$")).count()
    assert met.total_rows == expected


def test_lineage_rows_are_append_only(spark, tmp_path, pages_df):
    store = StateStore(spark, str(tmp_path / "state2"))
    store.append([{"stage": "s", "unit": "u1", "row_count": 10,
                   "wall_ms": 5, "status": "ok", "finished_at_ms": 1}])
    store.append([{"stage": "s", "unit": "u2", "row_count": 20,
                   "wall_ms": 5, "status": "ok", "finished_at_ms": 2}])
    assert store.lineage().count() == 2
    assert {r.unit for r in store.completed_units("s").collect()} == {"u1", "u2"}


def test_streaming_decode_counts(spark, tmp_path, pages_df):
    """Micro-batch streaming decode == batch decode (maxFilesPerTrigger
    backpressure = the reference's pause/resume analogue)."""
    from osmspark.pbf.source import nodes_from_pages
    from osmspark.streaming import stream_nodes, stream_pages

    src = str(tmp_path / "pages_stream")
    pages_df.repartition(3).write.mode("overwrite").parquet(src)
    batch_count = nodes_from_pages(spark.read.parquet(src)).count()

    nodes = stream_nodes(stream_pages(spark, src, max_files_per_trigger=1))
    q = (nodes.writeStream.format("memory").queryName("nodes_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.sql("SELECT count(*) FROM nodes_stream").collect()[0][0]
    assert got == batch_count
    # more than one micro-batch ran (block-granularity progress)
    assert len(q.recentProgress) >= 2
