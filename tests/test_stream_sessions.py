"""Stateful streaming sessionization (applyInPandasWithState): closed
sessions match the batch operator; timeouts close idle sessions."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    (spark.createDataFrame(pdf)
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .coalesce(1).write.mode("overwrite").parquet(path))


def test_stream_sessions_match_batch(spark, tmp_path):
    from osmspark.pipeline.temporal import session_stats
    from osmspark.streaming.sessions import stream_sessionize

    src = tmp_path / "events_stream"
    # file 1: each user's first session (in event-time order per user)
    _write_events(spark, str(src / "f1"), [
        (1, 0, "2024-01-01 00:00:00", 1.25),
        (1, 1, "2024-01-01 00:10:00", 2.00),
        (2, 2, "2024-01-01 00:05:00", 4.00),
    ])
    # file 2: second sessions (> 30 min later) + a watermark sentinel
    _write_events(spark, str(src / "f2"), [
        (1, 3, "2024-01-01 02:00:00", 3.00),
        (2, 4, "2024-01-01 03:00:00", 5.00),
        (999, 5, "2024-01-02 00:00:00", 0.0),
    ])
    # file 3: a later sentinel so file-2 sessions' timeouts fire
    _write_events(spark, str(src / "f3"), [
        (999, 6, "2024-01-03 00:00:00", 0.0),
    ])

    stream = (spark.readStream
              .schema("user_id long, event_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = (stream_sessionize(stream, gap_s=1800)
         .writeStream.format("memory").queryName("sessions_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = (spark.table("sessions_out").filter("user_id != 999")
           .orderBy("user_id", "session_start").toPandas())

    batch = spark.createDataFrame(pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_id": [0, 1, 3, 2, 4],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                              "2024-01-01 02:00:00", "2024-01-01 00:05:00",
                              "2024-01-01 03:00:00"]),
        "value": [1.25, 2.0, 3.0, 4.0, 5.0]}))
    exp = (session_stats(batch, gap_s=1800)
           .orderBy("user_id", "session_seq")
           .select("user_id", "session_start", "session_end",
                   "n_events", "value_cents").toPandas())
    assert len(got) == len(exp) == 4
    for c in ["user_id", "session_start", "session_end", "n_events",
              "value_cents"]:
        assert got[c].tolist() == exp[c].tolist(), c


def test_intra_batch_gap_closes_immediately(spark, tmp_path):
    from osmspark.streaming.sessions import stream_sessionize

    src = tmp_path / "ev2"
    # both sessions of user 7 arrive in ONE file: the first must close
    # intra-batch, without any watermark advance
    _write_events(spark, str(src / "f1"), [
        (7, 0, "2024-01-01 00:00:00", 1.0),
        (7, 1, "2024-01-01 05:00:00", 2.0),
    ])
    stream = (spark.readStream
              .schema("user_id long, event_id long, ts timestamp, value double")
              .parquet(str(src / "*")))
    q = (stream_sessionize(stream, gap_s=1800)
         .writeStream.format("memory").queryName("sessions_out2")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("sessions_out2").toPandas()
    assert len(got) == 1
    assert got["n_events"].tolist() == [1]
    assert got["value_cents"].tolist() == [100]
