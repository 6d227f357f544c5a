"""Streaming session_window parity: draining the events table through a
file stream with availableNow must carve exactly the sessions the batch
session_window produces (complete mode so the watermark never drops
in-range data at the end of input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.streaming.structured import (
    run_available_now,
    session_rollup_stream,
    stream_events_from_files,
)


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir)
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    schema_ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = stream_events_from_files(spark, src, schema_ddl)
    q = run_available_now(
        session_rollup_stream(stream),
        str(tmp_path / "ckpt"),
        query_name="sessions_stream",
    )
    try:
        got = sorted(
            (r["user_id"], str(r["session_start"]), r["n_events"], r["session_value"])
            for r in spark.table("sessions_stream").collect()
        )
        expect = sorted(
            (r["user_id"], str(r["session_start"]), r["n_events"], r["session_value"])
            for r in (
                events.groupBy(
                    F.session_window("ts", "30 minutes").alias("w"), "user_id"
                )
                .agg(
                    F.count("*").alias("n_events"),
                    F.round(F.sum("value"), 2).alias("session_value"),
                )
                .select(
                    "user_id",
                    F.col("w.start").alias("session_start"),
                    "n_events",
                    "session_value",
                )
            ).collect()
        )
        assert got == expect
        assert len(got) > 0
    finally:
        q.stop()
