"""Structured Streaming parity: the batch hourly rollup runs unchanged as a
watermarked stream and produces the same result (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.streaming.batch_windows import hourly_rollup
from seoul_big_data_spark.streaming.structured import (
    hourly_rollup_stream,
    run_available_now,
    stream_events_from_files,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    # land the events table as stream input files (microsecond ts — the
    # engine's canonical event-time type)
    events = load(spark, "events", sf_dir)
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    events.write.parquet(src)
    schema_ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = stream_events_from_files(spark, src, schema_ddl)
    assert stream.isStreaming
    q = run_available_now(hourly_rollup_stream(stream), ckpt, "rollup_test")
    try:
        got = spark.table("rollup_test")
        batch = hourly_rollup(events)
        assert got.count() == batch.count()
        # order-insensitive frame equality
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    finally:
        q.stop()
