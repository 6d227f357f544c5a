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


def test_stream_static_dim_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast join: draining the events stream enriched
    with a static user-tier dim must equal the batch join row for row,
    including events whose user has no dim row (left-preserved)."""
    from seoul_big_data_spark.streaming.structured import (
        enrich_stream_with_dim,
        stream_events_from_files,
    )

    events = load(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)
    dim = (
        events.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 3 != 0)  # some users deliberately missing
        .withColumn(
            "tier", F.when(F.col("user_id") % 2 == 0, "gold").otherwise("std")
        )
    )
    stream = stream_events_from_files(
        spark, src, "event_id long, user_id long, event_type string, value double"
    )
    out = enrich_stream_with_dim(stream, dim, "user_id", ["tier"])
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["event_id"], r["tier"]) for r in spark.table("enriched").collect()
    )
    want = sorted(
        (r["event_id"], r["tier"])
        for r in events.join(F.broadcast(dim), "user_id", "left").collect()
    )
    assert got == want
    assert any(t is None for _, t in got)  # left-preservation exercised
