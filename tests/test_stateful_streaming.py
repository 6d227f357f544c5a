"""applyInPandasWithState: per-user running totals across micro-batches."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.streaming.stateful import running_user_totals


def test_running_user_totals_matches_batch(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # two files → at least one micro-batch boundary exercises state carry-over
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    schema_ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema_ddl).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        # update mode emits one row per user per micro-batch: the LAST row
        # per user is the final running total
        got = (
            spark.table("user_totals")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
            )
            .collect()
        )
        expect = {
            r["user_id"]: (r["n"], r["s"])
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert len(got) == len(expect)
        for r in got:
            n, s = expect[r["user_id"]]
            assert r["n_events"] == n
            assert math.isclose(r["total_value"], s, rel_tol=1e-9)
    finally:
        q.stop()


def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    """transformWithState twin: same running totals, new typed-state API.

    The TWS state-server protocol speaks protobuf between the JVM and the
    Python driver worker; this container ships no google.protobuf, so the
    runtime path only executes on a real deployment. The operator itself is
    plain public PySpark API (no extra deps) — skip, don't xfail."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs protobuf for its state server",
    )

    from seoul_big_data_spark.streaming.stateful import running_user_totals_tws

    events = load(spark, "events", sf_dir)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    schema_ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema_ddl).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("user_totals_tws")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        got = (
            spark.table("user_totals_tws")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
            )
            .collect()
        )
        expect = {
            r["user_id"]: (r["n"], r["s"])
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert len(got) == len(expect)
        for r in got:
            n, s = expect[r["user_id"]]
            assert r["n_events"] == n
            assert math.isclose(r["total_value"], s, rel_tol=1e-9)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_transform_with_state_plan_builds(spark, sf_dir, tmp_path):
    """Even without protobuf (no runtime path in this container), the
    transformWithState logical plan must build and resolve its output
    schema — catches API-signature drift against future Spark versions."""
    from seoul_big_data_spark.streaming.stateful import running_user_totals_tws

    events = load(spark, "events", sf_dir)
    src = str(tmp_path / "src")
    events.limit(10).write.parquet(src)
    schema_ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema_ddl).parquet(src)
    out = running_user_totals_tws(stream)
    assert out.isStreaming
    assert out.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,total_value:double>"
    )
