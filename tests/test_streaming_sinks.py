"""Streaming sinks: idempotent foreachBatch, watermark dedup, and the
watermarked stream-stream interval join (streaming/sinks.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.streaming.sinks import (
    dedup_within_watermark,
    enriched_stream_stream_join,
    foreach_batch_idempotent,
)

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _two_file_stream(spark, events, tmp_path, name="src"):
    src = str(tmp_path / name)
    if not os.path.isdir(src):
        events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
        events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    return spark.readStream.schema(EVENTS_DDL).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)


def test_foreach_batch_idempotent_partitions_and_rerun(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir)
    stream = _two_file_stream(spark, events, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        foreach_batch_idempotent(stream, out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one batch_id=N directory per micro-batch, union == full input
    parts = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "batch_id=*"))
    )
    assert parts == ["batch_id=0", "batch_id=1"]
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()

    # re-running from the SAME checkpoint is a no-op (no new batches, no
    # duplicated rows) — the exactly-once contract across restarts
    stream2 = _two_file_stream(spark, events, tmp_path)  # same source dir
    q2 = (
        foreach_batch_idempotent(stream2, out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == events.count()


def test_dedup_within_watermark_drops_cross_batch_dupes(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir).limit(200).cache()
    src = str(tmp_path / "src")
    # write the SAME rows twice as two files → duplicates arrive in a later
    # micro-batch; watermark dedup must drop every one of them
    events.write.parquet(src)
    events.write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENTS_DDL).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = dedup_within_watermark(stream, ["event_id"], "ts", "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_wm")
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_stream_join_matches_batch_interval_join(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir).limit(2000).cache()
    imps = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    imps.write.parquet(str(tmp_path / "imp"))
    clicks.write.parquet(str(tmp_path / "clk"))
    s_imp = spark.readStream.schema(EVENTS_DDL).parquet(str(tmp_path / "imp"))
    s_clk = spark.readStream.schema(EVENTS_DDL).parquet(str(tmp_path / "clk"))
    joined = enriched_stream_stream_join(s_imp, s_clk, max_delay="30 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["imp_id"], r["click_id"]) for r in spark.table("ss_join").collect()
    }
    expect = {
        (r["imp_id"], r["click_id"])
        for r in imps.alias("i")
        .join(
            clicks.alias("c"),
            (F.col("i.user_id") == F.col("c.user_id"))
            & (F.col("i.ts") < F.col("c.ts"))
            & (F.col("i.ts") >= F.col("c.ts") - F.expr("INTERVAL 30 minutes")),
        )
        .select(
            F.col("i.event_id").alias("imp_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .collect()
    }
    assert got == expect
    assert expect  # non-degenerate: the batch oracle itself found matches


def test_stream_stream_left_outer_emits_unmatched_clicks(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join parity vs the batch left join.

    Outer (NULL) results flush only on a trigger AFTER the watermark has
    passed a click's candidate window — so each side is written as an
    early/late file pair and processed one file per trigger: the late
    batch advances the watermark and flushes the early batch's unmatched
    clicks. Clicks within (wm + delay) of the split or in the late batch
    may legitimately still be buffered at query end; everything else must
    appear, matched rows exactly as the batch oracle says."""
    from seoul_big_data_spark.streaming.sinks import clicks_left_outer_attribution

    events = load(spark, "events", sf_dir).limit(2000).cache()
    split = events.agg(
        F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")
    ).first()[0]
    split_ts = F.lit(split).cast("timestamp")
    imps = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    for side, df in (("imp", imps), ("clk", clicks)):
        df.filter(F.col("ts") < split_ts).coalesce(1).write.parquet(
            str(tmp_path / side / "t=0")
        )
        df.filter(F.col("ts") >= split_ts).coalesce(1).write.parquet(
            str(tmp_path / side / "t=1")
        )
    opts = {"maxFilesPerTrigger": "1"}
    s_imp = (
        spark.readStream.schema(EVENTS_DDL)
        .options(**opts)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "imp"))
    )
    s_clk = (
        spark.readStream.schema(EVENTS_DDL)
        .options(**opts)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "clk"))
    )
    joined = clicks_left_outer_attribution(s_imp, s_clk, max_delay="30 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_left")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["imp_id"]) for r in spark.table("ss_left").collect()
    }
    expect = {
        (r["click_id"], r["imp_id"])
        for r in clicks.alias("c")
        .join(
            imps.alias("i"),
            (F.col("i.user_id") == F.col("c.user_id"))
            & (F.col("i.ts") < F.col("c.ts"))
            & (F.col("i.ts") >= F.col("c.ts") - F.expr("INTERVAL 30 minutes")),
            "leftOuter",
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("i.event_id").alias("imp_id"),
        )
        .collect()
    }
    matched = {p for p in expect if p[1] is not None}
    unmatched = {p for p in expect if p[1] is None}
    assert matched and unmatched  # fixture exercises both paths
    # every inner match present, nothing fabricated
    assert {p for p in got if p[1] is not None} == matched
    # emitted NULL rows are exactly batch-unmatched clicks
    null_ids = {c for (c, i) in got if i is None}
    assert null_ids <= {c for (c, i) in unmatched}
    assert null_ids  # the late trigger flushed early unmatched clicks
    # anything still missing must have been legitimately bufferable:
    # in the late batch, or within the (wm + delay) horizon of the split
    still_open = {
        r["event_id"]
        for r in clicks.filter(
            F.col("ts") >= split_ts - F.expr("INTERVAL 90 minutes")
        ).collect()
    }
    missing = {c for (c, i) in unmatched if (c, None) not in got}
    assert missing <= still_open


def test_txn_sink_atomic_and_replay_safe(spark, sf_dir, tmp_path):
    """Streaming foreachBatch through the multi-table transaction: fact
    rows and the audit record commit atomically per batch; a replayed
    batch id is a no-op; a crash-before-commit replay (staged files
    written, no manifest) commits exactly once."""
    import os

    from seoul_big_data_spark.streaming.sinks import txn_sink_fn
    from seoul_big_data_spark.sources.incremental import read_table_as_of

    events = load(spark, "events", sf_dir).limit(300).cache()
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    txn = str(tmp_path / "txn")
    data = str(tmp_path / "data")
    sink = txn_sink_fn(txn, data)
    q = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fact = read_table_as_of(spark, txn, "fact")
    audit = read_table_as_of(spark, txn, "audit")
    assert fact.count() == events.count()
    n_batches = audit.count()
    assert n_batches >= 2  # one-file triggers → multiple commits
    # audit reconciles with fact per batch id — the cross-table invariant
    assert audit.agg(F.sum("n_rows")).first()[0] == events.count()

    # replay an already-committed batch id → nothing changes
    sink(events.limit(50), 0)
    assert read_table_as_of(spark, txn, "fact").count() == events.count()
    assert read_table_as_of(spark, txn, "audit").count() == n_batches

    # crash-before-commit: stage a new batch's files manually (simulating
    # a run that died pre-commit), then deliver the batch → exactly once
    replay_df = events.limit(20)
    bid = 999
    replay_df.write.mode("overwrite").parquet(
        os.path.join(data, f"fact_batch_{bid}")
    )
    sink(replay_df, bid)
    assert (
        read_table_as_of(spark, txn, "fact").count() == events.count() + 20
    )
    sink(replay_df, bid)  # second delivery: short-circuits
    assert (
        read_table_as_of(spark, txn, "fact").count() == events.count() + 20
    )
