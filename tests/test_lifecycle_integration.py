"""End-to-end data-lifecycle capstone: snapshot evolution → derived CDC
feed → CDC apply (round trip) → SCD2 history → multi-table transaction
commit → time-travel read-back. Each stage is tested in isolation
elsewhere; this pins that the COMPOSITION holds — the lifecycle a real
warehouse runs nightly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.incremental import (
    commit_transaction,
    read_table_as_of,
)
from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.sources.writers import (
    cdc_apply,
    scd2_apply,
    snapshot_to_cdc,
)


def test_snapshot_cdc_scd2_timetravel_lifecycle(spark, sf_dir, tmp_path):
    cust = load(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # day-0 and day-1 snapshots: some customers change segment, some leave,
    # some arrive (deterministic mod carving)
    day0 = cust.filter(F.col("c_custkey") % 5 != 0)
    day1 = (
        cust.filter(F.col("c_custkey") % 7 != 0)
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
    )

    # 1) derive the change feed between snapshots; applying it must
    #    reproduce day1 exactly (round trip through a DIFFERENT operator)
    feed = snapshot_to_cdc(day0, day1, "c_custkey", seq=1)
    rebuilt = cdc_apply(day0, feed, "c_custkey")
    key = lambda r: (r["c_custkey"], r["c_mktsegment"], r["c_acctbal"])  # noqa: E731
    assert {key(r) for r in rebuilt.collect()} == {
        key(r) for r in day1.collect()
    }

    # 2) SCD2 history from the same evolution
    dim0 = day0.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2024-01-01 00:00:00").alias("valid_from"),
        F.lit("9999-12-31 00:00:00").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    hist = scd2_apply(
        dim0,
        day1.select("c_custkey", "c_mktsegment"),
        "c_custkey",
        ["c_mktsegment"],
        "2024-01-02 00:00:00",
    )
    cur = hist.filter(F.col("is_current"))
    # current view = day1 state, plus keys that vanished from the extract
    # (scd2_apply keeps absent keys open by design — partial extracts must
    # not close out members)
    want_cur = {(r["c_custkey"], r["c_mktsegment"]) for r in day1.collect()}
    vanished = {
        (r["c_custkey"], r["c_mktsegment"])
        for r in day0.join(
            day1.select("c_custkey"), "c_custkey", "left_anti"
        ).collect()
    }
    assert {
        (r["c_custkey"], r["c_mktsegment"]) for r in cur.collect()
    } == want_cur | vanished
    # every MOVED customer that existed on day0 carries a closed prior row
    moved_with_history = hist.filter(
        (F.col("c_mktsegment") != "MOVED") & ~F.col("is_current")
    ).select("c_custkey").distinct()
    moved_expected = (
        day0.join(day1.filter(F.col("c_mktsegment") == "MOVED"), "c_custkey")
        .select("c_custkey")
        .distinct()
    )
    assert (
        moved_expected.exceptAll(moved_with_history).count() == 0
    )

    # 3) commit both artifacts atomically and read back via time travel
    snap_dir = str(tmp_path / "snap")
    hist_dir = str(tmp_path / "hist")
    rebuilt.write.parquet(snap_dir)
    hist.write.parquet(hist_dir)
    files = lambda d: [  # noqa: E731
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]
    txn = str(tmp_path / "txn")
    v = commit_transaction(
        txn, {"customer_snapshot": files(snap_dir), "customer_history": files(hist_dir)}
    )
    got_snap = read_table_as_of(spark, txn, "customer_snapshot", v)
    got_hist = read_table_as_of(spark, txn, "customer_history", v)
    assert got_snap.count() == day1.count()
    assert got_hist.filter(F.col("is_current")).count() == len(
        want_cur | vanished
    )
