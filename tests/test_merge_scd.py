"""MERGE upsert/delete and SCD2 dimension-history operators
(sources/writers.py — the Delta/Iceberg-style mutation surface expressed
over immutable parquet frames)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seoul_big_data_spark.sources.writers import merge_upsert, scd2_apply


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -500.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, bal double",
    )


def test_merge_upsert_update_insert_delete(spark, target):
    source = spark.createDataFrame(
        [(2, "b2", -450.0),  # matched + delete condition (negative balance)
         (3, "c2", 99.0),    # matched → update
         (9, "new", 1.0)],   # not matched → insert
        "k int, name string, bal double",
    )
    out = merge_upsert(
        target, source, "k", delete_condition=F.col("_src_bal") < 0
    )
    got = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("a", 10.0),      # untouched
        3: ("c2", 99.0),     # updated
        4: ("d", 40.0),      # untouched
        9: ("new", 1.0),     # inserted
    }                        # 2 deleted


def test_merge_upsert_null_delete_condition_updates_not_deletes(spark, target):
    """SQL MERGE: a NULL delete predicate is NOT satisfied → the matched row
    is updated, not silently dropped (regression: NULL propagated through the
    filter and deleted the row)."""
    tgt = target.unionByName(
        spark.createDataFrame([(5, "e", None)], "k int, name string, bal double")
    )
    source = spark.createDataFrame(
        [(5, "e2", None)], "k int, name string, bal double"
    )
    out = merge_upsert(tgt, source, "k", delete_condition=F.col("_src_bal") < 0)
    row = out.filter(F.col("k") == 5).collect()
    assert len(row) == 1 and row[0]["name"] == "e2" and row[0]["bal"] is None


def test_merge_upsert_schema_mismatch_raises(spark, target):
    bad = target.select("k", "name")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, bad, "k")


def test_merge_upsert_null_update_value_wins(spark, target):
    """MERGE semantics: source row wins wholesale, even with nulls —
    unlike merge_update's per-column coalesce."""
    source = spark.createDataFrame(
        [(1, None, 11.0)], "k int, name string, bal double"
    )
    out = merge_upsert(target, source, "k")
    row = out.filter(F.col("k") == 1).first()
    assert row["name"] is None and row["bal"] == 11.0


def _dim(spark, rows):
    return (
        spark.createDataFrame(
            rows,
            "k int, name string, valid_from string, valid_to string,"
            " is_current boolean",
        )
        .withColumn("valid_from", F.col("valid_from").cast("timestamp"))
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    )


def test_scd2_change_new_delete_unchanged(spark):
    eot = "9999-12-31 00:00:00"
    dim = _dim(
        spark,
        [
            (1, "alpha", "2020-01-01 00:00:00", eot, True),
            (2, "beta", "2020-01-01 00:00:00", eot, True),
            (3, "gamma", "2020-01-01 00:00:00", eot, True),
            # pre-existing history row must pass through untouched
            (2, "beta_v0", "2019-01-01 00:00:00", "2020-01-01 00:00:00", False),
        ],
    )
    snapshot = spark.createDataFrame(
        [(1, "alpha"),        # unchanged
         (2, "beta_v2"),      # changed → close + reopen
         (9, "iota")],        # new key → open; key 3 absent → kept current
        "k int, name string",
    )
    out = scd2_apply(dim, snapshot, "k", ["name"], "2021-06-01 00:00:00")
    rows = {(r["k"], r["name"]): r for r in out.collect()}
    assert len(rows) == 6
    # unchanged row stays current with original valid_from
    r1 = rows[(1, "alpha")]
    assert r1["is_current"] and str(r1["valid_from"]).startswith("2020-01-01")
    # changed: old version closed at load_ts, new version opened
    old2 = rows[(2, "beta")]
    assert not old2["is_current"] and str(old2["valid_to"]).startswith("2021-06-01")
    new2 = rows[(2, "beta_v2")]
    assert new2["is_current"] and str(new2["valid_from"]).startswith("2021-06-01")
    # deleted key keeps its current row (soft behavior, documented)
    assert rows[(3, "gamma")]["is_current"]
    # brand-new key opened
    r9 = rows[(9, "iota")]
    assert r9["is_current"] and str(r9["valid_from"]).startswith("2021-06-01")
    # history passthrough
    assert not rows[(2, "beta_v0")]["is_current"]


def test_scd2_null_shift_detected_as_change(spark):
    """(NULL,'x') → ('x',NULL) is a real change and NULL vs '' is a real
    change — per-column eqNullSafe must catch both (regression: a single
    concat_ws comparison skipped nulls and conflated them)."""
    eot = "9999-12-31 00:00:00"
    dim = (
        spark.createDataFrame(
            [
                (1, None, "x", "2020-01-01 00:00:00", eot, True),
                (2, None, "y", "2020-01-01 00:00:00", eot, True),
            ],
            "k int, a string, b string, valid_from string, valid_to string,"
            " is_current boolean",
        )
        .withColumn("valid_from", F.col("valid_from").cast("timestamp"))
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    )
    snapshot = spark.createDataFrame(
        [(1, "x", None),   # null shifted across columns
         (2, "", "y")],    # NULL vs '' on column a
        "k int, a string, b string",
    )
    out = scd2_apply(dim, snapshot, "k", ["a", "b"], "2021-06-01 00:00:00")
    cur = {r["k"]: r for r in out.filter(F.col("is_current")).collect()}
    assert cur[1]["a"] == "x" and cur[1]["b"] is None
    assert str(cur[1]["valid_from"]).startswith("2021-06-01")
    assert cur[2]["a"] == "" and str(cur[2]["valid_from"]).startswith("2021-06-01")
    # both old versions closed
    assert out.filter(~F.col("is_current")).count() == 2


def test_scd2_idempotent_on_same_snapshot(spark):
    """Re-applying the identical snapshot must be a no-op (no spurious
    close/reopen churn) — the property that makes daily loads safe."""
    eot = "9999-12-31 00:00:00"
    dim = _dim(spark, [(1, "alpha", "2020-01-01 00:00:00", eot, True)])
    snapshot = spark.createDataFrame([(1, "alpha")], "k int, name string")
    once = scd2_apply(dim, snapshot, "k", ["name"], "2021-01-01 00:00:00")
    twice = scd2_apply(once, snapshot, "k", ["name"], "2021-02-01 00:00:00")
    assert twice.count() == 1
    r = twice.first()
    assert r["is_current"] and str(r["valid_from"]).startswith("2020-01-01")


def test_cdc_apply_latest_op_wins(spark):
    from seoul_big_data_spark.sources.writers import cdc_apply

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1), (1, "a2", "U", 2),   # latest U wins
            (2, None, "D", 1), (2, "b2", "U", 2),   # U after D → row survives
            (3, None, "D", 5),                        # plain delete
            (9, "i9", "I", 1),                        # insert new key
            (10, None, "D", 1),                       # delete of absent key: no-op
        ],
        "k int, v string, op string, seq int",
    )
    out = {r["k"]: r["v"] for r in cdc_apply(target, changes, "k").collect()}
    assert out == {1: "a2", 2: "b2", 9: "i9"}


def test_cdc_apply_equal_seq_tiebreak_deterministic(spark):
    from seoul_big_data_spark.sources.writers import cdc_apply

    target = spark.createDataFrame([(1, "a")], "k int, v string")
    changes = spark.createDataFrame(
        [(1, None, "D", 7), (1, "u", "U", 7)], "k int, v string, op string, seq int"
    )
    # documented tie-break: op descending → 'U' beats 'D' on equal seq
    out = cdc_apply(target, changes, "k").collect()
    assert len(out) == 1 and out[0]["v"] == "u"


def test_snapshot_to_cdc_roundtrip(spark, sf_dir):
    """cdc_apply(old, snapshot_to_cdc(old, new)) must reproduce new exactly
    — inserts, updates, deletes, and untouched keys."""
    from pyspark.sql import functions as F

    from seoul_big_data_spark.sources.tables import load
    from seoul_big_data_spark.sources.writers import cdc_apply, snapshot_to_cdc

    o = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 113 != 0)
    new = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.round(F.col("o_totalprice") + 10.0, 2),
        ).otherwise(F.col("o_totalprice")),
    )
    feed = snapshot_to_cdc(old, new, "o_orderkey")
    ops = {r["op"] for r in feed.select("op").distinct().collect()}
    assert ops == {"I", "U", "D"}
    applied = cdc_apply(old, feed, "o_orderkey")
    got = sorted(map(tuple, applied.collect()))
    expect = sorted(map(tuple, new.collect()))
    assert got == expect


def test_compact_small_files(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from seoul_big_data_spark.sources.tables import load
    from seoul_big_data_spark.sources.writers import compact_small_files

    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "frag")
    o.repartition(32).write.parquet(path)
    import glob

    before_files = len(glob.glob(path + "/*.parquet"))
    before_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    after_files = compact_small_files(spark, path, target_bytes=1 << 30)
    assert after_files < before_files
    assert after_files == 1
    after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after_rows == before_rows
