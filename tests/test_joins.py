"""Join operators (operators/joins.py) — as-of join semantics and stability.

The as-of join is the union-and-window shape (SCALE.md): one shuffle on the
key, no row-id self-join, so results are deterministic regardless of input
partitioning (regression: monotonically_increasing_id was evaluated in two
plan branches and could diverge after a shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators.joins import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:00:00", 1),
            ("a", "2024-01-01 12:00:00", 2),
            ("a", "2024-01-01 09:00:00", 3),  # before any right row
            ("b", "2024-01-01 11:00:00", 4),
        ],
        "k string, ts string, payload int",
    )
    right = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:00:00", 100.0),  # equal ts matches
            ("a", "2024-01-01 11:30:00", 200.0),
            ("b", "2024-01-01 10:30:00", 300.0),
        ],
        "k string, rts string, px double",
    )
    return left, right


def test_asof_basic_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "rts", ["px"])
    got = {r["payload"]: r["asof_px"] for r in out.collect()}
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: 300.0}
    assert set(out.columns) == {"k", "ts", "payload", "asof_px"}


def test_asof_stable_after_repartition(spark):
    """Same answer on shuffled/odd-partitioned inputs — the property the
    row-id-based implementation could not guarantee."""
    left, right = _frames(spark)
    out1 = asof_join(left, right, "k", "ts", "rts", ["px"])
    out2 = asof_join(
        left.repartition(7, "payload"), right.repartition(5), "k", "ts", "rts", ["px"]
    )
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))
    assert out2.count() == left.count()  # every left row preserved exactly once


def test_banded_range_join_matches_nested_loop(spark):
    """The binned equi-join must produce exactly the broadcast-nested-loop
    result — including boundary values (half-open intervals), intervals
    spanning many bins, open-ended sentinels, and empty intervals."""
    from seoul_big_data_spark.operators.joins import banded_range_join, range_join

    vals = [0.0, 99.999, 100.0, 100.001, 250.0, 499.9, 500.0, 1234.5, 7.25]
    fact = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    iv = spark.createDataFrame(
        [
            ("low", 0.0, 100.0),
            ("mid", 100.0, 500.0),
            ("wide", 50.0, 1300.0),       # spans 13 bins, overlaps others
            ("open", 500.0, 1e18),        # open-ended sentinel
            ("empty", 900.0, 900.0),      # zero-width: matches nothing
        ],
        "name string, lo double, hi double",
    )
    expect = range_join(fact, iv, F.col("v"), F.col("lo"), F.col("hi"))
    got = banded_range_join(
        fact, iv, F.col("v"), F.col("lo"), F.col("hi"),
        band_width=100.0, vmin=min(vals), vmax=max(vals),
    )
    key = lambda r: (r["i"], r["name"])
    assert sorted(map(key, got.collect())) == sorted(map(key, expect.collect()))
    # exactly-once: no pair duplicated by the replication
    assert got.count() == got.select("i", "name").distinct().count()


def test_join_strategy_hints_control_physical_operator(spark, sf_dir):
    """Join hints must actually steer the physical strategy: shuffle_hash
    → ShuffledHashJoin, merge → SortMergeJoin, broadcast → BroadcastHash.
    Same logical join all three ways; results identical."""
    from seoul_big_data_spark.sources.tables import load

    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    cond = F.col("c_custkey") == F.col("o_custkey")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    sh = o.join(c.hint("shuffle_hash"), cond).groupBy("c_mktsegment").count()
    mg = o.join(c.hint("merge"), cond).groupBy("c_mktsegment").count()
    bc = o.join(F.broadcast(c), cond).groupBy("c_mktsegment").count()
    assert "ShuffledHashJoin" in plan(sh)
    assert "SortMergeJoin" in plan(mg)
    assert "BroadcastHashJoin" in plan(bc)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(sh) == rows(mg) == rows(bc)
