"""Incremental rollup maintenance: merge(partial(A), partial(B)) must be
byte-identical to partial(A ∪ B), associatively, for any split of the fact
rows — the property that makes late-data maintenance equal to recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators.rollup import merge_rollups, partial_rollup
from seoul_big_data_spark.sources.tables import load

KEYS = ["event_type"]


def _rows(df):
    return sorted(
        (r["event_type"], r["n"], str(r["sum_value"]), r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_merge_equals_full_recompute(spark, sf_dir):
    e = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    full = partial_rollup(e, KEYS, "value")
    a = e.filter(F.col("event_id") % 3 == 0)
    b = e.filter(F.col("event_id") % 3 == 1)
    c = e.filter(F.col("event_id") % 3 == 2)
    pa, pb, pc = (partial_rollup(x, KEYS, "value") for x in (a, b, c))
    merged = merge_rollups(pa, pb, pc)
    assert _rows(merged) == _rows(full)


def test_merge_associative_and_idempotent_shape(spark, sf_dir):
    e = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    a = e.filter(F.col("event_id") % 2 == 0)
    b = e.filter(F.col("event_id") % 2 == 1)
    pa, pb = partial_rollup(a, KEYS, "value"), partial_rollup(b, KEYS, "value")
    left = merge_rollups(merge_rollups(pa, pb), partial_rollup(e.limit(0), KEYS, "value"))
    right = merge_rollups(pa, merge_rollups(pb))
    assert _rows(left) == _rows(right)
    # merging a single partial is the identity
    assert _rows(merge_rollups(pa)) == _rows(pa)


def test_empty_increment_is_identity(spark, sf_dir):
    e = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    p = partial_rollup(e, KEYS, "value")
    empty = partial_rollup(e.filter(F.lit(False)), KEYS, "value")
    assert _rows(merge_rollups(p, empty)) == _rows(p)


def test_incremental_join_delta_disjoint_and_complete(spark, sf_dir):
    """IVM decomposition property: base ∪ delta == full join of new
    states, with base and delta disjoint — across several split choices
    (including empty ΔA and empty ΔB edges)."""
    from seoul_big_data_spark.operators.rollup import incremental_join_delta
    from seoul_big_data_spark.sources.tables import load

    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    o = o.withColumn("c_custkey", F.col("o_custkey"))
    for mod_a, mod_b in ((7, 11), (2, 1), (1, 3)):
        old_a = o.filter(F.col("o_orderkey") % mod_a != 0)
        d_a = o.filter(F.col("o_orderkey") % mod_a == 0)
        old_b = c.filter(F.col("c_custkey") % mod_b != 0)
        d_b = c.filter(F.col("c_custkey") % mod_b == 0)
        base = old_a.join(old_b, "c_custkey")
        delta = incremental_join_delta(old_a, d_a, old_b, d_b, "c_custkey")
        key = lambda r: (r["o_orderkey"], r["c_custkey"])  # noqa: E731
        got_base = {key(r) for r in base.collect()}
        got_delta = {key(r) for r in delta.collect()}
        want = {key(r) for r in o.join(c, "c_custkey").collect()}
        assert got_base.isdisjoint(got_delta), (mod_a, mod_b)
        assert got_base | got_delta == want, (mod_a, mod_b)


def test_answer_from_rollup_every_key_subset(spark, sf_dir):
    """MV answering must hold for EVERY subset of the stored rollup's
    keys (including the grand total): coarsened answers equal direct
    aggregation of the fact."""
    from itertools import combinations

    from seoul_big_data_spark.operators.rollup import (
        answer_from_rollup,
        partial_rollup,
    )
    from seoul_big_data_spark.sources.tables import load

    li = load(spark, "lineitem", sf_dir)
    keys = ["l_returnflag", "l_linestatus"]
    mv = partial_rollup(li, keys, "l_quantity").cache()
    for r in range(0, len(keys) + 1):
        for subset in combinations(keys, r):
            got = {
                tuple(row[k] for k in subset)
                + (row["n"], float(row["sum_value"]), row["min_value"],
                   row["max_value"])
                for row in answer_from_rollup(mv, list(subset)).collect()
            }
            want = {
                tuple(row[k] for k in subset)
                + (row["n"], float(row["sum_value"]), row["min_value"],
                   row["max_value"])
                for row in partial_rollup(li, list(subset), "l_quantity").collect()
            }
            assert got == want, subset
