"""Pins for the exact-power-sum moment queries.

`agg_skew_kurt_exact` recomputes skewness/kurtosis from exact decimal power
sums with one shared IEEE formula; these tests pin that reformulation to
Spark's native accumulators (F.skewness = population g1, F.kurtosis = excess
g2), so the cross-engine-deterministic variant can never drift from the
built-in semantics, and pin the portable md5 SimHash to its xxhash64 twin's
structural properties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators import dedup
from seoul_big_data_spark.q_stats import agg_skew_kurt_exact
from seoul_big_data_spark.sources.tables import load


def test_exact_skew_kurt_matches_builtins(spark, sf_dir):
    exact = {
        r["l_returnflag"]: (r["price_skew"], r["price_kurt"])
        for r in agg_skew_kurt_exact(spark, sf_dir).collect()
    }
    built = {
        r["l_returnflag"]: (r["sk"], r["ku"])
        for r in load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.skewness("l_extendedprice").alias("sk"),
            F.kurtosis("l_extendedprice").alias("ku"),
        )
        .collect()
    }
    assert exact.keys() == built.keys()
    for flag, (sk, ku) in exact.items():
        bsk, bku = built[flag]
        # built-ins accumulate in streaming single-pass form; the exact-sum
        # reformulation agrees to well past the 6 rounded decimals
        assert abs(sk - bsk) < 1e-6, (flag, sk, bsk)
        assert abs(ku - bku) < 1e-6, (flag, ku, bku)


def test_portable_simhash_structure(spark, sf_dir):
    d = load(spark, "documents", sf_dir).limit(200)
    fp = dedup.simhash(d, bits=60, portable=True).select("doc_id", "simhash")
    rows = fp.collect()
    assert len(rows) == d.count()
    # 60-bit fingerprints: always non-negative, below 2^60
    assert all(0 <= r["simhash"] < (1 << 60) for r in rows)
    # determinism across evaluations
    again = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(d, bits=60, portable=True)
        .select("doc_id", "simhash")
        .collect()
    }
    assert all(again[r["doc_id"]] == r["simhash"] for r in rows)
    # identical texts must collide exactly (same tokens -> same bit sums)
    dup = d.limit(1).collect()[0]
    two = spark.createDataFrame(
        [(1, dup["text"]), (2, dup["text"])], "doc_id int, text string"
    )
    fps = dedup.simhash(two, bits=60, portable=True).select("simhash").collect()
    assert fps[0]["simhash"] == fps[1]["simhash"]


def test_portable_simhash_rejects_wide_bits(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pytest.raises(ValueError):
        dedup.simhash(df, bits=64, portable=True)


def test_approx_top_k_exact_on_small_domain(spark, sf_dir):
    """l_quantity has ~50 distinct values per group — far inside the sketch's
    exact regime, so every sketch count must equal the true count; and at
    k=4 (chosen because the rank-4/5 count boundary is strict in every
    group at both sf0.001 and sf0.01) the returned SET must equal the exact
    top-4 — the property that makes the query oracle-checkable (VERDICT r5
    #5 conversion). Count ties INSIDE the top 4 may order differently, so
    compare as sets."""
    from pyspark.sql import Window

    from seoul_big_data_spark.q_agg import agg_approx_top_k

    true_counts = {
        (r["l_returnflag"], r["qty"]): r["cnt"]
        for r in load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag", F.col("l_quantity").alias("qty"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("qty"))
    exact4 = {
        (r["l_returnflag"], r["qty"], r["cnt"])
        for r in load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag", F.col("l_quantity").alias("qty"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .collect()
    }
    sketch_rows = agg_approx_top_k(spark, sf_dir).collect()
    for r in sketch_rows:
        assert r["cnt"] == true_counts[(r["l_returnflag"], r["qty"])]
    assert {(r["l_returnflag"], r["qty"], r["cnt"]) for r in sketch_rows} == exact4


def test_approx_count_distinct_rsd_bound(spark, sf_dir):
    """The HLL++ estimate on a HIGH-cardinality key (orderkeys — the regime
    the registered query's low-cardinality exact twin cannot certify) must
    land within ~3x the requested 1% relative standard deviation of the
    exact distinct count, per group."""
    li = load(spark, "lineitem", sf_dir)
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.01).alias("a"),
            F.count_distinct("l_orderkey").alias("e"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["a"] - r["e"]) <= max(3, 0.03 * r["e"]), (
            r["l_returnflag"], r["a"], r["e"],
        )
