"""HLL sketch queries: estimate quality + merge semantics pinned vs exact.

DataSketches HLL binaries are engine-specific (rows-only on the driver
gate), so the correctness contract lives here: per-group estimates within
5% of exact count_distinct, and the merged-global estimate computed from
the sketches must match the estimate computed from the raw data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seoul_big_data_spark.queries import QUERIES
from seoul_big_data_spark.sources.tables import load


def test_hll_estimates_close_to_exact(spark, sf_dir):
    out = {
        r["grain"]: r["approx_custkeys"]
        for r in QUERIES["agg_hll_sketch_merge"](spark, sf_dir).collect()
    }
    o = load(spark, "orders", sf_dir)
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["_ALL_"] = o.select("o_custkey").distinct().count()
    assert set(out) == set(exact)
    for grain, est in out.items():
        assert est == pytest.approx(exact[grain], rel=0.05), grain


def test_hll_merge_equals_direct_global_sketch(spark, sf_dir):
    o = load(spark, "orders", sf_dir)
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).collect()[0]["e"]
    merged = (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert merged == direct


def test_bottomk_sample_union_mergeable(spark, sf_dir):
    """Bottom-k algebra: the k smallest md5 ranks of A ∪ B equal the k
    smallest of (bottom-k(A) ∪ bottom-k(B)) — the property that lets the
    sample sketch merge across partitions/days without re-reading data
    (same algebra as KMV)."""
    from seoul_big_data_spark.sources.tables import load

    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    r = F.md5(
        F.concat_ws(
            ":",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    ranked = li.select(F.col("l_extendedprice").alias("v"), r.alias("r"))
    a = ranked.filter(F.col("r") < F.lit("8"))
    b = ranked.filter(F.col("r") >= F.lit("8"))
    k = 500
    direct = [row["r"] for row in ranked.orderBy("r").limit(k).collect()]
    merged = [
        row["r"]
        for row in a.orderBy("r")
        .limit(k)
        .unionByName(b.orderBy("r").limit(k))
        .orderBy("r")
        .limit(k)
        .collect()
    ]
    assert merged == direct and len(direct) == k
