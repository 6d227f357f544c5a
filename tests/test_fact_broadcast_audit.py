"""plan_audit's fact-cardinality broadcast rule (VERDICT r5 #4).

The r5 scale bug: stats_market_basket_pairs force-broadcast its part-keyed
support table — an *aggregate of* a fact scan, so the old "HashAggregate
under the BroadcastExchange means reduced" rule passed it, yet the key
cardinality (parts) grows with the corpus: a driver collect scaling with N,
measured at 5.48 per 4x weak-scaling step. These tests pin the extended
rule: a deliberately re-added basket hint must FAIL the audit; the current
(unhinted) basket tree must pass; the legitimate 1-row global-aggregate
broadcast must stay allowed.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools"))

from plan_audit import fact_broadcast_violations  # noqa: E402
from seoul_big_data_spark.registry import QUERIES  # noqa: E402
from seoul_big_data_spark.sources.tables import load  # noqa: E402
import seoul_big_data_spark.queries  # noqa: E402,F401  (registry side effect)


@pytest.fixture()
def hint_config(spark):
    """The audit's config: auto-broadcast off + AQE off, so every
    BroadcastExchange in the tree is hint-forced."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_re_added_basket_hint_fails(hint_config, sf_dir):
    """The exact r5 bug shape: part-keyed support aggregate force-broadcast."""
    spark = hint_config
    li = load(spark, "lineitem", sf_dir)
    items = li.select("l_orderkey", "l_partkey").distinct()
    supp = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
    pairs = (
        items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
        .join(
            items.select(
                F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
            ),
            "ok",
        )
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
    )
    hinted = pairs.join(
        F.broadcast(supp.select(F.col("l_partkey").alias("part_a"), "n")), "part_a"
    )
    reasons = fact_broadcast_violations(hinted)
    assert reasons, "re-added basket hint must be flagged"
    assert any("corpus-keyed aggregate" in r for r in reasons)


def test_raw_fact_broadcast_fails(hint_config, sf_dir):
    spark = hint_config
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load(spark, "orders", sf_dir).select("o_orderkey")
    hinted = o.join(F.broadcast(li), o.o_orderkey == li.l_orderkey)
    reasons = fact_broadcast_violations(hinted)
    assert any("raw corpus scan" in r for r in reasons)


def test_current_basket_tree_passes(hint_config, sf_dir):
    """The shipped query (support sides unhinted, 1-row n_orders hinted)
    must be clean — the global aggregate has keys=[], not a corpus key."""
    spark = hint_config
    df = QUERIES["stats_market_basket_pairs"](spark, sf_dir)
    assert fact_broadcast_violations(df) == []


def test_global_aggregate_broadcast_allowed(hint_config, sf_dir):
    """limit_first's min-key 1-row broadcast is the legitimate pattern."""
    spark = hint_config
    df = QUERIES["limit_first"](spark, sf_dir)
    assert fact_broadcast_violations(df) == []
