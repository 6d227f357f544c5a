"""Skew-salting join correctness (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators.skew import salted_join
from seoul_big_data_spark.sources.tables import load


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey", "l_quantity")
    part = load(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = li.join(part, "l_partkey").groupBy("l_partkey").count()
    salted = salted_join(li, part, "l_partkey", n_salts=4).groupBy("l_partkey").count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_outer_preserves_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, v string")
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    out = salted_join(fact, dim, "k", n_salts=3, how="left").collect()
    got = {r["k"]: r["name"] for r in out}
    assert got == {1: "one", 2: "two", 99: None}
    assert len(out) == 3  # no duplication from the salt explode
