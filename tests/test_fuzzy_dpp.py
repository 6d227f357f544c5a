"""Blocked fuzzy join (shape + semantics) and dynamic partition pruning
(the runtime scan-skipping that makes dim-filtered fact joins cheap on a
partitioned 100 TB layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators.joins import blocked_fuzzy_join
from seoul_big_data_spark.sources.tables import load


def test_blocked_fuzzy_join_semantics_and_plan(spark):
    names = spark.createDataFrame(
        [(1, "red bolt"), (2, "ted bolt"), (3, "blue bolt"), (4, "red ring")],
        "id long, name string",
    )
    a = names.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"))
    b = names.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"))
    out = blocked_fuzzy_join(
        a,
        b,
        F.element_at(F.split("name_a", " "), -1),
        F.element_at(F.split("name_b", " "), -1),
        (F.col("id_a") < F.col("id_b"))
        & (F.levenshtein("name_a", "name_b") <= 1),
    )
    pairs = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    # only (red bolt, ted bolt) is within distance 1; "red ring" is in a
    # different block so it is never even compared
    assert pairs == [(1, 2)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A year-partitioned fact joined to a dim filtered to one year must
    scan only that year's partitions: the fact scan carries a runtime
    dynamicpruning subquery fed by the dim's broadcast — at 100 TB this is
    the difference between reading one partition and reading the table."""
    o = load(spark, "orders", sf_dir).withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    o.write.partitionBy("o_year").parquet(path)
    fact = spark.read.parquet(path)
    years = [r["o_year"] for r in fact.select("o_year").distinct().collect()]
    pick = sorted(years)[0]
    # Filter on the NON-key column: a literal filter on the join key would
    # be propagated statically by constraint inference (no DPP needed);
    # filtering on `label` forces the pruning predicate to be computed at
    # runtime from the dim's build side — the actual DPP path.
    dim = spark.createDataFrame(
        [(y, f"label{y}") for y in years], "o_year int, label string"
    ).filter(F.col("label") == f"label{pick}")
    joined = fact.join(dim, "o_year").groupBy("label").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expect = fact.filter(F.col("o_year") == pick).count()
    got = joined.collect()
    assert len(got) == 1 and got[0]["count"] == expect
