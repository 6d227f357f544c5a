"""Schema evolution on read: the parquet mergeSchema contract an ingestion
pipeline relies on when producers add columns over time (the reference
rebuilt tables by hand on schema change; here old and new files coexist in
one dataset and the reader unifies them)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_generations(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("a")
    ).write.mode("overwrite").parquet(path)
    spark.range(100, 150).select(
        F.col("id"), (F.col("id") * 2).alias("a"), F.lit("v2").alias("b")
    ).write.mode("append").parquet(path)
    return path


def test_merge_schema_unifies_generations(spark, tmp_path):
    path = _write_generations(spark, tmp_path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "a", "b"}
    assert df.count() == 150
    # old-generation rows surface the new column as NULL
    assert df.filter(F.col("b").isNull()).count() == 100
    assert df.filter(F.col("b") == "v2").count() == 50


def test_explicit_schema_projects_old_files(spark, tmp_path):
    path = _write_generations(spark, tmp_path)
    # a reader pinned to the v1 schema keeps working after the evolution
    df = spark.read.schema("id bigint, a bigint").parquet(path)
    assert set(df.columns) == {"id", "a"}
    assert df.count() == 150
    assert df.agg(F.sum("a")).first()[0] == sum(2 * i for i in range(150))


def test_without_merge_schema_footer_wins(spark, tmp_path):
    """Default (mergeSchema off) picks one footer's schema — documents WHY
    ingestion paths that evolve must set the option (or a catalog schema)."""
    path = _write_generations(spark, tmp_path)
    cols = set(spark.read.parquet(path).columns)
    assert cols in ({"id", "a"}, {"id", "a", "b"})
