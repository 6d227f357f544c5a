"""JDBC source/sink surface (SURVEY.md §2.1 C1/C6).

The reference reads its catalog and writes its staging rows over jaydebeapi
to a Tibero RDBMS (data_seoul_1_category.py:27-33). The Spark-native
equivalent is ``spark.read.jdbc`` / ``df.write.jdbc``: predicate pushdown and
column pruning reach the remote database automatically, and
``partitionColumn`` turns one remote table into N parallel range scans —
the scalable replacement for the reference's single-cursor ``fetchall()``.

Exercised end-to-end against embedded Apache Derby (ships inside the Spark
distribution — zero-daemon): tests/test_jdbc.py round-trips a catalog table
through ``write.jdbc``/``read.jdbc``, proves predicate pushdown reaches the
remote query, and splits a read into parallel range scans. Every option maps
1:1 to the public Spark JDBC data source options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_catalog_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int = 0,
    upper_bound: int = 1_000_000,
) -> DataFrame:
    """C1 — catalog scan over JDBC. With ``partition_column`` the read is
    split into ``num_partitions`` parallel range queries (each executor opens
    its own connection); without it, a single-partition read — acceptable
    only for catalog-sized tables."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def append_over_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """C6 — bulk append over JDBC: each partition writes one batched
    transaction of ``batch_size`` rows (the reference's 1-row-per-INSERT
    loop, data_seoul_2_csv_noopenapi.py:125, becomes N parallel batched
    streams)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**(properties or {}))
        .mode("append")
        .save()
    )
