"""Parquet table loaders for the driver-generated test tables.

Replaces the reference's JDBC catalog scans (C1-C3,
``data_seoul_1_category.py:41-47``) with declarative ``spark.read`` — filters
and projections written against these DataFrames push down into the parquet
scan (row-group skipping + column pruning), which is the scalable analogue of
the reference writing its WHERE clause into the SQL string by hand.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped as either parquet TIMESTAMP(NANOS) (read as
    raw nanos via ``nanosAsLong`` and converted) or TIMESTAMP(MICROS)
    (read natively as TIMESTAMP_NTZ); both normalize to the session-zone
    microsecond timestamp — the engine's canonical event-time type
    (sub-microsecond precision is below every window/session granularity
    used here, and the session zone is pinned UTC so NTZ→LTZ is
    value-identity).
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        else:
            ts = F.col("ts").cast("timestamp")
        return df.withColumn("ts", ts)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every test table; also registers each as a temp view so the SQL
    API can be used interchangeably with the DataFrame API."""
    out = {}
    for name in TABLES:
        df = load(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
