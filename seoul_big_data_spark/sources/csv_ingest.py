"""CSV source (SURVEY.md §2.1 C4 + F5): the reference's per-line reader
(data_seoul_2_csv_noopenapi.py:81-87,113-128) as a declarative scan.

All columns are read as strings (``inferSchema=False``) mirroring the
reference's strings-only model (§1.2); typed casts are applied explicitly
from the catalog's declared types (plans/schema_from_catalog.py) — the
engine-side version of "the DB coerces on INSERT"."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ingest import bind_schema, numbered, resume_filter
from ..plans.schema_from_catalog import spark_type_for


def read_csv_all_strings(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """C4/F5 — CSV scan, header skipped by the reader (not a post-filter)."""
    return spark.read.csv(path, header=header, inferSchema=False)


def load_csv_with_catalog_schema(
    spark: SparkSession,
    path: str,
    column_names: list[str],
    column_types: list[str] | None = None,
    start_idx: int = 0,
) -> DataFrame:
    """The full reference load semantics as one lazy plan:
    scan → S4 row-number (file order) → F6 resume filter → J3 positional
    bind → explicit type coercion. Returns the typed staging DataFrame with
    the leading 1-based ``ID`` column (data_seoul_2_csv_noopenapi.py:103)."""
    raw = read_csv_all_strings(spark, path)
    out = numbered(raw)
    out = resume_filter(out, start_idx)
    out = out.select("ID", *raw.columns)
    out = bind_schema(out, ["ID", *column_names])
    if column_types:
        for name, ctype in zip(column_names, column_types):
            out = out.withColumn(name, F.col(name).cast(spark_type_for(ctype)))
    return out


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """C4 with malformed-row quarantine: PERMISSIVE CSV parse against a
    declared schema, split into (clean, quarantine). A row that fails the
    schema (wrong arity, uncastable value) lands in the quarantine frame
    with its raw text preserved in ``_corrupt_record`` for replay after the
    upstream fix — the CSV analogue of q_dq.py's JSON bad-record routing,
    and the contract a 100 TB ingest needs: one malformed line must never
    kill a load (FAILFAST) or silently vanish (DROPMALFORMED).

    Both frames come from ONE scan plan; the split is a filter on the
    corrupt-record column, so Spark reads the file once per action. The
    returned clean frame drops the bookkeeping column."""
    raw = spark.read.csv(
        path,
        header=header,
        schema=schema_ddl + ", _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    # Spark requires caching/materializing the parsed frame before
    # referencing the corrupt-record column in a filter (documented
    # from_csv/corrupt-record restriction).
    raw = raw.cache()
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull())
    return clean, quarantine
