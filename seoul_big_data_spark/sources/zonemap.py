"""Zone maps: file-level min/max statistics for scan pruning.

Parquet already prunes row groups inside a file the scan opens, but at
100 TB the win is never OPENING the file: a side table of per-file
min/max/null-count stats (the Delta/Iceberg manifest idea, here as plain
data) lets the planner cut the file LIST before the read starts — file
listing and footer reads are the dominant cost of a selective query over
millions of files.

Build is one distributed pass (``input_file_name()`` + groupBy — map-side
combine, stats-cardinality output = #files). Pruning intersects the
predicate range with each file's [min, max] — a broadcast-sized metadata
operation on the driver — and hands ``spark.read.parquet(*survivors)`` the
shortlist. Correctness is inherent: a file whose range doesn't intersect
the predicate cannot contain a matching row, so pruned-then-filtered
always equals full-scan-then-filtered (pinned in tests/test_zonemap.py).

Reference parity: the reference re-reads full CSVs per run
(data_seoul_2_csv_noopenapi.py:81-87); this is the metadata layer that
makes re-reads sublinear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zone_stats_aggs(stat_cols: list[str]) -> list:
    """The per-file stats aggregate list (n_rows + min/max/null-count per
    stat column) — shared by ``build_zone_map`` and the oracle-checked
    decision twin (``q_misc.zonemap_prune_decisions``), so the certified
    query exercises the exact aggregation the operator runs."""
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
        ]
    return aggs


def survivor_condition(col: str, lo, hi):
    """The pruning decision as a Column over a zone-map row: the file's
    [min, max] intersects [lo, hi] (open bounds pass None). Shared by
    ``prune_files`` and the decision twin — a file whose range misses the
    predicate provably holds no matching row."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(f"{col}_max") >= lo)
    if hi is not None:
        cond = cond & (F.col(f"{col}_min") <= hi)
    return cond


def build_zone_map(
    spark: SparkSession, path: str, stat_cols: list[str]
) -> DataFrame:
    """Per-file stats table: (file, n_rows, <c>_min, <c>_max, <c>_nulls
    per stat column). One pass over the dataset; output is #files rows."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    return df.groupBy(F.col("_file").alias("file")).agg(*zone_stats_aggs(stat_cols))


def prune_files(
    zone_map: DataFrame, col: str, lo, hi
) -> list[str]:
    """Survivor file list for predicate ``lo <= col <= hi`` (pass None to
    leave a bound open). Driver-side over the stats table — metadata
    cardinality (#files), the same class of state as a Delta manifest."""
    keep = zone_map.filter(survivor_condition(col, lo, hi))
    return [r["file"] for r in keep.select("file").collect()]


def pruned_read(
    spark: SparkSession, zone_map: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Read only the files whose [min, max] intersects [lo, hi]. The
    caller still applies the row-level filter — zone maps bound the file
    set, they don't evaluate the predicate."""
    files = prune_files(zone_map, col, lo, hi)
    if not files:
        # empty shortlist: preserve schema by reading nothing via limit(0)
        any_file = [r["file"] for r in zone_map.select("file").limit(1).collect()]
        return spark.read.parquet(*any_file).limit(0)
    return spark.read.parquet(*files)
