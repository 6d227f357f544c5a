"""Zone-map file pruning (sources/zonemap.py): pruned-then-filtered must
equal full-scan-then-filtered, and a selective predicate must actually cut
the file list."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.zonemap import (
    build_zone_map,
    prune_files,
    pruned_read,
)


def _write_clustered(spark, tmp_path):
    """16 files, each covering a disjoint o_orderkey range (the layout a
    range-partitioned or Z-ordered write produces — the case zone maps
    exist for)."""
    path = str(tmp_path / "orders_clustered")
    df = spark.range(0, 16000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    df.repartitionByRange(16, "k").write.mode("overwrite").parquet(path)
    return path


def test_pruned_equals_full(spark, tmp_path):
    path = _write_clustered(spark, tmp_path)
    zm = build_zone_map(spark, path, ["k"]).cache()
    lo, hi = 2500, 3500
    got = (
        pruned_read(spark, zm, "k", lo, hi)
        .filter((F.col("k") >= lo) & (F.col("k") <= hi))
        .agg(F.count("*"), F.sum("k"))
        .collect()
    )
    want = (
        spark.read.parquet(path)
        .filter((F.col("k") >= lo) & (F.col("k") <= hi))
        .agg(F.count("*"), F.sum("k"))
        .collect()
    )
    assert got == want


def test_prunes_file_list(spark, tmp_path):
    path = _write_clustered(spark, tmp_path)
    zm = build_zone_map(spark, path, ["k"]).cache()
    n_files = zm.count()
    assert n_files >= 8
    survivors = prune_files(zm, "k", 2500, 3500)
    # a 1/16-wide range over range-clustered files touches only a few
    assert 1 <= len(survivors) <= 3
    # open ranges prune one side only
    assert len(prune_files(zm, "k", None, 100)) <= 2
    assert len(prune_files(zm, "k", 15900, None)) <= 2
    # disjoint range: empty shortlist, schema-preserving empty read
    empty = pruned_read(spark, zm, "k", 10**9, 2 * 10**9)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v"}


def test_stats_are_exact(spark, tmp_path):
    path = _write_clustered(spark, tmp_path)
    zm = build_zone_map(spark, path, ["k"]).cache()
    tot = zm.agg(
        F.sum("n_rows"), F.min("k_min"), F.max("k_max"), F.sum("k_nulls")
    ).first()
    assert tot[0] == 16000 and tot[1] == 0 and tot[2] == 15999 and tot[3] == 0
