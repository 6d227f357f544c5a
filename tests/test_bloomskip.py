"""Bloom file skipping (sources/bloomskip.py): no false skips (Bloom has
no false negatives), pruned-then-filtered equals full-scan-then-filtered,
and a point probe on a file-confined key actually cuts the file list where
a zone map could not (unsorted layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.bloomskip import (
    bloom_pruned_read,
    build_bloom_index,
    prune_files_bloom,
)


def _write_hash_partitioned(spark, tmp_path):
    """16 files hash-partitioned on a DIFFERENT column than the probe key:
    each probe key lands in exactly one file, but every file's key RANGE
    spans the domain — the layout where min/max pruning is useless and a
    Bloom index is the only file-skipping signal."""
    path = str(tmp_path / "docs_hashed")
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_key"), (F.col("id") % 997).alias("payload")
    )
    # one file per doc_key bucket; keys 0..3999 spread across all files
    df.repartition(16, "doc_key").write.mode("overwrite").parquet(path)
    return path


def test_no_false_skips_and_parity(spark, tmp_path):
    path = _write_hash_partitioned(spark, tmp_path)
    idx = build_bloom_index(spark, path, "doc_key", m_bits=4096, k=3).cache()
    for probe in (0, 1234, 3999):
        got = (
            bloom_pruned_read(spark, idx, probe)
            .filter(F.col("doc_key") == probe)
            .collect()
        )
        want = (
            spark.read.parquet(path).filter(F.col("doc_key") == probe).collect()
        )
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
        assert len(got) == 1  # present key is found (no false negative)


def test_point_probe_cuts_file_list(spark, tmp_path):
    path = _write_hash_partitioned(spark, tmp_path)
    idx = build_bloom_index(spark, path, "doc_key", m_bits=4096, k=3).cache()
    n_files = idx.count()
    assert n_files == 16
    survivors = prune_files_bloom(idx, 1234)
    # the key lives in one file; with 250 keys × 3 bits per file in a
    # 4096-bit space, false-positive files are possible but a large cut
    # must happen — and the true file must survive
    assert 1 <= len(survivors) < n_files / 2
    got = (
        spark.read.parquet(*survivors)
        .filter(F.col("doc_key") == 1234)
        .count()
    )
    assert got == 1


def test_absent_key_prunes_everything_or_reads_empty(spark, tmp_path):
    path = _write_hash_partitioned(spark, tmp_path)
    idx = build_bloom_index(spark, path, "doc_key", m_bits=4096, k=3).cache()
    out = (
        bloom_pruned_read(spark, idx, 999999)
        .filter(F.col("doc_key") == 999999)
        .count()
    )
    assert out == 0
