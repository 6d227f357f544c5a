"""Manifest-based incremental ingestion (sources/incremental.py):
file-granular exactly-once — new files only, idempotent replay, atomic
manifest commit."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.incremental import (
    commit_files,
    list_new_files,
    read_new_files,
)


def _land(spark, d, name, lo, hi):
    spark.range(lo, hi).toDF("v").coalesce(1).write.mode("overwrite").parquet(
        str(d / "_stage")
    )
    part = next(
        p for p in os.listdir(d / "_stage") if p.endswith(".parquet")
    )
    os.replace(d / "_stage" / part, d / name)


def test_incremental_cycle(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    manifest = str(tmp_path / "manifest.json")

    _land(spark, land, "a.parquet", 0, 100)
    _land(spark, land, "b.parquet", 100, 250)

    df, files = read_new_files(spark, str(land), manifest)
    assert len(files) == 2 and df.count() == 250
    commit_files(manifest, files)

    # idempotent: nothing new → no re-read
    df2, files2 = read_new_files(spark, str(land), manifest)
    assert df2 is None and files2 == []

    # a late-arriving file is picked up alone
    _land(spark, land, "c.parquet", 250, 300)
    df3, files3 = read_new_files(spark, str(land), manifest)
    assert len(files3) == 1 and files3[0].endswith("c.parquet")
    assert df3.agg(F.min("v"), F.max("v")).collect()[0][:] == (250, 299)
    commit_files(manifest, files3)
    assert list_new_files(str(land), manifest) == []


def test_crash_before_commit_replays_batch(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    manifest = str(tmp_path / "manifest.json")
    _land(spark, land, "a.parquet", 0, 50)

    _, files = read_new_files(spark, str(land), manifest)
    # crash BEFORE commit: manifest untouched → the same batch replays
    _, files_again = read_new_files(spark, str(land), manifest)
    assert files_again == files

    # commit is atomic: no .tmp residue, manifest parses
    commit_files(manifest, files)
    assert not os.path.exists(manifest + ".tmp")
    with open(manifest) as fh:
        assert json.load(fh)["processed"] == sorted(files)


def test_versioned_manifest_time_travel(spark, tmp_path):
    from seoul_big_data_spark.sources.incremental import (
        commit_files_versioned,
        list_new_files_versioned,
        read_as_of,
    )

    land = tmp_path / "land"
    land.mkdir()
    mdir = str(tmp_path / "_manifests")

    def drop_batch(name, ids):
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        p = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        import glob
        import shutil

        src = glob.glob(p + "/part-*.parquet")[0]
        shutil.copy(src, str(land / f"{name}.parquet"))

    drop_batch("b0", range(0, 5))
    v0 = commit_files_versioned(mdir, list_new_files_versioned(str(land), mdir))
    drop_batch("b1", range(5, 12))
    v1 = commit_files_versioned(mdir, list_new_files_versioned(str(land), mdir))
    drop_batch("b2", range(12, 14))
    v2 = commit_files_versioned(mdir, list_new_files_versioned(str(land), mdir))

    assert (v0, v1, v2) == (0, 1, 2)
    # latest sees everything; historical versions see exactly their snapshot
    assert read_as_of(spark, mdir).count() == 14
    assert sorted(
        r["id"] for r in read_as_of(spark, mdir, version=0).collect()
    ) == list(range(5))
    assert read_as_of(spark, mdir, version=1).count() == 12
    # nothing new after a commit -> next snapshot would be a no-op batch
    assert list_new_files_versioned(str(land), mdir) == []
    import pytest as _pt

    with _pt.raises(ValueError):
        read_as_of(spark, mdir, version=9)
