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


def test_multi_table_transaction_is_all_or_nothing(spark, sf_dir, tmp_path):
    """A transaction spanning fact + audit tables must be observed fully
    or not at all: a crash before the manifest rename (simulated by the
    orphaned .tmp) leaves BOTH tables at the prior version; the commit
    advances both together; historical versions stay readable."""
    import json
    import os

    from seoul_big_data_spark.sources.incremental import (
        commit_transaction,
        read_table_as_of,
    )
    from seoul_big_data_spark.sources.tables import load

    txn = str(tmp_path / "txn")
    o = load(spark, "orders", sf_dir).limit(100).select("o_orderkey")
    batch1 = str(tmp_path / "fact1")
    audit1 = str(tmp_path / "audit1")
    o.write.parquet(batch1)
    spark.createDataFrame([(1, 100)], "batch int, n int").write.parquet(audit1)
    files = lambda d: [  # noqa: E731
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]
    v0 = commit_transaction(txn, {"fact": files(batch1), "audit": files(audit1)})
    assert v0 == 0
    n_fact_0 = read_table_as_of(spark, txn, "fact").count()
    assert read_table_as_of(spark, txn, "audit").count() == 1

    # simulated crash: second batch written, manifest tmp left unrenamed
    batch2 = str(tmp_path / "fact2")
    o.limit(10).write.parquet(batch2)
    stale_tmp = os.path.join(txn, "manifest-000001.json.tmp")
    with open(stale_tmp, "w") as fh:
        json.dump({"version": 1, "tables": {}}, fh)
    assert read_table_as_of(spark, txn, "fact").count() == n_fact_0
    assert read_table_as_of(spark, txn, "audit").count() == 1

    # real commit: both tables advance in one version
    audit2 = str(tmp_path / "audit2")
    spark.createDataFrame([(2, 10)], "batch int, n int").write.parquet(audit2)
    v1 = commit_transaction(
        txn, {"fact": files(batch2), "audit": files(audit2)}
    )
    assert v1 == 1
    assert read_table_as_of(spark, txn, "fact").count() == n_fact_0 + 10
    assert read_table_as_of(spark, txn, "audit").count() == 2
    # time travel to v0 still consistent
    assert read_table_as_of(spark, txn, "fact", 0).count() == n_fact_0
    assert read_table_as_of(spark, txn, "audit", 0).count() == 1


# --- concurrent-writer conflict detection (r4, VERDICT r3 #6) ----------------


def test_interleaved_committers_exactly_one_wins_then_rebase(tmp_path):
    """Two writers commit vN+1 from the same vN: the one that publishes
    first wins that version; the loser detects the conflict (create-or-fail)
    and retries on TOP of the winner's snapshot — neither commit is lost."""
    from seoul_big_data_spark.sources.incremental import (
        _commit_next_version,
        _read_snapshot,
        commit_files_versioned,
    )

    d = str(tmp_path / "m")
    commit_files_versioned(d, ["base.parquet"])  # v0

    calls = {"n": 0}

    def slow_writer_build(prev):
        # Writer A reads prev=0; BEFORE A publishes, writer B lands v1.
        calls["n"] += 1
        if calls["n"] == 1:
            won = commit_files_versioned(d, ["b.parquet"])
            assert won == 1  # B takes v1 while A is mid-commit
        done = set(_read_snapshot(d, prev)) if prev is not None else set()
        done.add("a.parquet")
        return {"processed": sorted(done)}

    v = _commit_next_version(d, slow_writer_build)
    assert v == 2  # A lost v1, retried, won v2
    assert calls["n"] == 2  # exactly one retry
    snap = set(_read_snapshot(d, 2))
    assert {"base.parquet", "a.parquet", "b.parquet"} <= snap  # nothing lost


def test_committer_storm_no_lost_updates(tmp_path):
    import threading

    from seoul_big_data_spark.sources.incremental import (
        _list_versions,
        _read_snapshot,
        commit_files_versioned,
    )

    d = str(tmp_path / "storm")
    n_threads, per = 8, 4
    errs = []

    def worker(t):
        try:
            for i in range(per):
                commit_files_versioned(d, [f"w{t}_{i}.parquet"])
        except Exception as ex:  # noqa: BLE001
            errs.append(ex)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    versions = sorted(_list_versions(d))
    assert versions == list(range(n_threads * per))  # one winner per version
    final = set(_read_snapshot(d, versions[-1]))
    want = {f"w{t}_{i}.parquet" for t in range(n_threads) for i in range(per)}
    assert want <= final  # every commit survived the contention


def test_transaction_interleave_rebase_keeps_both_tables(tmp_path):
    from seoul_big_data_spark.sources.incremental import commit_transaction

    d = str(tmp_path / "txn")
    v0 = commit_transaction(d, {"fact": ["f0.parquet"], "audit": ["a0.parquet"]})
    assert v0 == 0
    # Simulate the interleave at the protocol level: a competing committer
    # takes v1 directly (what a second process would publish), then the
    # API-level commit must land at v2 carrying BOTH writers' tables.
    path = os.path.join(d, "manifest-000001.json")
    with open(path, "w") as fh:
        json.dump(
            {"version": 1, "tables": {"fact": ["f0.parquet", "f1b.parquet"],
                                      "audit": ["a0.parquet"]}},
            fh,
        )
    v = commit_transaction(d, {"audit": ["a1.parquet"]})
    assert v == 2
    with open(os.path.join(d, "manifest-000002.json")) as fh:
        tables = json.load(fh)["tables"]
    assert "f1b.parquet" in tables["fact"]  # winner's commit preserved
    assert "a1.parquet" in tables["audit"]  # loser's commit applied on top
