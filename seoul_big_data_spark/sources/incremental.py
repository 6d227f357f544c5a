"""Incremental file ingestion with a processed-files manifest.

The Auto-Loader/file-source pattern without a service: each run lists the
landing directory, subtracts the manifest of already-processed files, reads
ONLY the new ones, and commits the updated manifest via atomic rename after
the caller's sink write succeeds. Replays are idempotent at file
granularity — a file is either in the manifest (never re-read) or not
(fully re-read), so a crash between sink write and manifest commit re-reads
at most the in-flight batch, and an append-only sink paired with
``foreach_batch_idempotent``-style dedup keys gets exactly-once.

This is batch's twin of Structured Streaming's file source (checkpointed
``readStream``, streaming/structured.py::stream_events_from_files); the
manifest here is plain JSON so any engine can audit it.

Scale note: the manifest is file-name cardinality (metadata, not data) —
the same class as a streaming source checkpoint. Listing is driver-side
os.scandir; at object-store scale you'd swap in a listing service, the
subtract-and-commit contract is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _read_manifest(manifest_path: str) -> set[str]:
    if not os.path.exists(manifest_path):
        return set()
    with open(manifest_path) as fh:
        return set(json.load(fh)["processed"])


def list_new_files(data_dir: str, manifest_path: str, suffix: str = ".parquet") -> list[str]:
    """Deterministic (sorted) list of not-yet-processed data files."""
    done = _read_manifest(manifest_path)
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(suffix) and os.path.join(data_dir, f) not in done
    )


def read_new_files(
    spark: SparkSession, data_dir: str, manifest_path: str
) -> tuple[DataFrame | None, list[str]]:
    """(DataFrame over only the new files, their paths); (None, []) when
    nothing is new. Call :func:`commit_files` AFTER the sink write lands."""
    new = list_new_files(data_dir, manifest_path)
    if not new:
        return None, []
    return spark.read.parquet(*new), new


def commit_files(manifest_path: str, files: list[str]) -> None:
    """Append to the manifest via write-temp-then-atomic-rename: a reader
    never sees a torn manifest, and a crash before the rename leaves the
    old manifest intact (the batch simply replays)."""
    done = _read_manifest(manifest_path)
    done.update(files)
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"processed": sorted(done)}, fh)
    os.replace(tmp, manifest_path)


# --- versioned manifests: snapshot isolation + time travel -------------------


def _commit_next_version(manifest_dir: str, build_doc) -> int:
    """Optimistic-concurrency manifest commit (r4, VERDICT r3 #6): exactly
    one writer wins each version number, losers rebase and retry.

    ``build_doc(prev_version_or_None) -> dict`` constructs the next
    manifest content from the CURRENT latest snapshot; it re-runs on every
    attempt so a loser folds the winner's commit into its own (the
    Delta-style optimistic protocol). Publication is ``os.link(tmp, path)``
    — an atomic create-OR-FAIL, unlike ``os.replace`` which silently
    clobbers a concurrent winner — so two writers committing vN+1 from the
    same vN can never both succeed. The temp name carries pid+uuid so
    concurrent writers never tear each other's staging file, and a crash
    before the link publishes nothing (same crash-safety as before)."""
    import uuid

    os.makedirs(manifest_dir, exist_ok=True)
    for _ in range(64):
        versions = _list_versions(manifest_dir)
        prev = max(versions) if versions else None
        version = (prev + 1) if prev is not None else 0
        doc = dict(build_doc(prev))
        doc["version"] = version
        path = os.path.join(manifest_dir, f"manifest-{version:06d}.json")
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        try:
            os.link(tmp, path)  # exactly one winner per version number
            return version
        except FileExistsError:
            continue  # lost the race: rebase on the new latest, retry
        finally:
            os.unlink(tmp)
    raise RuntimeError(
        f"manifest commit contention in {manifest_dir}: 64 retries exhausted"
    )


def commit_files_versioned(manifest_dir: str, files: list[str]) -> int:
    """Delta/Iceberg-style versioned commit: each batch writes a NEW
    numbered manifest (``manifest-00000N.json``) holding the full
    processed-file snapshot. Old manifests are never mutated, so every
    historical snapshot stays readable — time travel falls out of the
    commit protocol for free. Returns the committed version number.

    The version counter is the manifest listing itself (max + 1): no
    separate counter file to race with. Concurrent writers are safe: the
    commit goes through ``_commit_next_version`` (atomic create-or-fail +
    rebase-and-retry), so no committed batch can be silently lost."""

    def build(prev: int | None) -> dict:
        done = (
            set(_read_snapshot(manifest_dir, prev)) if prev is not None else set()
        )
        done.update(files)
        return {"processed": sorted(done)}

    return _commit_next_version(manifest_dir, build)


def _list_versions(manifest_dir: str) -> list[int]:
    if not os.path.isdir(manifest_dir):
        return []
    out = []
    for f in os.listdir(manifest_dir):
        if f.startswith("manifest-") and f.endswith(".json"):
            out.append(int(f[len("manifest-"):-len(".json")]))
    return out


def _read_snapshot(manifest_dir: str, version: int) -> list[str]:
    path = os.path.join(manifest_dir, f"manifest-{version:06d}.json")
    with open(path) as fh:
        return json.load(fh)["processed"]


def read_as_of(
    spark: SparkSession, manifest_dir: str, version: int | None = None
) -> DataFrame | None:
    """Time-travel read: the table AS OF a manifest version (default:
    latest). Returns None for an empty snapshot. Because manifests are
    immutable full snapshots, a historical read is exactly the file list
    that version committed — no tombstone reconciliation needed."""
    versions = _list_versions(manifest_dir)
    if not versions:
        return None
    v = max(versions) if version is None else version
    if v not in versions:
        raise ValueError(f"no manifest version {v}; have {sorted(versions)}")
    files = _read_snapshot(manifest_dir, v)
    if not files:
        return None
    return spark.read.parquet(*files)


def list_new_files_versioned(
    data_dir: str, manifest_dir: str, suffix: str = ".parquet"
) -> list[str]:
    """Versioned twin of :func:`list_new_files`: subtract the LATEST
    snapshot."""
    versions = _list_versions(manifest_dir)
    done = (
        set(_read_snapshot(manifest_dir, max(versions))) if versions else set()
    )
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(suffix) and os.path.join(data_dir, f) not in done
    )


# --- multi-table transactions: one commit spanning N tables ------------------


def commit_transaction(
    txn_dir: str, table_files: dict[str, list[str]]
) -> int:
    """Atomic MULTI-TABLE commit: one numbered transaction manifest holds
    the full post-commit file snapshot of EVERY table it touches (tables
    not named keep their previous snapshot). Readers resolve all tables
    through a single manifest version, so a cross-table invariant (e.g.
    fact rows and their audit rows land together) can never be observed
    half-applied — the multi-table guarantee single-table manifests
    (``commit_files_versioned``) cannot give.

    Same crash-safe protocol: the version counter IS the manifest listing
    (max+1, no counter file to race); a crash before publication publishes
    nothing for ANY table. Concurrent committers are safe (r4): publication
    is the atomic create-or-fail of ``_commit_next_version`` — two writers
    committing vN+1 from the same vN cannot both succeed; the loser rebases
    on the winner's snapshot and retries, so neither commit is lost.
    Returns the committed version."""

    def build(prev: int | None) -> dict:
        tables: dict[str, list[str]] = {}
        if prev is not None:
            path = os.path.join(txn_dir, f"manifest-{prev:06d}.json")
            with open(path) as fh:
                tables = {
                    k: list(v) for k, v in json.load(fh)["tables"].items()
                }
        for name, files in table_files.items():
            cur = set(tables.get(name, []))
            cur.update(files)
            tables[name] = sorted(cur)
        return {"tables": tables}

    return _commit_next_version(txn_dir, build)


def read_table_as_of(
    spark: SparkSession,
    txn_dir: str,
    table: str,
    version: int | None = None,
) -> DataFrame | None:
    """Read one table at a transaction version (default latest) — every
    table read at the same version is mutually consistent."""
    versions = _list_versions(txn_dir)
    if not versions:
        return None
    v = max(versions) if version is None else version
    if v not in versions:
        raise ValueError(f"no transaction version {v}; have {sorted(versions)}")
    path = os.path.join(txn_dir, f"manifest-{v:06d}.json")
    with open(path) as fh:
        files = json.load(fh)["tables"].get(table, [])
    if not files:
        return None
    return spark.read.parquet(*files)
