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
