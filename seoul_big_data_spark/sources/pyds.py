"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference pulls rows from systems Spark has no built-in connector for
(a Tibero RDBMS over jaydebeapi, a rate-limited OpenAPI —
data_seoul_3_csv.py:69-89). The modern PySpark answer is the Python Data
Source API: implement ``DataSource``/``DataSourceReader`` once, register
it, and ``spark.read.format("...")`` plans it like any native source —
partition-parallel, executor-side, no driver loop.

``SyntheticSensorDataSource`` is the engine's reference implementation:
a deterministic generator (md5-keyed values, so any engine can recompute
the exact rows — the oracle does) that demonstrates the full surface:
options, schema declaration, partition planning (``partitions()`` →
one task per ``InputPartition``) and per-partition iteration. Swap the
generator body for an HTTP/JDBC fetch and the partition list for key
ranges to get the reference's collectors as first-class Spark sources.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class SyntheticSensorDataSource(DataSource):
    """Register with ``spark.dataSource.register(SyntheticSensorDataSource)``
    then ``spark.read.format("synthetic_sensors").option("n", 2000)``.

    Options: ``n`` total rows (default 1000), ``partitions`` read
    parallelism (default 8). Rows: (reading_id, sensor_id = id % 10,
    value = md5-uniform in [0, 1))."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_sensors"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id int, value double"

    def reader(self, schema) -> "SyntheticSensorReader":
        return SyntheticSensorReader(self.options)


class SyntheticSensorReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.n_parts = max(int(options.get("partitions", 8)), 1)

    def partitions(self):
        # one InputPartition per contiguous id range → one Spark task each;
        # this is the method a real connector uses to expose split points
        # (key ranges, file chunks, topic partitions)
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        per = self.n // self.n_parts
        start = partition.value * per
        end = self.n if partition.value == self.n_parts - 1 else start + per
        for i in range(start, end):
            u = int(hashlib.md5(f"v:{i}".encode()).hexdigest()[:8], 16) / 2**32
            yield (i, i % 10, u)


class SyntheticSensorStreamDataSource(DataSource):
    """Streaming twin of :class:`SyntheticSensorDataSource`: the same
    deterministic readings delivered as micro-batches through
    ``SimpleDataSourceStreamReader`` — offset = next reading id, so
    restart/replay (``readBetweenOffsets``) regenerates byte-identical
    batches, which is exactly the replayable-source contract Structured
    Streaming's exactly-once model assumes. Bounded by ``n``: the stream
    idles (empty batches) once all readings are emitted, so
    ``trigger(availableNow=True)`` drains it and terminates.

    Options: ``n`` total rows (default 1000), ``batch`` rows per
    micro-batch (default 100)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_sensors_stream"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id int, value double"

    def simpleStreamReader(self, schema) -> "SyntheticSensorStreamReader":
        return SyntheticSensorStreamReader(self.options)


def _sensor_row(i: int):
    u = int(hashlib.md5(f"v:{i}".encode()).hexdigest()[:8], 16) / 2**32
    return (i, i % 10, u)


class SyntheticSensorStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.batch = max(int(options.get("batch", 100)), 1)

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = int(start["next"])
        hi = min(lo + self.batch, self.n)
        return iter([_sensor_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        # deterministic replay: the offset range IS the data (pure function
        # of reading id) — the property that makes failure recovery exact
        return iter(
            [_sensor_row(i) for i in range(int(start["next"]), int(end["next"]))]
        )

    def commit(self, end) -> None:
        pass  # nothing external to acknowledge; offsets live in the checkpoint


# --- custom WRITER: two-phase commit through the Python DataSource API -------


class AuditedJsonlCommit(WriterCommitMessage):
    """Per-task commit message: which file the task wrote and how many
    rows it holds (picklable; travels executor → driver)."""

    def __init__(self, file: str, rows: int) -> None:
        self.file = file
        self.rows = rows


class AuditedJsonlDataSource(DataSource):
    """Custom Python DataSource WRITER (Spark 4): JSON-lines sink with a
    driver-side audit manifest — the two-phase commit surface. Each task
    streams its partition to ``part-<pid>.jsonl`` and returns a commit
    message; ``commit()`` runs once on the driver with ALL messages and
    publishes ``_manifest.json`` (files + per-file and total row counts)
    via write-temp-then-rename. Readers that resolve through the manifest
    never see files from an uncommitted (failed/aborted) job — the same
    visibility contract as sources/incremental.py, now behind the
    standard ``df.write.format("audited_jsonl")`` call site. ``abort()``
    removes the orphaned task files."""

    @classmethod
    def name(cls) -> str:
        return "audited_jsonl"

    def writer(self, schema, overwrite: bool) -> "AuditedJsonlWriter":
        return AuditedJsonlWriter(self.options)


class AuditedJsonlWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options["path"]

    def write(self, iterator) -> AuditedJsonlCommit:
        import json as js
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        rows = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(js.dumps(row.asDict(), default=str) + "\n")
                rows += 1
        return AuditedJsonlCommit(fname, rows)

    def commit(self, messages) -> None:
        import json as js
        import os

        manifest = {
            "files": [
                {"file": m.file, "rows": m.rows} for m in messages
            ],
            "total_rows": sum(m.rows for m in messages),
        }
        tmp = os.path.join(self.path, "_manifest.json.tmp")
        with open(tmp, "w") as fh:
            js.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "_manifest.json"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.file)
            except OSError:
                pass
