"""Structured Streaming throughput microbench (weak scaling for §2.8).

Drives the SAME streaming pipelines the parity tests pin — watermarked
hourly rollup, native session_window rollup, stream-static broadcast
enrichment — over a file-source stream of the scaled events table with
an ``availableNow`` trigger and a noop sink, and reports end-to-end
rows/sec at x1/x8/x32. The batch weak-scaling harness
(`tools/scale_run.py`) shows the PLANS scale; this shows the streaming
runtime around them (micro-batch scheduling, state store, watermark
advance) keeps up as input multiplies on fixed cores.

Usage: python tools/stream_bench.py [--mults 1,8,32]
Appends a "streaming" section to SCALE_RUN.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seoul_big_data_spark.session import get_spark  # noqa: E402
from seoul_big_data_spark.sources.tables import load  # noqa: E402
from seoul_big_data_spark.streaming.structured import (  # noqa: E402
    enrich_stream_with_dim,
    hourly_rollup_stream,
    session_rollup_stream,
)
from tools.scale_run import SCALE_DIR, build  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _prepare_input(spark, mult: int, n_files: int = 16) -> tuple[str, int]:
    """Write the scaled events as n_files parquet files with a normalized
    timestamp column (the stream's micro-batch granularity is per file)."""
    out = os.path.join(SCALE_DIR, "stream_in", f"x{mult}")
    marker = os.path.join(out, "_SUCCESS")
    src_dir = "/root/testdata/sf0.1" if mult == 1 else build(spark, mult)
    ev = load(spark, "events", src_dir)
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        ev.repartition(n_files).write.mode("overwrite").parquet(out)
    return out, ev.count()


def _run(stream_df, mode: str) -> float:
    ckpt = tempfile.mkdtemp(prefix="stream_bench_ckpt_")
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    elapsed = time.perf_counter() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return elapsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,8,32")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_spark("stream_bench")
    results: dict[str, dict] = {}
    for mult in mults:
        path, n_rows = _prepare_input(spark, mult)
        src = spark.readStream.schema(_DDL).parquet(path)
        # catalog-sized dim (left join: uncovered users keep null tier)
        dim = (
            spark.range(0, 500_000)
            .select(F.col("id").alias("user_id"))
            .withColumn("tier", (F.col("user_id") % 5).cast("int"))
        )
        pipelines = {
            "hourly_rollup": (hourly_rollup_stream(src), "complete"),
            "session_rollup": (session_rollup_stream(src), "complete"),
            "enrich_broadcast_dim": (
                enrich_stream_with_dim(src, dim, "user_id", ["tier"]),
                "append",
            ),
        }
        for name, (df, mode) in pipelines.items():
            _run(df, mode)  # warm: codegen + file listing
            secs = min(_run(df, mode), _run(df, mode))
            row = results.setdefault(name, {})
            row[f"x{mult}_s"] = round(secs, 3)
            row[f"x{mult}_rows_per_s"] = int(n_rows / secs)
            print(f"[x{mult} {name}] {secs:.2f}s  {int(n_rows / secs):,} rows/s")

    out_path = os.path.join(ROOT, "SCALE_RUN.json")
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            doc = json.load(fh)
    doc["streaming"] = results
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    spark.stop()
    print("SCALE_RUN.json written (streaming)")


if __name__ == "__main__":
    main()
