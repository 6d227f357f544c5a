"""Z-order layout (functions/layout.py): correctness + skipping win.

The measurable claim behind Z-ordering: files written sorted by the Morton
code of (a, b) have narrow per-file min/max spans on BOTH columns, so a
point predicate on either column overlaps few files; a single-key sort
gives narrow spans on that key only. We write the same data both ways,
reconstruct per-file spans via input_file_name(), and assert the Z-order
layout is prunable on the *second* dimension where the single-key sort
is not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from seoul_big_data_spark.functions.layout import morton_code, morton_sql
from seoul_big_data_spark.sources.tables import load

_N_FILES = 16


def _python_morton(a: int, b: int, bits: int = 8) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_code_matches_python(spark, sf_dir):
    rows = (
        load(spark, "customer", sf_dir)
        .select(
            (F.col("c_custkey") % 256).alias("a"),
            (F.col("c_nationkey") % 256).alias("b"),
            morton_code(F.col("c_custkey") % 256, F.col("c_nationkey") % 256).alias(
                "z"
            ),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["z"] == _python_morton(r["a"], r["b"])


def test_morton_sql_mirrors_column_expr():
    # the oracle generator and the Column builder must describe the same bits
    sql = morton_sql("x", "y", bits=2)
    assert sql == (
        "(((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1)"
        " | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)"
    )


def _per_file_spans(df, path, cols):
    out = (
        df.sparkSession.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            *[F.min(c).alias(f"min_{c}") for c in cols],
            *[F.max(c).alias(f"max_{c}") for c in cols],
        )
        .collect()
    )
    return out


def _files_overlapping(spans, col, value):
    return sum(
        1 for r in spans if r[f"min_{col}"] <= value <= r[f"max_{col}"]
    )


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    li = load(spark, "lineitem", sf_dir).select(
        (F.col("l_orderkey") % 256).alias("pk"),
        (F.col("l_partkey") % 128).alias("sk"),
        "l_quantity",
    )

    single = str(tmp_path / "bykey")
    li.repartitionByRange(_N_FILES, "pk").sortWithinPartitions("pk").write.mode(
        "overwrite"
    ).parquet(single)

    zpath = str(tmp_path / "byz")
    lz = li.withColumn("z", morton_code("pk", "sk"))
    lz.repartitionByRange(_N_FILES, "z").sortWithinPartitions("z").drop("z").write.mode(
        "overwrite"
    ).parquet(zpath)

    s_spans = _per_file_spans(li, single, ["pk", "sk"])
    z_spans = _per_file_spans(li, zpath, ["pk", "sk"])
    assert len(s_spans) >= _N_FILES // 2 and len(z_spans) >= _N_FILES // 2

    probes = [17, 43, 63, 101]
    # single-key sort: perfect on pk, useless on sk (every file overlaps)
    s_pk = np.mean([_files_overlapping(s_spans, "pk", v) for v in probes])
    s_sk = np.mean([_files_overlapping(s_spans, "sk", v) for v in probes])
    z_pk = np.mean([_files_overlapping(z_spans, "pk", v) for v in probes])
    z_sk = np.mean([_files_overlapping(z_spans, "sk", v) for v in probes])

    assert s_sk >= 0.9 * len(s_spans)  # the failure mode Z-order fixes
    # Z-order prunes on BOTH dimensions: strictly better than the
    # single-key layout on sk, and still prunable on pk
    assert z_sk <= 0.6 * s_sk
    assert z_pk <= 0.6 * len(z_spans)
