"""Per-file Bloom indexes: point-lookup file skipping for unsorted keys.

Zone maps (``zonemap.py``) prune on RANGE predicates, which only bites when
files are clustered on the stat column. A point lookup on a key the layout
was NOT sorted by (the "find this customer / doc id" probe) gets no help
from min/max — every file's range straddles the probe. The standard fix
(Parquet bloom filters, Delta/Iceberg bloom index files) is a per-file
Bloom bitset over the key: a file whose bitset misses any of the probe's k
bits provably does not contain the key, so it is never opened.

Build is one distributed pass: distinct (file, key), k salted-md5 bit
positions per key (the same portable hashing as ``q_sketches``), bit sets
collected per file — output is #files rows × ≤ m set bits, metadata
cardinality. Probing is driver-side arithmetic on that stats table (the k
bit positions of the probe value) + an array-containment filter; survivors
feed ``spark.read.parquet(*files)``. No false skips by construction (Bloom
has no false negatives — pinned in tests/test_bloomskip.py); false
positives only cost an extra file open.

Reference parity: the reference re-reads its full CSV per lookup
(data_seoul_2_csv_noopenapi.py:81-87); this is the index layer that makes
point probes sublinear in file count.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bit_positions(value, m_bits: int, k: int) -> list[int]:
    """The k salted-md5 bit positions of ``value`` — byte-identical to the
    Spark-side expression in ``build_bloom_index`` (first 8 md5 hex chars
    of '<j>:<value>' mod m)."""
    return [
        int(hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:8], 16) % m_bits
        for j in range(k)
    ]


def bloom_bit_exprs(key, m_bits: int = 4096, k: int = 3) -> list:
    """The k salted-md5 bit-position Columns for a key expression —
    byte-identical to ``_bit_positions`` (and to the DuckDB oracle of the
    certified decision twin ``q_misc.bloomskip_prune_decisions``, via
    ('0x' || substr(md5(j || ':' || key), 1, 8))::BIGINT % m)."""
    key = F.col(key) if isinstance(key, str) else key
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        for j in range(k)
    ]


def build_bloom_index(
    spark: SparkSession, path: str, key_col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Per-file Bloom stats table: (file, n_keys, bits) where ``bits`` is
    the sorted distinct bit-position array of every key in the file. One
    pass; map-side combinable; #files output rows."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), F.col(key_col).alias("_k")
    )
    keys = df.distinct()
    bits = keys.select(
        "file", F.explode(F.array(*bloom_bit_exprs("_k", m_bits, k))).alias("bit")
    )
    return bits.groupBy("file").agg(
        F.count_distinct("bit").alias("n_bits_set"),
        F.sort_array(F.collect_set("bit")).alias("bits"),
    )


def probe_condition(probe_bits: list[int], bits_col: str = "bits"):
    """The skip/keep decision as a Column over a Bloom-index row: a file
    survives only if ALL probe bits are set in its bitset (a conjunction,
    so duplicate probe bits are harmless). Shared by ``prune_files_bloom``
    and the certified decision twin."""
    cond = None
    for b in probe_bits:
        c = F.array_contains(bits_col, b)
        cond = c if cond is None else (cond & c)
    return cond if cond is not None else F.lit(True)


def prune_files_bloom(
    bloom_index: DataFrame, value, m_bits: int = 4096, k: int = 3
) -> list[str]:
    """Survivor files for an equality probe on the indexed key: a file
    survives only if ALL k probe bits are set in its bitset. Driver-side
    over the metadata table."""
    keep = bloom_index.filter(probe_condition(_bit_positions(value, m_bits, k)))
    return [r["file"] for r in keep.select("file").collect()]


def bloom_pruned_read(
    spark: SparkSession,
    bloom_index: DataFrame,
    value,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Read only files that may contain ``value``; the caller still applies
    the row filter (the index bounds the file set, it does not evaluate
    the predicate)."""
    files = prune_files_bloom(bloom_index, value, m_bits, k)
    if not files:
        any_file = [r["file"] for r in bloom_index.select("file").limit(1).collect()]
        return spark.read.parquet(*any_file).limit(0)
    return spark.read.parquet(*files)
