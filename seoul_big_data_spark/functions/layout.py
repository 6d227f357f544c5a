"""Multi-dimensional data-layout helpers (Z-order / Morton clustering).

At 100 TB, sort order IS the index: parquet row-group min/max stats prune
scans only along the sort key. A single-column sort gives perfect pruning
on that column and none on any other; interleaving the bits of two keys
(Morton / Z-order code) gives *both* columns locality, so point/range
predicates on either dimension skip most files. This is the same layout
trick Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``, expressed here as a
pure Catalyst bitwise expression (codegen-friendly, no UDF) feeding an
ordinary ``repartitionByRange``/``sortWithinPartitions`` write.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code(a: Column | str, b: Column | str, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns
    into a 2*bits-bit Z-order code (a's bits at even positions). Pure
    shift/mask expression tree — whole-stage codegen, zero shuffle."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def morton_sql(a: str, b: str, bits: int = 8) -> str:
    """The identical Z-order expression as ANSI SQL (oracle parity)."""
    terms = []
    for i in range(2 * bits):
        src, pos = (a, i // 2) if i % 2 == 0 else (b, i // 2)
        terms.append(f"((({src} >> {pos}) & 1) << {i})")
    return " | ".join(terms)
