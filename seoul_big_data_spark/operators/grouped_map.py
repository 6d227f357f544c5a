"""Grouped-map transforms (SURVEY.md §2.9): the applyInPandas surface and its
native-expression twin.

``applyInPandas`` ships each group to a Python worker as an Arrow batch — the
escape hatch for per-group logic Catalyst can't express (model scoring,
per-group curve fitting). For anything expressible as aggregates+join, the
native form wins at scale: no Python workers, no per-group materialization,
and groups larger than one worker's memory don't OOM. Both are provided; the
tests pin them to identical results so the fast path is known-safe to
substitute.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_native(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Z-score per group from exact decimal sums (deterministic; one
    broadcastable group-stats aggregate + map-side join)."""
    y = F.col(value_col).cast("decimal(12,2)")
    stats = df.groupBy(group_col).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum(y * y).cast("double").alias("_syy"),
    )
    n, sy, syy = F.col("_n"), F.col("_sy"), F.col("_syy")
    sd = F.sqrt((syy - sy * sy / n) / (n - 1))
    return (
        df.join(F.broadcast(stats), group_col)
        .select(
            id_col,
            group_col,
            F.round((F.col(value_col) - sy / n) / sd, 6).alias("zscore"),
        )
    )


def zscore_pandas(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """The same transform through applyInPandas (Arrow grouped-map)."""

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import decimal

        dec = pdf[value_col].map(
            lambda v: decimal.Decimal(str(round(v, 2)))
        )
        n = float(len(pdf))
        sy = float(sum(dec))
        syy = float(sum(d * d for d in dec))
        sd = ((syy - sy * sy / n) / (n - 1)) ** 0.5
        out = pdf[[id_col, group_col]].copy()
        out["zscore"] = ((pdf[value_col] - sy / n) / sd).round(6)
        return out

    return df.groupBy(group_col).applyInPandas(
        _per_group, schema=f"{id_col} long, {group_col} string, zscore double"
    )


def arrow_scalar_udf_tokens():
    """Scalar Python UDF on the Arrow serialization path (Spark 4
    ``useArrow=True``): same per-row semantics as a classic pickled UDF,
    but batches move through Arrow columnar buffers — the modern default
    for scalar Python logic that can't be expressed declaratively. The
    parity query (`udf_arrow_token_count`) pins it against the pure
    Catalyst expression, so the UDF surface itself is what's under test,
    not the logic."""
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def _n_tokens(text: str) -> int:
        if text is None:
            return 0
        return len([t for t in text.split() if t])

    return _n_tokens


def grouped_agg_trimmed_mean():
    """GROUPED_AGG pandas UDF (vectorized UDAF): each group's column
    arrives as ONE pandas Series and reduces to a scalar — the Arrow
    analogue of a custom Catalyst aggregate, for reductions with no
    built-in form. Partial aggregation does NOT apply (whole groups
    shuffle to one task), which is exactly the documented trade-off
    versus the declarative twin in `agg_mean_family` — the parity query
    keeps both honest."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        kept = v[(v >= lo) & (v <= hi)]
        return float(kept.mean())

    return _trimmed_mean


def arrow_batch_normalizer():
    """``mapInArrow`` kernel: operate on raw ``pyarrow.RecordBatch``es —
    the lowest-overhead Python boundary Spark offers (no pandas
    conversion at all; columns arrive as Arrow buffers and results return
    as Arrow). The right tier when the logic is expressible in
    ``pyarrow.compute`` kernels: here min-max normalization of a numeric
    column against batch-local bounds computed ONCE per batch.

    Tier guide (all parity-pinned): Catalyst expression > mapInArrow
    (pyarrow.compute, zero-copy) > pandas UDF (columnar + pandas
    semantics) > row UDF (never in the hot path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _normalize(batches):
        for batch in batches:
            v = batch.column("v")
            lo = pc.min(v).as_py()
            hi = pc.max(v).as_py()
            span = (hi - lo) or 1.0
            norm = pc.divide(pc.subtract(v, pa.scalar(float(lo))),
                             pa.scalar(float(span)))
            yield pa.RecordBatch.from_arrays(
                [batch.column("id"), norm], names=["id", "v_norm"]
            )

    return _normalize
