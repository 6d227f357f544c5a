"""Product quantization (PQ) for the embedding column — the memory side of
the ANN-at-scale story (IVF partitions the corpus, PQ compresses it).

A dim-d vector is split into ``m`` contiguous subvectors; each subspace gets
its own k-codeword codebook (plain L2 Lloyd, md5-deterministic seeding as in
``operators/ivf.py``), and a vector is stored as m small integer codes —
dim×4 bytes shrink to m bytes at k ≤ 256. Search decodes against the
broadcast codebooks (reconstruction-based asymmetric scoring), so the
corpus is never re-read at full width.

Scale shape (100 TB): codebooks are tiny (m × k × dim/m = dim × k floats —
driver-side by construction); fitting scans the corpus once per Lloyd
iteration with a map-side-combined (cell → per-dim mean) aggregate, and in
production is run on an md5-deterministic sample (q_dq.py convention) with
one full-corpus encode afterwards. Encode/decode are Arrow-batched pandas
UDFs — this is the genuinely-numeric kernel where vectorized numpy over
Arrow batches beats interpreted expression trees by orders of magnitude
(the codebook lives once per executor as a numpy constant instead of being
re-materialized per row by a literal-array expression), and they stay
zero-shuffle map work riding the scan.

Everything is deterministic (md5 seeding, fixed iterations, ties to the
lowest code), so re-runs and backfills produce byte-identical codes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cb_array(codebooks):
    """codebooks[s][code] -> numpy (m, k, d_sub) float64."""
    import numpy as np

    return np.asarray(codebooks, dtype=np.float64)


def _nearest_sub_udf(codebook):
    """pandas UDF: subvector column -> nearest codeword id (argmin squared
    L2, ties to the lowest code — numpy argmin keeps the first minimum)."""
    import numpy as np

    cb = np.asarray(codebook, dtype=np.float64)  # (k, d_sub)

    @F.pandas_udf("int")
    def nearest(col: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.argmin(d2, axis=1).astype("int32"))

    return nearest


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Fit m per-subspace codebooks (k codewords each); returns
    ``codebooks[s][code] -> list[float]`` of length dim/m.

    Seeding per subspace: the k subvectors with the smallest md5(id) — the
    same deterministic draw ``kmeans_fit`` uses. Each Lloyd iteration is one
    hash aggregate per subspace (assign → per-dim avg with map-side partial
    sums); empty cells keep their previous codeword.
    """
    from ..session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    d = dim_row["d"]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    d_sub = d // m
    sliced = df.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
        *[
            F.transform(
                F.slice(vec_col, s * d_sub + 1, d_sub), lambda x: x.cast("double")
            ).alias(f"_v{s}")
            for s in range(m)
        ],
    ).cache()
    try:
        seeds = sliced.orderBy("_h", "_id").limit(k).collect()
        codebooks: list[list[list[float]]] = [
            [list(r[f"_v{s}"]) for r in seeds] for s in range(m)
        ]
        for s in range(m):
            for _ in range(iters):
                nearest = _nearest_sub_udf(codebooks[s])
                # Per-cell means ROUNDED to 6 decimals (r8): the fit's one
                # sum-order-dependent stage — rounding pins each iteration's
                # codebooks to values any engine reproduces exactly (the
                # kmeans_fit convention), which is what lets the PQ queries'
                # oracles replay the whole fit in DuckDB SQL. Every other
                # stage (slicing, squared-L2 argmin over <=128-element
                # sequential sums, code lookup) is already bit-exact.
                means = (
                    sliced.select(
                        nearest(f"_v{s}").alias("cell"),
                        f"_v{s}",
                    )
                    .groupBy("cell")
                    .agg(
                        *[
                            F.round(
                                F.avg(F.element_at(f"_v{s}", i + 1)), 6
                            ).alias(f"c{i}")
                            for i in range(d_sub)
                        ]
                    )
                    .collect()
                )
                nxt = list(codebooks[s])  # empty cells keep their codeword
                for r in means:
                    nxt[r["cell"]] = [r[f"c{i}"] for i in range(d_sub)]
                codebooks[s] = nxt
        return codebooks
    finally:
        sliced.unpersist()


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Add ``out_col``: array<int> of length m — the PQ codes. One Arrow-
    batched pandas UDF computes all m argmins per batch (numpy broadcast
    over (batch, k, d_sub)); zero shuffle, rides the scan."""
    import numpy as np

    from ..session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    cb = _cb_array(codebooks)  # (m, k, d_sub)
    m, _, d_sub = cb.shape

    @F.pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        out = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            sub = x[:, s * d_sub:(s + 1) * d_sub]
            d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series([[int(c) for c in row] for row in out])

    return df.withColumn(out_col, enc(vec_col))


def pq_decode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    codes_col: str = "pq_codes",
    out_col: str = "pq_vec",
) -> DataFrame:
    """Reconstruct the approximate vector from codes: numpy take + concat
    against the executor-resident codebook constant (Arrow-batched)."""
    import numpy as np

    from ..session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    cb = _cb_array(codebooks)  # (m, k, d_sub)
    m = cb.shape[0]

    @F.pandas_udf("array<double>")
    def dec(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        codes = np.asarray([np.asarray(c, dtype=np.int64) for c in col])
        parts = [cb[s][codes[:, s]] for s in range(m)]  # each (batch, d_sub)
        rec = np.concatenate(parts, axis=1)
        return pd.Series([row.tolist() for row in rec])

    return df.withColumn(out_col, dec(codes_col))
