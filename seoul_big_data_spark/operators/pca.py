"""Distributed PCA primitives over an embedding column.

The scale shape for covariance/Gram-style statistics at 100 TB is
*map-side partial sums*: each Arrow batch contributes one d x d partial
Gram (numpy ``X.T @ X``, vectorized), so the shuffle moves
``n_partitions x d^2`` tiny rows instead of ``N x d`` vectors. For d=64
that is 4,096 floats per partition — the reduce is effectively free, and
the driver only ever sees the final d x d matrix (32 KB), never the data.

Power iteration for the top principal direction then runs driver-side on
that d x d matrix (deterministic start vector, fixed iteration count,
sign canonicalized), and the resulting eigenvector is broadcast back as a
literal array for a zero-shuffle projection pass.

Reference parity: the reference repo has no linear algebra at all (441
lines of pandas/JDBC ETL); this implements the standard corpus-curation
step (PCA whitening / top-component removal a la Arora et al.'s SIF) the
way a Spark pipeline would.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import lit_double_array


def gram_matrix(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangular Gram matrix sum_v v[i]*v[j] as rows (i, j, g).

    mapInPandas computes one float64 partial Gram per Arrow batch
    (``X.T @ X``), emits the d*(d+1)/2 upper-triangle entries, and a
    single groupBy(i, j) sums partials — map-side combine applies, the
    shuffle is O(partitions * d^2) regardless of N. float32 inputs are
    promoted to float64 before multiplying, so each product is exact
    (24+24 mantissa bits < 53) and only the additions round.
    """
    import numpy as np

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            if len(b) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]],
                dtype=np.float64,
            )
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu + 1, "j": ju + 1, "part": acc[iu, ju]}
        )

    parts = df.select(vec_col).mapInPandas(
        _partial, schema="i int, j int, part double"
    )
    return parts.groupBy("i", "j").agg(F.sum("part").alias("g"))


def top_component(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    n_iter: int = 100,
    round_to: int | None = None,
) -> list[float]:
    """Top eigenvector of the Gram matrix via driver-side power iteration.

    The distributed part is :func:`gram_matrix`; the d x d result (d^2
    floats) is the only thing collected. Deterministic: fixed all-ones
    start, fixed iteration count, sign fixed so the largest-|.|
    component is positive (ties broken by lowest index).

    ``round_to`` (r8): round each collected Gram entry to that many
    decimals before iterating — the Gram sums are the computation's one
    sum-order-dependent stage, so rounding pins the input matrix to a
    value any engine reproduces exactly (the cross-engine-oracle
    convention; see embedding_pc1_projection).
    """
    import numpy as np

    rows = gram_matrix(df, vec_col).collect()
    d = max(r["j"] for r in rows)
    g = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        val = round(r["g"], round_to) if round_to is not None else r["g"]
        g[r["i"] - 1, r["j"] - 1] = val
        g[r["j"] - 1, r["i"] - 1] = val
    v = np.ones(d, dtype=np.float64) / np.sqrt(d)
    for _ in range(n_iter):
        w = g @ v
        n = np.linalg.norm(w)
        if n == 0.0:
            break
        v = w / n
    pivot = int(np.argmax(np.abs(v)))
    if v[pivot] < 0:
        v = -v
    return [float(x) for x in v]


def project_scalar(df: DataFrame, direction: list[float], vec_col: str = "embedding"):
    """Dot product of each vector with a broadcast constant direction —
    pure ``aggregate``/``zip_with`` expression, zero shuffle, rides the
    scan inside codegen."""
    dir_col = lit_double_array(direction)
    return F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), dir_col, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def moment_sums(df: DataFrame, vec_col: str = "embedding", round_to: int | None = None):
    """(n, sum vector, Gram matrix) in ONE distributed pass: each Arrow
    batch contributes float64 partials (count scalar, d sums, d x d Gram —
    ``X.T @ X``), keyed so a single groupBy reduces them; the driver
    collects d^2 + d + 1 floats total, never data. Returns
    ``(n, mu: np.ndarray(d), gram: np.ndarray(d, d))``.
    """
    import numpy as np

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for b in batches:
            if len(b) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]],
                dtype=np.float64,
            )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if s is None:
            return
        d = s.shape[0]
        rows = [{"i": 0, "j": 0, "part": float(n)}]
        rows += [{"i": int(i) + 1, "j": 0, "part": float(s[i])} for i in range(d)]
        iu, ju = np.triu_indices(d)
        rows += [
            {"i": int(a) + 1, "j": int(b) + 1, "part": float(g[a, b])}
            for a, b in zip(iu, ju)
        ]
        yield pd.DataFrame(rows)

    parts = (
        df.select(vec_col)
        .mapInPandas(_partial, schema="i int, j int, part double")
        .groupBy("i", "j")
        .agg(F.sum("part").alias("v"))
        .collect()  # d^2 + d + 1 scalars — catalog-sized driver state
    )
    import numpy as np

    d = max(r["i"] for r in parts)  # i is 1-based over dims; 0 row is n
    n = 0.0
    s = np.zeros(d, dtype=np.float64)
    g = np.zeros((d, d), dtype=np.float64)
    for r in parts:
        i, j, v = r["i"], r["j"], r["v"]
        if round_to is not None and not (i == 0 and j == 0):
            # r8 cross-engine contract: the moment sums are the pipeline's
            # only sum-order-dependent stage; rounding pins them to values
            # any engine reproduces exactly (see embedding_whitening) —
            # essential when n < d leaves cov rank-deficient and the
            # (cov+eps I)^-1 condition number would otherwise amplify
            # sub-ulp moment noise into the output.
            v = round(v, round_to)
        if i == 0 and j == 0:
            n = v
        elif j == 0:
            s[i - 1] = v
        else:
            g[i - 1, j - 1] = v
            g[j - 1, i - 1] = v
    return int(n), s, g


def zca_whitening_matrix(n: int, s, g, eps: float = 1e-5):
    """ZCA whitening transform from one-pass moment sums: cov =
    (G - n mu mu^T)/(n-1); W = E diag(1/sqrt(lambda+eps)) E^T (symmetric
    eigendecomposition — deterministic for a symmetric input). Returns
    ``(mu, W)`` as float64 arrays; apply as (x - mu) @ W (W symmetric)."""
    import numpy as np

    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    lam, e = np.linalg.eigh(cov)
    w = (e * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ e.T
    return mu, w


def whiten(
    df: DataFrame,
    mu,
    w,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply a broadcast whitening transform: (X - mu) @ W per Arrow batch
    (numpy matmul — vectorized, no per-row Python). Zero shuffle: the
    transform rides the scan. Returns (id, whitened array<double>)."""
    import numpy as np

    mu64 = np.asarray(mu, dtype=np.float64)
    w64 = np.asarray(w, dtype=np.float64)

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]],
                dtype=np.float64,
            )
            y = (x - mu64) @ w64
            yield pd.DataFrame({id_col: b[id_col], "whitened": list(y)})

    return df.select(id_col, vec_col).mapInPandas(
        _apply, schema=f"{id_col} bigint, whitened array<double>"
    )
