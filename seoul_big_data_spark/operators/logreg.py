"""Distributed logistic regression via IRLS / Newton sufficient statistics.

The corpus-curation use case: classifier-based quality filtering (the
FineWeb/DCLM recipe) scores every document with a small logistic model; at
100 TB the *data* never moves — each Newton iteration is ONE distributed
pass computing the (d+1)x(d+1) Hessian and (d+1) gradient as map-side
float64 partial sums per Arrow batch (same shape as operators/pca.py's
Gram), and the driver solves the tiny system. d is feature count (single
digits), so per-iteration shuffle traffic is O(partitions * d^2) floats —
independent of N.

Determinism: fixed iteration count, float64 throughout, zero start vector,
ridge-regularized solve (no data-dependent convergence test), so the
coefficients are bit-stable across partitionings up to float-sum rounding
(pinned at 1e-6 against an independent numpy IRLS in tests/test_logreg.py).

Reference parity: the reference (441-line pandas/JDBC ETL) has no modeling
surface at all; this is engine breadth the LLM-pipeline family needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_fit_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 6,
    ridge: float = 1e-6,
) -> list[float]:
    """Fit logistic regression; returns [intercept, coef_1..coef_d].

    Each of the ``n_iter`` Newton steps runs one job: mapInPandas emits the
    upper triangle of X'WX plus X'(y-p) as (i, j, part) rows, a single
    groupBy sums partials (map-side combine), and the driver collects
    O(d^2) scalars and solves. The input should be a projection of just the
    feature/label columns so the scan is column-pruned.
    """
    import numpy as np

    d = len(feature_cols) + 1  # + intercept
    beta = np.zeros(d, dtype=np.float64)

    def make_pass(beta_now: "np.ndarray"):
        b = beta_now.copy()

        def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            a_acc, g_acc = None, None
            for batch in batches:
                if len(batch) == 0:
                    continue
                x = np.column_stack(
                    [np.ones(len(batch))]
                    + [batch[c].to_numpy(dtype=np.float64) for c in feature_cols]
                )
                y = batch[label_col].to_numpy(dtype=np.float64)
                eta = np.clip(x @ b, -30.0, 30.0)
                p = 1.0 / (1.0 + np.exp(-eta))
                w = p * (1.0 - p)
                a = (x * w[:, None]).T @ x
                g = x.T @ (y - p)
                a_acc = a if a_acc is None else a_acc + a
                g_acc = g if g_acc is None else g_acc + g
            if a_acc is None:
                return
            iu, ju = np.triu_indices(d)
            rows = [
                {"i": int(i), "j": int(j), "part": float(a_acc[i, j])}
                for i, j in zip(iu, ju)
            ]
            rows += [{"i": int(i), "j": -1, "part": float(g_acc[i])} for i in range(d)]
            yield pd.DataFrame(rows)

        return _partial

    proj = df.select(*feature_cols, label_col)
    for _ in range(n_iter):
        parts = (
            proj.mapInPandas(make_pass(beta), schema="i int, j int, part double")
            .groupBy("i", "j")
            .agg(F.sum("part").alias("v"))
            .collect()  # O(d^2) scalars — catalog-sized driver state
        )
        a = np.zeros((d, d), dtype=np.float64)
        g = np.zeros(d, dtype=np.float64)
        for r in parts:
            if r["j"] == -1:
                g[r["i"]] = r["v"]
            else:
                a[r["i"], r["j"]] = r["v"]
                a[r["j"], r["i"]] = r["v"]
        beta = beta + np.linalg.solve(a + ridge * np.eye(d), g)
    return [float(x) for x in beta]


def logreg_score(
    df: DataFrame, feature_cols: list[str], beta: list[float]
) -> "F.Column":
    """Sigmoid score column from broadcast coefficients — a pure codegen'd
    expression (no UDF): rides the scan, zero shuffle."""
    eta = F.lit(float(beta[0]))
    for c, b in zip(feature_cols, beta[1:]):
        eta = eta + F.col(c).cast("double") * float(b)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
