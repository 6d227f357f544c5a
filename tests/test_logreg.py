"""Distributed IRLS logistic regression (operators/logreg.py) vs an
independently-coded numpy IRLS on the same collected feature matrix: the
sufficient-statistics path must reproduce the exact Newton iterates."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from seoul_big_data_spark.functions import text as tx
from seoul_big_data_spark.operators.logreg import logreg_fit_irls, logreg_score
from seoul_big_data_spark.sources.tables import load


def _features(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    return d.select(
        F.log(F.col("n_chars") + 1.0).alias("f1"),
        tx.token_count(F.col("text")).cast("double").alias("f2"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )


def _numpy_irls(x, y, n_iter=6, ridge=1e-6):
    xs = np.column_stack([np.ones(len(x)), x])
    beta = np.zeros(xs.shape[1])
    for _ in range(n_iter):
        eta = np.clip(xs @ beta, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-eta))
        w = p * (1.0 - p)
        a = (xs * w[:, None]).T @ xs
        g = xs.T @ (y - p)
        beta = beta + np.linalg.solve(a + ridge * np.eye(xs.shape[1]), g)
    return beta


def test_irls_matches_numpy(spark, sf_dir):
    feats = _features(spark, sf_dir)
    got = logreg_fit_irls(feats, ["f1", "f2"], "y", n_iter=6)

    rows = feats.collect()
    x = np.array([[r["f1"], r["f2"]] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    want = _numpy_irls(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_scores_separate_and_calibrate(spark, sf_dir):
    feats = _features(spark, sf_dir)
    beta = logreg_fit_irls(feats, ["f1", "f2"], "y", n_iter=6)
    scored = feats.withColumn("s", logreg_score(feats, ["f1", "f2"], beta))
    r = scored.agg(
        F.avg("s").alias("mean_s"), F.avg("y").alias("base_rate")
    ).first()
    # a fitted logistic model's mean prediction equals the base rate
    # (score equation for the intercept) — a strong end-to-end invariant
    assert abs(r["mean_s"] - r["base_rate"]) < 1e-6
