"""PCA primitives (operators/pca.py): parity with numpy on real data.

The distributed Gram must equal numpy's ``X.T @ X`` on the same vectors,
and power iteration's top direction must match ``numpy.linalg.eigh``'s
dominant eigenvector up to sign (we canonicalize sign, numpy may not).
"""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.operators.pca import (
    gram_matrix,
    project_scalar,
    top_component,
)
from seoul_big_data_spark.sources.tables import load


@pytest.fixture(scope="module")
def xmat(spark, sf_dir):
    rows = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_matches_numpy(spark, sf_dir, xmat):
    got = {
        (r["i"], r["j"]): r["g"]
        for r in gram_matrix(load(spark, "embeddings", sf_dir)).collect()
    }
    want = xmat.T @ xmat
    d = xmat.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), g in got.items():
        assert g == pytest.approx(want[i - 1, j - 1], abs=1e-8)


def test_top_component_matches_eigh(spark, sf_dir, xmat):
    v = np.asarray(top_component(spark, load(spark, "embeddings", sf_dir)))
    assert v.shape == (xmat.shape[1],)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)
    evals, evecs = np.linalg.eigh(xmat.T @ xmat)
    ref = evecs[:, -1]
    assert abs(float(np.dot(v, ref))) > 0.9999

    # sign canonicalization: largest-|.| component is positive
    assert v[int(np.argmax(np.abs(v)))] > 0


def test_projection_matches_numpy(spark, sf_dir, xmat):
    emb = load(spark, "embeddings", sf_dir)
    v = top_component(spark, emb)
    rows = (
        emb.select("vec_id", project_scalar(emb, v).alias("p"))
        .orderBy("vec_id")
        .collect()
    )
    want = xmat @ np.asarray(v)
    got = np.asarray([r["p"] for r in rows])
    assert np.allclose(got, want, atol=1e-6)


def test_whitening_decorrelates(spark, sf_dir, xmat):
    """ZCA-whitened vectors must have ~identity covariance (the definition),
    and the one-pass moment sums must match numpy exactly."""
    from seoul_big_data_spark.operators.pca import (
        moment_sums,
        whiten,
        zca_whitening_matrix,
    )
    from seoul_big_data_spark.sources.tables import load as _load

    emb = _load(spark, "embeddings", sf_dir)
    n, s, g = moment_sums(emb)
    assert n == xmat.shape[0]
    np.testing.assert_allclose(s, xmat.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(g, xmat.T @ xmat, rtol=1e-9)

    mu, w = zca_whitening_matrix(n, s, g)
    rows = whiten(emb, mu, w).orderBy("vec_id").collect()
    y = np.asarray([r["whitened"] for r in rows], dtype=np.float64)
    cov = np.cov(y, rowvar=False)
    # eps=1e-5 regularization keeps it off exact identity; 1e-2 is ample
    np.testing.assert_allclose(cov, np.eye(y.shape[1]), atol=1e-2)
    # and W must be symmetric (ZCA property)
    np.testing.assert_allclose(w, w.T, rtol=1e-9, atol=1e-9)
