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
