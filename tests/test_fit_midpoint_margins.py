"""Midpoint-distance guards for the rounded-fit oracle conversions
(VERDICT r8 #6).

The r8 conversions pin each learned fit cross-engine by rounding its ONE
sum-order-dependent stage to 6 decimals (kmeans/PQ per-cell means each
Lloyd iteration; the pc1 Gram; the whitening moments). The safety argument
is measure-zero: sub-ulp accumulation noise between engines only flips a
round() when the true value sits within ~an ulp of a 1e-6 midpoint. These
tests make that argument EMPIRICAL for the data the gate actually runs on
(sf0.001 and sf0.01): every value the production fits pass through
round(·, 6) must sit at scaled distance > 1e-3 from the nearest midpoint
(the same loud-fail bound as the IRLS beta guard, q_mlprep.py) — so a
midpoint landing fails here in pytest instead of red at a future gate.

The trajectories are replayed in numpy mirrors whose equality to the Spark
fits is already pinned (tests/test_ivf.py::test_kmeans_matches_numpy,
tests/test_pq.py::test_pq_fit_matches_numpy_with_rounding_contract,
tests/test_pca.py). Production parameters only: kmeans k=8/iters=3 and
PQ m=8/k=64 (q_ml.py::_ivf_centroids/_pq_codebooks defaults), the pc1
Gram, the whitening moments.

The bound is in ULPS of each value, not a flat scaled distance: these fits
round thousands of values (PQ: 8 subspaces x 64 cells x 5 iters x 8 dims),
so the MINIMUM scaled margin over the family is small by uniform-order
statistics alone (~1/2n) while still being astronomically larger than the
cross-engine divergence, which is accumulation-order noise of at most
~1e2 ulps. Requiring > 1e4 ulps catches a genuine near-midpoint landing
(<= ~1e2 ulps would actually flip) with 25x measured headroom on the
worst family (PQ at sf0.01: 2.5e5 ulps)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest

MIN_ULPS = 1e4


def _assert_margins(vals, what: str):
    vals = np.asarray(vals, dtype=np.float64).ravel()
    if not len(vals):
        return
    y = np.abs(vals) * 1e6
    frac = y - np.floor(y)
    dist_val = np.abs(frac - 0.5) / 1e6  # value-space distance to midpoint
    ulps = dist_val / np.spacing(np.abs(vals) + 1e-300)
    worst = ulps.min()
    assert worst > MIN_ULPS, (
        f"{what}: value within {worst:.0f} ulps of a 1e-6 rounding "
        "midpoint — the cross-engine HALF_UP vs scaled-multiply round may "
        "diverge the fit trajectory at the gate"
    )


def _load(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    return ids, x


def _md5_seed_order(ids):
    return sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )


SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kmeans_fit_means_clear_of_midpoints(sf_dir):
    ids, x = _load(sf_dir)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    v = np.where(norms > 0, x / np.where(norms == 0, 1, norms), x)
    order = _md5_seed_order(ids)
    k, iters = 8, 3  # q_ml.py::_ivf_centroids production defaults
    cents = v[order[:k]].copy()
    for it in range(iters):
        cells = np.argmax(v @ cents.T, axis=1)
        nxt = cents.copy()
        for c in range(k):
            members = v[cells == c]
            if len(members):
                raw = members.mean(axis=0)  # the pre-round quantity
                _assert_margins(raw, f"kmeans iter {it} cell {c} mean")
                m = np.round(raw, 6)
                n = np.linalg.norm(m)
                nxt[c] = m / n if n > 0 else m
        cents = nxt


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pq_fit_means_clear_of_midpoints(sf_dir):
    ids, x = _load(sf_dir)
    m_sub, k, iters = 8, 64, 5  # q_ml.py::_pq_codebooks + pq_fit defaults
    d_sub = x.shape[1] // m_sub
    order = _md5_seed_order(ids)
    for s in range(m_sub):
        xs = x[:, s * d_sub : (s + 1) * d_sub]
        cb = xs[order[:k]].copy()
        for it in range(iters):
            d2 = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            cells = np.argmin(d2, axis=1)
            nxt = cb.copy()
            for c in range(k):
                members = xs[cells == c]
                if len(members):
                    raw = members.mean(axis=0)
                    _assert_margins(
                        raw, f"pq sub {s} iter {it} cell {c} mean"
                    )
                    nxt[c] = np.round(raw, 6)
            cb = nxt


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pc1_gram_clear_of_midpoints(sf_dir):
    _, x = _load(sf_dir)
    gram = x.T @ x  # operators/pca.py::gram_matrix, pre-round
    iu, ju = np.triu_indices(gram.shape[0])
    _assert_margins(gram[iu, ju], "pc1 gram entry")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_whitening_moments_clear_of_midpoints(sf_dir):
    _, x = _load(sf_dir)
    s = x.sum(axis=0)  # operators/pca.py::moment_sums, pre-round
    gram = x.T @ x
    _assert_margins(s, "whitening sum vector")
    iu, ju = np.triu_indices(gram.shape[0])
    _assert_margins(gram[iu, ju], "whitening gram entry")
