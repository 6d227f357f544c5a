"""Similarity search over embedding columns (north-star N3, SURVEY.md §2.10).

Two tiers:
- brute-force top-k: query-set × corpus join with native dot-product
  expressions + a row_number window — exact, O(|Q|·N); the right baseline and
  fine whenever |Q| is small (broadcast the queries, never the corpus).
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; queries
  probe only their own bucket (plus optional neighbor probes), turning the
  scan into a hash-partitioned lookup — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import (
    cosine,
    dot,
    lit_double_array,
    random_hyperplane_signs,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is broadcast (small side); the corpus streams through the
    join — one pass over the data, no corpus shuffle. Result columns:
    query_id, neighbor_id, score, rk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine("q_vec", "c_vec").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


# Query-directed probing sequence over margin-ranked plane positions
# (Lv et al., "Multi-Probe LSH", VLDB'07 — approximated with a static
# pattern over the per-query margin ranking: position p means "the plane
# with the (p+1)-th smallest |dot|"). Each tuple is one perturbation set;
# the expected quality order interleaves 2-bit sets among 1-bit ones.
_PROBE_PATTERN: list[tuple[int, ...]] = [
    (0,), (1,), (0, 1), (2,), (0, 2), (3,), (1, 2), (0, 3), (4,), (1, 3),
    (2, 3), (0, 4), (5,), (0, 1, 2), (1, 4), (2, 4), (6,), (3, 4), (7,),
]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 1,
    probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: both sides signed against the same fixed random
    hyperplanes; candidates are corpus rows sharing one of the query's probe
    buckets.

    ``multi_probe``: 1 probes only the query's own bucket; 2 also probes
    every bucket at Hamming distance 1 (flip each sign bit) — the blanket
    recall/cost dial (n_planes+1 probes per query).

    ``probes`` (overrides ``multi_probe``): query-adaptive multi-probe —
    probe exactly ``probes`` buckets, chosen by flipping the planes with the
    smallest |margin| (dot products nearest the boundary), following the
    multi-probe LSH perturbation sequence. Same recall knob, but the probe
    count no longer grows with the plane count, so signature width (bucket
    granularity) and probe budget (read amplification) tune independently —
    the property that matters at 100 TB where each probe is a partition read.

    Probes are exploded on the (small, broadcast) query side only; the
    corpus is signed once. At scale the corpus is written bucketed/
    partitioned by ``bucket`` so a probe touches one partition — the
    IVF-style inverted-file layout expressed with plain hash partitioning.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        random_hyperplane_signs(vec_col, planes).alias("bucket"),
    )
    q_sig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        random_hyperplane_signs(vec_col, planes).alias("_sig"),
    )
    nb = len(planes)
    if probes is not None and probes > 1:
        # margin-ranked plane order: _rank[p] = index of the plane with the
        # (p+1)-th smallest |dot(query, plane)|
        dots = F.array(
            *[
                dot(F.col(vec_col), lit_double_array(pl))
                for pl in planes
            ]
        )
        # margins rounded to 6 decimals before ranking (the repo's
        # cell-assignment convention): sub-ulp cross-engine noise can never
        # reorder planes, ties break on the plane index
        ranked = F.transform(
            F.array_sort(
                F.zip_with(
                    F.transform(dots, lambda d: F.round(F.abs(d), 6)),
                    F.array(*[F.lit(i) for i in range(nb)]),
                    lambda m, i: F.struct(m.alias("m"), i.alias("i")),
                )
            ),
            lambda s: s["i"],
        )
        q_sig = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            random_hyperplane_signs(vec_col, planes).alias("_sig"),
            ranked.alias("_rank"),
        )
        sets = [s for s in _PROBE_PATTERN if all(p < nb for p in s)]
        flips = [F.col("_sig")]
        for pset in sets[: probes - 1]:
            flip_planes = F.array(*[F.element_at("_rank", p + 1) for p in pset])
            flipped = F.concat_ws(
                "",
                F.zip_with(
                    F.slice(F.split("_sig", ""), 1, nb),
                    F.array(*[F.lit(i) for i in range(nb)]),
                    lambda b, i: F.when(
                        F.array_contains(flip_planes, i),
                        F.when(b == "1", "0").otherwise("1"),
                    ).otherwise(b),
                ),
            )
            flips.append(flipped)
        q = (
            q_sig.withColumn("bucket", F.explode(F.array(*flips)))
            .drop("_sig", "_rank")
            .distinct()
        )
    elif multi_probe <= 1:
        q = q_sig.withColumn("bucket", F.col("_sig")).drop("_sig")
    else:
        flips = [F.col("_sig")] + [
            F.concat(
                F.substring("_sig", 1, i),
                F.when(F.substring("_sig", i + 1, 1) == "1", "0").otherwise("1"),
                F.substring("_sig", i + 2, nb - i - 1),
            )
            for i in range(nb)
        ]
        q = (
            q_sig.withColumn("bucket", F.explode(F.array(*flips)))
            .drop("_sig")
            .distinct()
        )
    scored = c.join(
        F.broadcast(q),
        (c.bucket == q.bucket) & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("score")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def mmr_rerank(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[tuple[int, int, float, float]]":
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR'98):
    select ``k`` results balancing relevance to the query against redundancy
    with already-selected results — the standard diversity pass RAG
    retrieval runs after ANN candidate generation.

    Two stages, each in its right place:

    1. DISTRIBUTED candidate generation: cosine against the broadcast query
       vector riding the corpus scan (codegen'd zip_with/aggregate), top
       ``pool`` via sort+limit — TakeOrderedAndProject, one corpus pass, no
       corpus shuffle.
    2. DRIVER greedy selection over the pool: MMR is inherently sequential
       (step t depends on the t-1 already picked), so it runs on the
       collected pool — BOUNDED state (pool * dim floats, pool <= dozens by
       contract), same legitimacy class as k-means centroids. The pool x
       pool cosine matrix is numpy-vectorized.

    Deterministic: candidate ties broken by id at stage 1; argmax ties at
    stage 2 resolved to the lowest candidate index (numpy argmax contract).
    Returns [(sel_rank, id, relevance, mmr_score)] for the k selections.
    """
    import numpy as np

    qarr = lit_double_array(query_vec)
    cand = (
        corpus.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).cast("array<double>").alias("v"),
            cosine(qarr, F.col(vec_col)).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("nid"))
        .limit(pool)
        .collect()  # bounded: `pool` rows of dim floats — driver state by design
    )
    if not cand:
        return []
    ids = [r["nid"] for r in cand]
    rel = np.array([r["rel"] for r in cand], dtype=np.float64)
    x = np.array([r["v"] for r in cand], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0.0] = 1.0
    xn = x / norms[:, None]
    sim = xn @ xn.T  # pool x pool cosine, vectorized
    selected: list[int] = []
    out = []
    remaining = list(range(len(ids)))
    for rank in range(1, min(k, len(ids)) + 1):
        if not selected:
            scores = rel[remaining]
        else:
            red = sim[np.ix_(remaining, selected)].max(axis=1)
            scores = lam * rel[remaining] - (1.0 - lam) * red
        pick = remaining[int(np.argmax(scores))]
        out.append(
            (rank, ids[pick], float(rel[pick]), float(scores[int(np.argmax(scores))]))
        )
        selected.append(pick)
        remaining.remove(pick)
    return out


def label_centroid(
    df: DataFrame, label: int, label_col: str = "label", vec_col: str = "embedding"
) -> list[float]:
    """Mean vector of one label's embeddings — the distributed aggregate is
    posexplode + per-dim avg; the driver collects d scalars (catalog-sized),
    typically to serve as a query/prototype vector."""
    rows = (
        df.filter(F.col(label_col) == label)
        .select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("cx"))
        .collect()  # d scalars
    )
    out = [0.0] * (max(r["i"] for r in rows) + 1)
    for r in rows:
        out[r["i"]] = float(r["cx"])
    return out


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with Arrow-batched BLAS scoring — the fast twin
    of ``brute_force_topk`` for when the probe set is catalog-sized.

    The expression-based form evaluates the dot product as a per-element
    higher-order function — correct, engine-native, but interpreted (HOFs
    sit outside whole-stage codegen). Here the (|Q|×dim) probe matrix rides
    the closure (same catalog-sized-state convention as IVF centroids and
    PQ codebooks) and every corpus batch scores against ALL probes with one
    ``C @ Q.T`` matmul — the 10-100x Arrow/numpy win the PQ kernels
    already use. The corpus still streams exactly once, nothing
    corpus-sized is collected, and ranking/tie-breaks stay identical to
    ``brute_force_topk`` (score desc, neighbor_id asc).
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()  # |Q| × dim only
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def _score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(cm, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            s = (cm / norms) @ qm.T  # (batch × |Q|) in one BLAS call
            nb = pdf["neighbor_id"].to_numpy()
            b, nq = s.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, b),
                    "neighbor_id": np.repeat(nb, nq),
                    "score": s.ravel(),
                }
            )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.mapInPandas(
        _score, schema="query_id long, neighbor_id long, score double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
