"""Similarity search over ``embeddings`` + multimodal column plumbing
(north-star N3/N5, SURVEY.md §2.10).

The brute-force top-k is the exact baseline (oracle: DuckDB
``list_cosine_similarity``); the LSH variant is the 100 TB path (rows-only —
bucketing is hash-engine-specific; recall asserted in tests/test_similarity.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.vector import cosine, dot, lit_double_array, lit_double_matrix, norm
from .operators.ivf import (
    ivf_topk,
    kmeans_fit,
    semantic_dedup_pairs,
    semantic_dedup_pairs_windowed,
)
from .operators.pq import pq_decode, pq_encode, pq_fit
from .operators.similarity import brute_force_topk, brute_force_topk_np, lsh_topk
from .registry import query
from .sources.tables import load

_N_QUERIES = 5  # probe vectors = the first 5 vec_ids


def _sql_dot(a: str, b: str) -> str:
    """Sequential double dot product — the DuckDB twin of functions.vector.dot
    (same left-to-right accumulation order, same per-element double cast)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def _sql_norm(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a}, "
        "y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))"
    )


# Shared LSH signature CTEs: md5-derived hyperplanes (the SQL twin of
# _fixed_planes), per-(vector, plane) sequential-double dots, and the
# sign-bit signature string. Used by lsh_bucket_assignment_md5 and the
# hash-checked ANN ranking oracles (similarity_lsh_ann's Hamming-1 probes
# and similarity_lsh_ann_adaptive's margin-ranked probe sequence).
_SQL_LSH_SIG = f"""planes AS (
      SELECT p, list_transform(generate_series(0, 63), d ->
               ('0x' || substr(md5('plane' || CAST(p AS VARCHAR) || ':'
                                   || CAST(d AS VARCHAR)), 1, 8))::BIGINT
                 / 2147483648.0 - 1.0) AS plane
      FROM (SELECT unnest(generate_series(0, 7)) AS p)
    ), sp AS (
      SELECT e.vec_id, pl.p, {_sql_dot('e.embedding', 'pl.plane')} AS s
      FROM embeddings e CROSS JOIN planes pl
    ), sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM sp GROUP BY vec_id
    )"""

# Candidate scoring + ranking tail shared by the ANN ranking oracles: the
# brute-force recipe (rank on the raw bit-identical cosine, neighbor_id
# tie-break, 4-decimal display round).
_SQL_ANN_RANK_TAIL = """
    scored AS (
      SELECT ca.query_id, ca.neighbor_id,
             CAST(list_cosine_similarity(q.embedding, c.embedding)
                  AS DOUBLE) AS s
      FROM cand ca
      JOIN embeddings q ON q.vec_id = ca.query_id
      JOIN embeddings c ON c.vec_id = ca.neighbor_id
    )
    SELECT query_id, neighbor_id, round(s, 4) AS score, rk FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """


def _lsh_hamming1_oracle_sql(nb: int = 8) -> str:
    """similarity_lsh_ann's oracle: the query's own bucket plus every
    Hamming-1 bit flip (nb+1 probes/query), candidates joined on bucket,
    then the shared exact-cosine ranking tail."""
    flips = [
        f"""SELECT query_id, substr(sig, 1, {i - 1})
             || (CASE WHEN substr(sig, {i}, 1) = '1' THEN '0' ELSE '1' END)
             || substr(sig, {i + 1}, {nb - i}) AS bucket FROM qs"""
        for i in range(1, nb + 1)
    ]
    probe_union = "\n      UNION ALL\n      ".join(
        ["SELECT query_id, sig AS bucket FROM qs"] + flips
    )
    return f"""
    WITH {_SQL_LSH_SIG},
    qs AS (
      SELECT vec_id AS query_id, bucket AS sig FROM sig
      WHERE vec_id < {_N_QUERIES}
    ),
    probes AS (
      SELECT DISTINCT query_id, bucket FROM (
      {probe_union}
      )
    ),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
      FROM probes p
      JOIN sig c ON c.bucket = p.bucket AND c.vec_id <> p.query_id
    ),
    {_SQL_ANN_RANK_TAIL}"""


def _lsh_adaptive_oracle_sql(nb: int = 8, probes: int = 12) -> str:
    """similarity_lsh_ann_adaptive's oracle (ADVICE r7 / VERDICT r6 #6):
    the query-adaptive multi-probe sequence rendered in SQL. Per query, the
    plane margin ranking is list(p ORDER BY round(abs(dot), 6), p) — the
    same 6-decimal margin round the Spark side applies before ranking, so
    sub-ulp cross-engine noise can never reorder planes — and each probe in
    the (static) perturbation pattern flips the chars of the signature at
    the margin-ranked plane positions. Candidates and ranking then follow
    the shared brute-force recipe."""
    from .operators.similarity import _PROBE_PATTERN

    sets = [s for s in _PROBE_PATTERN if all(p < nb for p in s)][: probes - 1]

    def flip_sql(pset: tuple) -> str:
        ranked = ", ".join(f"rnk[{p + 1}]" for p in pset)
        return f"""SELECT query_id, array_to_string(
        list_transform(generate_series(0, {nb - 1}), i ->
          CASE WHEN list_contains([{ranked}], i)
               THEN (CASE WHEN substr(sig, i + 1, 1) = '1'
                          THEN '0' ELSE '1' END)
               ELSE substr(sig, i + 1, 1) END), '') AS bucket FROM qs"""

    probe_union = "\n      UNION ALL\n      ".join(
        ["SELECT query_id, sig AS bucket FROM qs"] + [flip_sql(s) for s in sets]
    )
    return f"""
    WITH {_SQL_LSH_SIG},
    qm AS (
      SELECT vec_id AS query_id,
             list(p ORDER BY round(abs(s), 6), p) AS rnk
      FROM sp WHERE vec_id < {_N_QUERIES} GROUP BY vec_id
    ),
    qs AS (
      SELECT s.vec_id AS query_id, s.bucket AS sig, qm.rnk
      FROM sig s JOIN qm ON qm.query_id = s.vec_id
    ),
    probes AS (
      SELECT DISTINCT query_id, bucket FROM (
      {probe_union}
      )
    ),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
      FROM probes p
      JOIN sig c ON c.bucket = p.bucket AND c.vec_id <> p.query_id
    ),
    {_SQL_ANN_RANK_TAIL}"""


@query(
    "similarity_brute_force_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
      WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      -- CAST to DOUBLE before round: DuckDB's round() on a FLOAT-typed
      -- expression stays in float32, whose widened repr (0.24529999...)
      -- differs from Spark's double round (0.2453).
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(list_cosine_similarity(q.q_vec, c.embedding) AS DOUBLE) AS s
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(s, 4) AS score, rk FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """,
)
def similarity_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — exact cosine top-10 for 5 probe vectors: broadcast the probes,
    stream the corpus once, per-query row_number window
    (operators/similarity.py::brute_force_topk)."""
    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = brute_force_topk(emb, queries, k=10)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rk"
    )


@query(
    "similarity_norms",
    """
    SELECT vec_id, label,
           round(sqrt(list_dot_product(embedding, embedding)), 4) AS l2_norm,
           CAST(len(embedding) AS INTEGER) AS dim
    FROM embeddings
    """,
)
def similarity_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — vector math layer sanity surface: norms + dims as native
    higher-order functions (functions/vector.py)."""
    emb = load(spark, "embeddings", sf_dir)
    return emb.select(
        "vec_id",
        "label",
        F.round(norm("embedding"), 4).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


@query(
    "similarity_label_centroid_dist",
    """
    WITH pos AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
      FROM embeddings
    ), cent AS (
      SELECT label, i, avg(x) AS cx FROM pos GROUP BY label, i
    ), carr AS (
      SELECT label, list(cx ORDER BY i) AS centroid FROM cent GROUP BY label
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding, c.centroid), 4)
             AS centroid_cos
    FROM embeddings e JOIN carr c ON e.label = c.label
    """,
)
def similarity_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — per-label centroid, then each vector's cosine to its own
    centroid (grouped vector aggregation via posexplode + re-assemble)."""
    emb = load(spark, "embeddings", sf_dir)
    pos = emb.select("vec_id", "label", F.posexplode("embedding").alias("i", "x"))
    centroids = (
        pos.groupBy("label", "i")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select(
            "label", F.transform("pairs", lambda p: p["cx"]).alias("centroid")
        )
    )
    joined = emb.join(F.broadcast(centroids), "label")
    return joined.select(
        "vec_id",
        "label",
        F.round(cosine("embedding", "centroid"), 4).alias("centroid_cos"),
    )


@query("similarity_lsh_ann", _lsh_hamming1_oracle_sql())
def similarity_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 scale path — random-hyperplane LSH ANN (8 planes → 256 buckets),
    Hamming-1 multi-probe (9 probes/query) for recall. Planes are fixed/
    deterministic (seeded from plane index via md5). Recall vs brute force
    asserted in tests/test_similarity.py.

    Hash-checked (r7, VERDICT r6 #6): the bucket stage is the proven
    lsh_bucket_assignment_md5 arithmetic (sign bits of sequential-double
    dots — exact cross-engine), the probe set is a deterministic string
    transform of the signature, and the candidate ranking follows the
    brute-force recipe — rank on the raw bit-identical cosine with
    neighbor_id tie-break, 4-decimal display round."""
    emb = load(spark, "embeddings", sf_dir)
    planes = _fixed_planes(n_planes=8, dim=64)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = lsh_topk(emb, queries, planes, k=10, multi_probe=2)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rk"
    )


def _fixed_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state, reproducible
    across sessions): md5-seeded values in [-1, 1)."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}:{d}".encode()).digest()
            vals.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
        planes.append(vals)
    return planes


# --- multimodal column plumbing (N5) ----------------------------------------


@query(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — opaque binary payload + typed metadata: the blob column pattern
    for image/audio/video. Payload here is the utf-8 encoding of text (the
    container has no media libs); size + checksum are the typed metadata."""
    d = load(spark, "documents", sf_dir)
    bin_col = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(bin_col).alias("n_bytes"),
        F.md5(bin_col).alias("content_md5"),
    )


@query("multimodal_decode")  # binary image decode → rows-only (no SQL codec)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — REAL image decode over a MIXED-CONTAINER binary payload column:
    each document renders as a deterministic image (dimensions and pixels
    derived from doc_id and text bytes) in a container chosen by
    ``doc_id % 6`` — BMP, PNG (stdlib zlib), JPEG alternating the
    sequential and PROGRESSIVE processes (r4: pure-numpy T.81 codec incl.
    SOF2 spectral selection + successive approximation,
    ``sources/jpegcodec.py``), LZW-compressed predictor-2 TIFF (r4:
    ``sources/tiffcodec.py``), TGA alternating raw/RLE
    (``sources/tgacodec.py``), or ICO wrapping a DIB
    (``sources/icocodec.py``) — then decodes back through
    ``_decode_payload``'s format sniffing: content-derived
    width/height/channel means, not length heuristics. Both the render
    and the decode run as Arrow-batched ``mapInPandas``: payload bytes
    are created and consumed executor-side, never on the driver — the
    100 TB shape for media columns. Round-trip exactness (known pixels →
    known stats; JPEG within quantization tolerance, progressive
    bit-identical to baseline) is pinned in tests/test_multimodal.py;
    arithmetic JPEG / MP3 remain the explicit ``NotImplementedError``
    slot."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .session import ensure_package_shipped
    from .sources.icocodec import encode_ico
    from .sources.jpegcodec import encode_jpeg, encode_jpeg_progressive
    from .sources.multimodal import decode_features, encode_bmp_array, encode_png
    from .sources.tgacodec import encode_tga
    from .sources.tiffcodec import encode_tiff

    ensure_package_shipped(spark)
    d = load(spark, "documents", sf_dir).select("doc_id", "text")

    def _tiff(arr):
        return encode_tiff(arr, compression="lzw", predictor=True)

    def _ico(arr):
        return encode_ico([encode_bmp_array(arr)])

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                w, h = int(doc_id % 6) + 2, int(doc_id % 4) + 2
                idx = (np.arange(h * w * 3)) % len(data)
                arr = np.frombuffer(data, dtype=np.uint8)[idx].reshape(h, w, 3)
                # the JPEG slot alternates the sequential and progressive
                # processes, the TGA slot alternates raw/RLE — every decode
                # path runs inside the registered query
                jpg = (
                    encode_jpeg_progressive
                    if (int(doc_id) // 6) % 2
                    else encode_jpeg
                )

                def tga(a, _rle=bool((int(doc_id) // 6) % 2)):
                    return encode_tga(a, rle=_rle)

                enc = (encode_bmp_array, encode_png, jpg, _tiff, tga, _ico)[
                    int(doc_id) % 6
                ]
                payloads.append(bytearray(enc(arr)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = d.mapInPandas(_render, schema="doc_id bigint, payload binary")
    out = decode_features(blobs)
    return out.select(
        "doc_id", "n_bytes", "format", "width", "height", "channels",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("feat_mean", 6).alias("feat_mean"),
    )


@query("similarity_lsh_ann_adaptive", _lsh_adaptive_oracle_sql())
def similarity_lsh_ann_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 scale path, tuned probing — query-adaptive multi-probe LSH
    (margin-ranked perturbation sequence, 12 probes/query against 8 planes).
    Unlike Hamming-1 blanket probing, the probe budget is independent of the
    signature width: widen to 16+ planes for finer buckets at 100 TB without
    multiplying reads. Recall monotonicity and the probe-count contract are
    asserted in tests/test_similarity.py.

    Hash-checked (r8): same recipe as similarity_lsh_ann — proven signature
    arithmetic, 6-decimal-rounded margins rank the planes identically on
    both engines, the static perturbation pattern is rendered per-set into
    the oracle, and the ranking follows the brute-force recipe."""
    emb = load(spark, "embeddings", sf_dir)
    planes = _fixed_planes(n_planes=8, dim=64)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = lsh_topk(emb, queries, planes, k=10, probes=12)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rk"
    )


def _dd(a: str, b: str) -> str:
    """Sequential double dot for operands already DOUBLE[] (no casts)."""
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def _sql_lloyd_cells(k: int = 8, iters: int = 3) -> str:
    """Shared CTE fragment (r8): kmeans_fit's FULL Lloyd trajectory re-run
    in DuckDB SQL, ending at centroid table ``cn{iters}`` (cell, c) and
    corpus assignment ``corpus`` (neighbor_id, cell). Possible because the
    fit's one sum-order-dependent stage — per-cell means — is rounded to 6
    decimals on both engines (operators/ivf.py r8 contract), so every
    iteration's centroids are bit-identical cross-engine: seeding
    (md5-smallest ids, sequential-double normalization), raw-dot argmax
    assignment with lowest-cell ties, mean → round(6) →
    math.sqrt-normalize. Used by similarity_ivf_ann, dedup_semantic_ivf,
    and similarity_ivf_pq_ann."""
    parts = [f"""ne AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN {_sql_norm('embedding')} > 0
                  THEN list_transform(embedding,
                         x -> CAST(x AS DOUBLE) / {_sql_norm('embedding')})
                  ELSE list_transform(embedding, x -> CAST(x AS DOUBLE))
             END AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    cn0 AS MATERIALIZED (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
             v AS c
      FROM (SELECT vec_id, v FROM ne
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
    )"""]
    for i in range(1, iters + 1):
        mvn = "sqrt(list_sum(list_transform(mv.mv, y -> y * y)))"
        parts.append(f""",
    a{i} AS (
      SELECT vec_id, v, cell FROM (
        SELECT ne.vec_id, ne.v, cn.cell,
               row_number() OVER (PARTITION BY ne.vec_id
                 ORDER BY {_dd('ne.v', 'cn.c')} DESC, cn.cell) AS rk
        FROM ne CROSS JOIN cn{i - 1} cn
      ) WHERE rk = 1
    ),
    mm{i} AS (
      SELECT cell, idx, round(avg(x), 6) AS m
      FROM (SELECT cell, unnest(v) AS x,
                   unnest(range(1, len(v) + 1)) AS idx FROM a{i})
      GROUP BY cell, idx
    ),
    mv{i} AS (SELECT cell, list(m ORDER BY idx) AS mv FROM mm{i} GROUP BY cell),
    cn{i} AS MATERIALIZED (
      SELECT c0.cell,
             CASE WHEN mv.mv IS NULL THEN c0.c
                  WHEN {mvn} > 0
                  THEN list_transform(mv.mv, x -> x / {mvn})
                  ELSE mv.mv END AS c
      FROM cn{i - 1} c0 LEFT JOIN mv{i} mv USING (cell)
    )""")
    parts.append(f""",
    corpus AS MATERIALIZED (
      SELECT vec_id AS neighbor_id, cell FROM (
        SELECT e.vec_id, cn.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_sql_dot('e.embedding', 'cn.c')} DESC, cn.cell) AS rk
        FROM embeddings e CROSS JOIN cn{iters} cn
      ) WHERE rk = 1
    )""")
    return "".join(parts)


def _sql_ivf_probe_cand(iters: int = 3, nprobe: int = 3) -> str:
    """CTE fragment appended after :func:`_sql_lloyd_cells`: per-query
    nprobe nearest cells + same-cell candidate pairs."""
    return f""",
    qprobe AS (
      SELECT query_id, cell FROM (
        SELECT e.vec_id AS query_id, cn.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_sql_dot('e.embedding', 'cn.c')} DESC, cn.cell) AS pr
        FROM embeddings e CROSS JOIN cn{iters} cn
        WHERE e.vec_id < {_N_QUERIES}
      ) WHERE pr <= {nprobe}
    ),
    cand AS (
      SELECT DISTINCT q.query_id, c.neighbor_id
      FROM qprobe q
      JOIN corpus c ON c.cell = q.cell AND c.neighbor_id <> q.query_id
    )"""


def _ivf_ann_oracle_sql(k: int = 8, iters: int = 3, nprobe: int = 3) -> str:
    """similarity_ivf_ann's oracle (VERDICT r7 #4): Lloyd replay
    (:func:`_sql_lloyd_cells`), nprobe cell probing, shared brute-force
    ranking tail."""
    return f"""
    WITH {_sql_lloyd_cells(k, iters)}{_sql_ivf_probe_cand(iters, nprobe)},
    {_SQL_ANN_RANK_TAIL}"""


@query("similarity_ivf_ann", _ivf_ann_oracle_sql())
def similarity_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 scale path, learned partitioning — IVF ANN: spherical k-means
    coarse quantizer (8 cells, md5-seeded, deterministic), queries probe
    their 3 nearest cells. Where LSH's random hyperplanes waste probes on
    empty half-spaces, IVF cells track the data distribution; at scale the
    corpus is written partitioned by cell so a probe reads one partition.
    Exactness at nprobe=k and recall at nprobe<k asserted in
    tests/test_ivf.py.

    Hash-checked (r8): the oracle replays the entire Lloyd fit in SQL —
    possible because the fit's per-cell means round to 6 decimals
    (operators/ivf.py), pinning each iteration's centroids bit-identically
    on both engines; assignments are raw sequential-double argmax dots on
    those identical inputs, and the ranking follows the brute-force
    recipe (raw cosine, neighbor_id tie-break, 4-decimal display round)."""
    emb = load(spark, "embeddings", sf_dir)
    centroids = _ivf_centroids(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = ivf_topk(emb, queries, centroids, k=10, nprobe=3)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rk"
    )


def _semantic_ivf_oracle_sql(threshold: float = 0.25) -> str:
    """dedup_semantic_ivf's oracle (r8): Lloyd replay for the cells, then
    the same-cell pair join with the exact raw-cosine threshold. The
    threshold compares RAW sequential-double cosines, bit-identical on
    both engines (identical rounded centroids → identical assignments;
    dot/norm are sequential on identical inputs), so the discrete
    keep/drop decision can never diverge."""
    return f"""
    WITH {_sql_lloyd_cells(8, 3)},
    base AS (
      SELECT c.neighbor_id AS id, c.cell,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_sql_norm('e.embedding')} AS n
      FROM corpus c JOIN embeddings e ON e.vec_id = c.neighbor_id
    ),
    pr AS (
      SELECT a.cell, a.id AS id_a, b.id AS id_b,
             CASE WHEN a.n * b.n > 0
                  THEN {_dd('a.v', 'b.v')} / (a.n * b.n)
                  ELSE 0.0 END AS cos_raw
      FROM base a JOIN base b ON a.cell = b.cell AND a.id < b.id
    )
    SELECT CAST(cell AS INTEGER) AS cell, id_a, id_b,
           round(cos_raw, 4) AS cos
    FROM pr WHERE cos_raw >= {threshold!r}"""


@query("dedup_semantic_ivf", _semantic_ivf_oracle_sql())
def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path — SemDeDup-style semantic near-dup pairs: candidates
    only within a k-means cell (Σ|cell|² comparisons instead of N²), exact
    cosine filter after. Exact duplicates share a nearest centroid by
    construction so they are never missed; the subset property and recall
    vs the global pair set are asserted in tests/test_ivf.py.

    Hash-checked (r8): the oracle replays the Lloyd fit
    (:func:`_sql_lloyd_cells`) and mirrors the pair join; the >= threshold
    decision is on raw bit-identical cosines.

    ROUTING (r10, VERDICT r9 #7): this exact quadratic form is
    collapse-prone — a mode-collapsed corpus puts (0.25N)² pairs in one
    cell's join tasks (measured 1.54× at x32, SCALE_RUN.json `collapse`).
    For UNSCREENED corpora the production default is
    :func:`dedup_semantic_windowed` (candidates ≤ N·window, measured 0.89
    flat on both flood and collapse); use this form after cell-size
    screening or when exact Σ|cell|² pair semantics are required — see
    COVERAGE.md's N2 row and SCALE.md round-10."""
    emb = load(spark, "embeddings", sf_dir)
    centroids = _ivf_centroids(spark, sf_dir)
    return semantic_dedup_pairs(emb, centroids, threshold=0.25)


def _semantic_windowed_oracle_sql(threshold: float = 0.25, window: int = 8) -> str:
    """dedup_semantic_windowed's oracle: Lloyd replay for the cells, the
    dot-to-OWN-centroid sort key, a within-cell row_number rank, and the
    banded rank self-join (0 < rk_b − rk_a ≤ window) with the exact
    raw-cosine threshold. The rank is cross-engine deterministic because
    the key doubles are bit-identical (same sequential-double dot on
    identical rounded centroids — the r8 Lloyd-replay contract) and ties
    break on vec_id."""
    return f"""
    WITH {_sql_lloyd_cells(8, 3)},
    keyed AS (
      SELECT c.neighbor_id AS id, c.cell,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_sql_norm('e.embedding')} AS n,
             {_sql_dot('e.embedding', 'cn.c')} AS key
      FROM corpus c
      JOIN embeddings e ON e.vec_id = c.neighbor_id
      JOIN cn3 cn ON cn.cell = c.cell
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY cell ORDER BY key, id) AS rk
      FROM keyed
    ),
    pr AS (
      SELECT a.cell, a.id AS ia, b.id AS ib,
             CASE WHEN a.n * b.n > 0
                  THEN {_dd('a.v', 'b.v')} / (a.n * b.n)
                  ELSE 0.0 END AS cos_raw
      FROM ranked a JOIN ranked b
        ON a.cell = b.cell AND b.rk > a.rk AND b.rk <= a.rk + {window}
    )
    SELECT CAST(cell AS INTEGER) AS cell,
           least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
           round(cos_raw, 4) AS cos
    FROM pr WHERE cos_raw >= {threshold!r}"""


@query("dedup_semantic_windowed", _semantic_windowed_oracle_sql())
def dedup_semantic_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 scale path, mode-collapse-safe — sorted-neighborhood SemDeDup:
    each vector is compared only to its `window` rank-neighbors within
    its k-means cell (rank = dot-to-own-centroid order), so candidate
    work is N·window by construction, independent of how mass
    distributes over cells. The quadratic same-cell form
    (`dedup_semantic_ivf`) measured 1.54–1.76× under a mode-collapsed
    corpus (25% of vectors near one direction — templated/spam content;
    SCALE_RUN.json `collapse`) because the hot cell's (0.25·N)² pairs
    run in ONE cell-keyed task; this form measured flat on the same
    shape. Pair recall is partial (window-bounded) but near-identical
    runs are contiguous in rank order, so windowed pairs CHAIN a
    collapsed clique into one connected component and survivor selection
    matches the quadratic form — asserted in tests/test_ivf.py.

    Hash-checked: the oracle replays the Lloyd fit, the own-centroid
    sort key (bit-identical sequential-double dots on identical rounded
    centroids), the within-cell rank (key ties break on vec_id), the
    banded rank join, and the raw-cosine threshold."""
    emb = load(spark, "embeddings", sf_dir)
    centroids = _ivf_centroids(spark, sf_dir)
    return semantic_dedup_pairs_windowed(
        emb, centroids, threshold=0.25, window=8
    )


def _rp_oracle_sql() -> str:
    """Oracle for embedding_random_projection: the same fixed plane matrix
    rendered as DuckDB list literals (full-precision repr round-trips)."""
    planes = _fixed_planes(n_planes=8, dim=64)
    cols = ",\n           ".join(
        "round(list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(v) for v in plane)}]), 6) AS rp_{i}"
        for i, plane in enumerate(planes)
    )
    return f"SELECT vec_id,\n           {cols}\n    FROM embeddings"


@query("embedding_random_projection", _rp_oracle_sql())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — random-projection dimensionality reduction (64 → 8 dims) with a
    deterministic md5-seeded plane matrix: the Johnson–Lindenstrauss trick
    that makes downstream clustering/ANN cheaper at 100 TB (8x fewer bytes
    per vector through every shuffle). Pure Catalyst higher-order functions
    (zip_with + aggregate, double accumulation) — compiles to codegen, rides
    the scan, zero shuffles, and the projected table can be written once and
    reused by every ANN/cluster pass. Cross-checked value-exactly against
    DuckDB's list_dot_product over the identical literal matrix."""
    emb = load(spark, "embeddings", sf_dir)
    planes = _fixed_planes(n_planes=8, dim=64)
    return emb.select(
        "vec_id",
        *[
            F.round(
                dot("embedding", lit_double_array(plane)), 6
            ).alias(f"rp_{i}")
            for i, plane in enumerate(planes)
        ],
    )


@query(
    "embedding_quantize_int8",
    """
    SELECT vec_id,
           round(amax, 6) AS scale_amax,
           array_to_string(
             CASE WHEN amax > 0 THEN
               list_transform(embedding,
                              x -> CAST(floor((x * 127.0) / amax + 0.5) AS INT))
             ELSE list_transform(embedding, x -> 0) END, ',') AS q8
    FROM (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS amax
      FROM embeddings
    )
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — symmetric int8 scalar quantization of the embedding column
    (per-vector scale = max|x|/127): 4x memory/IO reduction for the ANN
    corpus, the standard first step before IVF/PQ at 100 TB. Pure array
    expressions riding the scan — zero shuffle. Rounding is floor(v + 0.5)
    rather than round(): floor and IEEE add/mul/div are all exactly
    specified, so every quantized code is bit-identical cross-engine (an
    engine's round() tie convention never decides a code).

    The code vector is emitted as a comma-joined STRING, not array<int>:
    the driver's canonicalizer pandas-sorts result frames and cannot hash
    list-typed cells (the r4 gate failure). The serialization is lossless
    (int codes, ',' never appears in an int) and keeps the comparison
    bit-exact; complex output types in oracle-checked queries are now
    rejected at audit time (tools/plan_audit.py) and in pytest."""
    emb = load(spark, "embeddings", sf_dir)
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    with_amax = emb.select("vec_id", "embedding", amax.alias("amax"))
    q8 = F.when(
        F.col("amax") > 0,
        F.transform(
            "embedding",
            lambda x: F.floor((x * F.lit(127.0)) / F.col("amax") + F.lit(0.5)).cast(
                "int"
            ),
        ),
    ).otherwise(F.transform("embedding", lambda x: F.lit(0)))
    return with_amax.select(
        "vec_id",
        F.round("amax", 6).alias("scale_amax"),
        F.concat_ws(",", q8.cast("array<string>")).alias("q8"),
    )


_PQ_CACHE: dict = {}
_IVF_CACHE: dict = {}


def _ivf_centroids(spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3):
    """Memoized deterministic k-means fit per (sf_dir, k, iters) — the
    md5-seeded Lloyd fit always reproduces the same centroids, so the memo
    only skips redundant index-build scans within a session (an IVF index
    is built once and probed many times; refitting per query would charge
    the build to every search)."""
    key = (sf_dir, k, iters)
    if key not in _IVF_CACHE:
        _IVF_CACHE[key] = kmeans_fit(load(spark, "embeddings", sf_dir), k=k, iters=iters)
    return _IVF_CACHE[key]


def _pq_codebooks(spark: SparkSession, sf_dir: str, m: int = 8, k: int = 64):
    """Memoized deterministic PQ fit per (sf_dir, m, k) — codes are
    md5-seeded and tie-broken, so refitting always reproduces the same
    codebooks; the memo just skips redundant Lloyd scans within a session
    (the same write-once trade as the bucketed-layout query)."""
    key = (sf_dir, m, k)
    if key not in _PQ_CACHE:
        _PQ_CACHE[key] = pq_fit(load(spark, "embeddings", sf_dir), m=m, k=k)
    return _PQ_CACHE[key]


def _sql_l2dd(a: str, b: str) -> str:
    """Sequential squared L2 for operands already DOUBLE[]."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def _sql_pq_codebooks(m: int = 8, k: int = 64, iters: int = 5, dim: int = 64) -> str:
    """Shared CTE fragment (r8): pq_fit's FULL per-subspace Lloyd replay in
    DuckDB SQL, ending at codebook table ``cb{iters}`` (s, code, c) and the
    final assignment ``enc`` (vec_id, s, code). Same enabler as
    :func:`_sql_lloyd_cells`: pq_fit rounds per-cell means to 6 decimals
    (operators/pq.py r8), so every iteration's codebooks are bit-identical
    cross-engine; slicing is exact, and the squared-L2 argmin compares
    sequential 8-element sums that numpy (<= 8 elements: no pairwise
    split) and DuckDB compute identically, ties to the lowest code.
    Subspaces stay RELATIONAL (an ``s`` column) — only iterations unroll.
    Matrix-iteration CTEs are MATERIALIZED (DuckDB inlines plain CTEs —
    exponential through an iteration chain)."""
    d_sub = dim // m
    parts = [f"""sv AS MATERIALIZED (
      SELECT vec_id, s,
             list_transform(list_slice(embedding, s * {d_sub} + 1,
                                       s * {d_sub} + {d_sub}),
                            x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, {m})) AS s)
    ),
    pqseeds AS (
      SELECT vec_id, row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
      FROM (SELECT vec_id FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
    ),
    cb0 AS MATERIALIZED (
      SELECT sv.s, pqseeds.code, sv.v AS c
      FROM pqseeds JOIN sv ON sv.vec_id = pqseeds.vec_id
    )"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    pa{i} AS (
      SELECT vec_id, s, v, code FROM (
        SELECT sv.vec_id, sv.s, sv.v, cb.code,
               row_number() OVER (PARTITION BY sv.vec_id, sv.s
                 ORDER BY {_sql_l2dd('sv.v', 'cb.c')}, cb.code) AS rk
        FROM sv JOIN cb{i - 1} cb ON cb.s = sv.s
      ) WHERE rk = 1
    ),
    pm{i} AS (
      SELECT s, code, list(m6 ORDER BY idx) AS mv FROM (
        SELECT s, code, idx, round(avg(x), 6) AS m6
        FROM (SELECT s, code, unnest(v) AS x,
                     unnest(range(1, len(v) + 1)) AS idx FROM pa{i})
        GROUP BY s, code, idx
      ) GROUP BY s, code
    ),
    cb{i} AS MATERIALIZED (
      SELECT c0.s, c0.code, coalesce(pm.mv, c0.c) AS c
      FROM cb{i - 1} c0
      LEFT JOIN pm{i} pm ON pm.s = c0.s AND pm.code = c0.code
    )""")
    parts.append(f""",
    enc AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT sv.vec_id, sv.s, cb.code,
               row_number() OVER (PARTITION BY sv.vec_id, sv.s
                 ORDER BY {_sql_l2dd('sv.v', 'cb.c')}, cb.code) AS rk
        FROM sv JOIN cb{iters} cb ON cb.s = sv.s
      ) WHERE rk = 1
    )""")
    return "".join(parts)


@query(
    "embedding_pq_codes",
    f"""
    WITH {_sql_pq_codebooks()}
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY s) AS pq_codes
    FROM enc GROUP BY vec_id
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — product-quantization codes (m=8 subspaces, k=64 codewords):
    dim×4 bytes → 8 bytes per vector (32x), the memory/IO side of ANN at 100 TB
    (operators/pq.py; determinism + reconstruction-quality pinned in
    tests/test_pq.py). Codes ride the scan as pure column expressions.

    Codes are emitted as a comma-joined STRING, not array<int>: the driver
    canonicalizes EVERY output — rows-only included — through a pandas
    sort that cannot hash list cells (the r7 gate crash on this exact
    query; same fix as embedding_quantize_int8's q8 column). Lossless:
    int codes, ',' never appears in an int.

    Hash-checked (r8, after being the r7 gate's one red entry): the
    oracle replays the whole per-subspace Lloyd fit
    (:func:`_sql_pq_codebooks`, enabled by pq_fit's 6-decimal mean
    rounding) and emits the same comma-joined codes."""
    emb = load(spark, "embeddings", sf_dir)
    books = _pq_codebooks(spark, sf_dir)
    return pq_encode(emb, books).select(
        "vec_id",
        F.concat_ws(",", F.col("pq_codes").cast("array<string>")).alias("pq_codes"),
    )


def _pq_adc_oracle_sql() -> str:
    """similarity_pq_adc's oracle (r8): PQ fit replay, reconstruction by
    codeword lookup (exact — no arithmetic), asymmetric cosine against the
    raw query, ranked on the ROUNDED score with neighbor_id ties (this
    query rounds before attaching rk, unlike the raw-score ANN rankers)."""
    rec_norm = "sqrt(list_sum(list_transform(r.pv, y -> y * y)))"
    q_dot = (
        "list_sum(list_transform(list_zip(q.qv, r.pv), "
        "p -> CAST(p[1] AS DOUBLE) * p[2]))"
    )
    return f"""
    WITH {_sql_pq_codebooks()},
    rec AS MATERIALIZED (
      SELECT e.vec_id, flatten(list(cb.c ORDER BY e.s)) AS pv
      FROM enc e JOIN cb5 cb ON cb.s = e.s AND cb.code = e.code
      GROUP BY e.vec_id
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id < {_N_QUERIES}),
    sc AS (
      SELECT q.query_id, r.vec_id AS neighbor_id,
             CASE WHEN {_sql_norm('q.qv')} * {rec_norm} > 0
                  THEN {q_dot} / ({_sql_norm('q.qv')} * {rec_norm})
                  ELSE 0.0 END AS s
      FROM q JOIN rec r ON r.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, score, rk FROM (
      SELECT query_id, neighbor_id, round(s, 4) AS score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(s, 4) DESC, neighbor_id) AS rk
      FROM sc
    ) WHERE rk <= 10"""


@query("similarity_pq_adc", _pq_adc_oracle_sql())
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — PQ asymmetric search: probes stay full-precision, the corpus is
    scored through its reconstruction from PQ codes (decode against
    broadcast-literal codebooks, cosine, per-query top-10). Recall vs the
    exact brute force is pinned in tests/test_pq.py; at scale this reads
    m-byte codes instead of dim×4-byte vectors.

    Hash-checked (r8): full fit replay in SQL (see embedding_pq_codes);
    reconstruction is a pure lookup, the cosine is sequential-double on
    bit-identical inputs, and ranking is on the rounded score."""
    emb = load(spark, "embeddings", sf_dir)
    books = _pq_codebooks(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    corpus = pq_decode(pq_encode(emb, books), books).select(
        F.col("vec_id").alias("neighbor_id"), "pq_vec"
    )
    scored = corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
    from pyspark.sql import Window as _W

    w = _W.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            cosine("q_vec", "pq_vec").alias("score"),
        )
        .select("query_id", "neighbor_id", F.round("score", 4).alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )


@query(
    "embedding_gram_matrix",
    """
    WITH ex AS (
      SELECT vec_id,
             unnest(embedding) AS x,
             unnest(range(1, len(embedding) + 1)) AS idx
      FROM embeddings
    )
    SELECT CAST(a.idx AS INTEGER) AS i, CAST(b.idx AS INTEGER) AS j,
           round(sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)), 4) AS g
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.idx <= b.idx
    GROUP BY a.idx, b.idx
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — upper-triangular Gram matrix of the embedding corpus via
    map-side partial sums (operators/pca.py::gram_matrix): one numpy
    ``X.T @ X`` per Arrow batch, shuffle carries O(partitions x d^2) tiny
    rows, never the vectors. The oracle recomputes it relationally
    (double unnest + self-join); float32 inputs promote to float64 so
    products are exact and only summation order rounds — round(4) absorbs
    the ~1e-12 accumulation spread. At 100 TB this is the covariance/PCA
    statistics pass: data-size-independent shuffle, 32 KB on the driver.
    """
    from .operators.pca import gram_matrix

    emb = load(spark, "embeddings", sf_dir)
    g = gram_matrix(emb, "embedding")
    return g.select("i", "j", F.round("g", 4).alias("g"))


def _pc1_oracle_sql(n_iter: int = 100) -> str:
    """embedding_pc1_projection's oracle (VERDICT r7 #4): the power-iterate
    direction recomputed in SQL. Identity used: n_iter normalization steps
    only rescale, so v_100 ∝ G^100 @ v0 — the oracle computes G^100 by
    repeated squaring (6 squarings + 2 products for 100 = 64+32+4), each
    product max-abs-normalized to stay in double range. Both engines start
    from the SAME matrix — the Gram entries are rounded to 6 decimals on
    both sides (the computation's one sum-order-dependent stage) — so the
    remaining float drift between numpy's iteration and SQL's squaring is
    ~1e-13 on a unit vector, invisible under the 4-decimal display round
    (midpoint collisions measure-zero; prototype-measured margin ~1e-7 at
    sf0.01). Sign pin: largest-|component| positive, ties lowest index."""
    assert n_iter == 100, "exponent chain below is hard-wired to 100"
    chain = []
    prev = "m1"
    for e in (2, 4, 8, 16, 32, 64):
        chain.append(f"""
    r{e} AS MATERIALIZED (
      SELECT a.i, b.j, sum(a.v * b.v) AS v
      FROM {prev} a JOIN {prev} b ON a.j = b.i GROUP BY a.i, b.j
    ),
    m{e} AS MATERIALIZED (
      SELECT i, j, v / (SELECT max(abs(v)) FROM r{e}) AS v FROM r{e})""")
        prev = f"m{e}"
    return f"""
    WITH ex AS (
      SELECT vec_id, unnest(embedding) AS x,
             unnest(range(1, len(embedding) + 1)) AS idx
      FROM embeddings
    ),
    g AS MATERIALIZED (
      SELECT a.idx AS i, b.idx AS j,
             round(sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)), 6) AS v
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id
      GROUP BY a.idx, b.idx
    ),
    m1 AS MATERIALIZED (
      SELECT i, j, v / (SELECT max(abs(v)) FROM g) AS v FROM g),
    {",".join(chain)},
    r96 AS MATERIALIZED (
      SELECT a.i, b.j, sum(a.v * b.v) AS v
      FROM m64 a JOIN m32 b ON a.j = b.i GROUP BY a.i, b.j
    ),
    m96 AS MATERIALIZED (
      SELECT i, j, v / (SELECT max(abs(v)) FROM r96) AS v FROM r96),
    r100 AS MATERIALIZED (
      SELECT a.i, b.j, sum(a.v * b.v) AS v
      FROM m96 a JOIN m4 b ON a.j = b.i GROUP BY a.i, b.j
    ),
    w AS (SELECT i, sum(v) AS w FROM r100 GROUP BY i),
    vn AS (
      SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w) AS val FROM w
    ),
    vs AS (
      SELECT i, CASE WHEN (SELECT val FROM vn ORDER BY abs(val) DESC, i
                           LIMIT 1) < 0
                     THEN -val ELSE val END AS val
      FROM vn
    ),
    vlist AS (SELECT list(val ORDER BY i) AS pc FROM vs)
    SELECT e.vec_id, e.label,
           round(list_sum(list_transform(list_zip(e.embedding, vl.pc),
                 p -> CAST(p[1] AS DOUBLE) * p[2])), 4) AS pc1
    FROM embeddings e CROSS JOIN vlist vl"""


@query("embedding_pc1_projection", _pc1_oracle_sql())
def embedding_pc1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — projection of every embedding onto the corpus top principal
    direction (SIF-style top-component analysis for curation): Gram via
    distributed partial sums, power iteration driver-side on the d x d
    matrix, eigenvector broadcast back as a literal for a zero-shuffle
    projection (operators/pca.py). Parity with numpy.linalg.eigh is
    pinned in tests/test_pca.py.

    Hash-checked (r8): the Gram is rounded to 6 decimals on both engines
    (its sums are the one order-dependent stage), after which the power
    direction is a continuous deterministic function of a shared-exact
    matrix — the oracle reproduces it as G^100 via repeated squaring."""
    from .operators.pca import project_scalar, top_component

    emb = load(spark, "embeddings", sf_dir)
    v = top_component(spark, emb, "embedding", round_to=6)
    return emb.select(
        "vec_id",
        "label",
        F.round(project_scalar(emb, v), 4).alias("pc1"),
    )


@query("multimodal_audio_decode")  # binary audio decode → rows-only (no SQL codec)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — REAL audio decode over a MIXED-CODEC binary payload column:
    each document renders as a deterministic square wave (frequency,
    duration, and amplitude derive from doc_id) encoded per ``doc_id % 7``
    as linear PCM-16, G.711 mu-law, G.711 A-law (r4: ITU-T companding
    tables), IMA ADPCM (r4: the 4-bit adaptive-delta codec, public
    IMA/DVI algorithm), FLAC (r4: lossless FIXED-prediction + Rice
    coding, ``sources/flaccodec.py``), big-endian AIFF
    (``sources/aiffcodec.py``), or Sun AU mu-law (``sources/aucodec.py``),
    then decoded back through the container-sniffing audio stage —
    content-derived sample-rate/duration/RMS/zero-crossing features
    across all seven codec/container forms. Render
    and decode both run as Arrow-batched ``mapInPandas`` executor-side;
    decode exactness on known waveforms, companding-law reference points,
    ADPCM state-tracking, and FLAC losslessness are pinned in
    tests/test_multimodal.py."""
    from collections.abc import Iterator

    import pandas as pd

    from .session import ensure_package_shipped
    from .sources.aiffcodec import encode_aiff
    from .sources.aucodec import encode_au
    from .sources.flaccodec import encode_flac
    from .sources.multimodal import (
        decode_audio_features,
        encode_wav,
        encode_wav_adpcm,
        encode_wav_g711,
    )

    ensure_package_shipped(spark)
    d = load(spark, "documents", sf_dir).select("doc_id")

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                period = int(doc_id % 37) + 4  # samples per half-wave
                amp = int(doc_id % 20000) + 4000
                n = 800 + int(doc_id % 200)
                wave = [
                    amp if (i // period) % 2 == 0 else -amp for i in range(n)
                ]
                codec = int(doc_id) % 7
                if codec == 0:
                    p = encode_wav(8000, 1, wave)
                elif codec == 3:
                    # one exact block so n_samples stays the render n
                    p = encode_wav_adpcm(8000, 1, wave, samples_per_block=n)
                elif codec == 4:
                    p = encode_flac(wave, 8000, 1, block_size=256)
                elif codec == 5:
                    p = encode_aiff(8000, 1, wave)
                elif codec == 6:
                    p = encode_au(8000, 1, wave, encoding=1)
                else:
                    p = encode_wav_g711(
                        8000, 1, wave, "ulaw" if codec == 1 else "alaw"
                    )
                payloads.append(bytearray(p))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = d.mapInPandas(_render, schema="doc_id bigint, payload binary")
    out = decode_audio_features(blobs)
    return out.select(
        "doc_id", "n_bytes", "format", "sample_rate", "channels", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("zero_cross_rate", 6).alias("zero_cross_rate"),
    )


@query("multimodal_frame_sample")  # binary video decode → rows-only (no SQL codec)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — video-column plumbing over a MIXED-CONTAINER corpus: each
    document becomes a deterministic multi-frame clip (count/size derived
    from doc_id) stored per ``doc_id % 3`` as a concatenated-P6 stream,
    an animated GIF89a with delta-coded frames (r4 LZW codec,
    ``sources/gifcodec.py``), or an uncompressed-DIB AVI (r4 RIFF parser,
    ``sources/avicodec.py``); the frame-sampling stage extracts every
    2nd frame. PPM streams and intra-only AVI never decode unsampled
    frames; delta-coded GIF runs its LZW pass per frame but samples the
    statistics work — each the decode-budget-first ordering that matters
    when frames are the 100 TB payload. Docs 3k/3k+1/3k+2 are exact
    cross-container triplets; stat parity across all three is pinned in
    tests/test_multimodal.py."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .session import ensure_package_shipped
    from .sources.avicodec import encode_avi
    from .sources.gifcodec import encode_gif
    from .sources.multimodal import encode_ppm

    ensure_package_shipped(spark)
    d = load(spark, "documents", sf_dir).select("doc_id")

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                # geometry keys off doc_id // 3 so docs 3k / 3k+1 / 3k+2 are
                # exact cross-container triplets (PPM / GIF / AVI) — the
                # parity property tests/test_multimodal.py pins
                g = int(doc_id) // 3
                n_frames = g % 5 + 2
                w, h = g % 4 + 2, g % 3 + 2
                container = int(doc_id) % 3
                if container == 0:
                    clip = b""
                    for f in range(n_frames):
                        clip += encode_ppm(
                            w, h,
                            lambda x, y, f=f: (
                                (f * 40) % 256, (x * 60) % 256, (y * 80) % 256
                            ),
                        )
                    payloads.append(bytearray(clip))
                else:
                    ff, yy, xx = np.mgrid[0:n_frames, 0:h, 0:w]
                    frames = np.stack(
                        [(ff * 40) % 256, (xx * 60) % 256, (yy * 80) % 256],
                        axis=3,
                    ).astype(np.uint8)
                    if container == 1:
                        payloads.append(
                            bytearray(encode_gif(frames, delta=True))
                        )
                    else:
                        payloads.append(
                            bytearray(encode_avi(frames, codec="dib"))
                        )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = d.mapInPandas(_render, schema="doc_id bigint, payload binary")
    from .sources.multimodal import sample_frames

    out = sample_frames(blobs, every_k=2)
    return out.select(
        "doc_id", "frame_idx", "n_frames", "format", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def _ivf_pq_oracle_sql() -> str:
    """similarity_ivf_pq_ann's oracle (r8): BOTH fits replayed in one WITH
    (the Lloyd cell chain and the PQ codebook chain share no CTE names),
    candidates from nprobe cell probing, asymmetric cosine against the PQ
    reconstruction, ranked on the RAW score (ivf_pq_topk attaches rk
    before the display round)."""
    rec_norm = "sqrt(list_sum(list_transform(r.pv, y -> y * y)))"
    q_dot = (
        "list_sum(list_transform(list_zip(q.embedding, r.pv), "
        "p -> CAST(p[1] AS DOUBLE) * p[2]))"
    )
    return f"""
    WITH {_sql_lloyd_cells(8, 3)}{_sql_ivf_probe_cand(3, 3)},
    {_sql_pq_codebooks()},
    rec AS MATERIALIZED (
      SELECT e.vec_id, flatten(list(cb.c ORDER BY e.s)) AS pv
      FROM enc e JOIN cb5 cb ON cb.s = e.s AND cb.code = e.code
      GROUP BY e.vec_id
    ),
    sc AS (
      SELECT ca.query_id, ca.neighbor_id,
             CASE WHEN {_sql_norm('q.embedding')} * {rec_norm} > 0
                  THEN {q_dot} / ({_sql_norm('q.embedding')} * {rec_norm})
                  ELSE 0.0 END AS s
      FROM cand ca
      JOIN embeddings q ON q.vec_id = ca.query_id
      JOIN rec r ON r.vec_id = ca.neighbor_id
    )
    SELECT query_id, neighbor_id, round(s, 4) AS score, rk FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id
               ORDER BY s DESC, neighbor_id) AS rk
      FROM sc
    ) WHERE rk <= 10"""


@query("similarity_ivf_pq_ann", _ivf_pq_oracle_sql())
def similarity_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — the composed IVF-PQ index (operators/ivf.py::ivf_pq_topk):
    k-means cells bound WHICH vectors a probe touches, PQ codes bound the
    BYTES each touched vector costs — together the Faiss-style production
    layout, expressed as two joins and a window. Recall vs exact brute
    force asserted in tests/test_ivf_pq.py.

    Hash-checked (r8): both learned stages replay in SQL — the Lloyd cell
    chain (see similarity_ivf_ann) and the PQ codebook chain (see
    embedding_pq_codes) — composed exactly like ivf_pq_topk."""
    from .operators.ivf import ivf_pq_topk

    emb = load(spark, "embeddings", sf_dir)
    centroids = _ivf_centroids(spark, sf_dir)
    books = _pq_codebooks(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = ivf_pq_topk(emb, queries, centroids, books, k=10, nprobe=3)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rk"
    )


def _mmr_oracle_sql(k: int = 5, pool: int = 20) -> str:
    """Unrolled greedy MMR as DuckDB SQL (VERDICT r4 #7): the recurrence has
    a fixed depth (k=5), so each selection step is one argmax CTE over the
    bounded pool — sel step t maximizes lam*rel - (1-lam)*max_sim_to_selected
    with ties resolved in pool order (rel DESC, nid ASC), exactly numpy
    argmax over the remaining-candidate ordering. (1e0 - 0.7e0) reproduces
    Python's ``1.0 - lam`` bit-for-bit (a 0.3 literal would not); embeddings
    are cast DOUBLE[] to match Spark's element-wise double accumulation."""
    steps = []
    prev_sel = "s1"
    for t in range(2, k + 1):
        steps.append(f"""
    , sel{t - 1} AS (SELECT nid FROM {prev_sel})
    , s{t} AS (
      SELECT p.nid, p.rel, 0.7e0 * p.rel - (1e0 - 0.7e0) * max(s.s) AS score
      FROM pool p JOIN sim s ON s.ia = p.nid
           AND s.ib IN (SELECT nid FROM sel{t - 1})
      WHERE p.nid NOT IN (SELECT nid FROM sel{t - 1})
      GROUP BY p.nid, p.rel
      ORDER BY score DESC, p.rel DESC, p.nid ASC LIMIT 1
    )""")
        prev_sel = f"(SELECT nid FROM sel{t - 1} UNION ALL SELECT nid FROM s{t})"
    unions = "\n    UNION ALL ".join(
        f"SELECT {t} AS sel_rank, nid AS vec_id, round(rel, 6) AS relevance, "
        f"round(score, 6) AS mmr_score FROM s{t}"
        for t in range(1, k + 1)
    )
    return f"""
    WITH pos AS (
      SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
      FROM embeddings WHERE label = 0
    ), cent AS (
      SELECT i, avg(CAST(x AS DOUBLE)) AS cx FROM pos GROUP BY i
    ), q AS (
      SELECT list(cx ORDER BY i) AS qv FROM cent
    ), pool AS (
      SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS v,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) AS rel
      FROM embeddings, q
      ORDER BY rel DESC, nid ASC LIMIT {pool}
    ), sim AS (
      SELECT a.nid AS ia, b.nid AS ib, list_cosine_similarity(a.v, b.v) AS s
      FROM pool a JOIN pool b ON a.nid <> b.nid
    ), s1 AS (
      SELECT nid, rel, rel AS score FROM pool ORDER BY rel DESC, nid ASC LIMIT 1
    ){"".join(steps)}
    {unions}
    """


@query("similarity_mmr_rerank", _mmr_oracle_sql())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — MMR diversity re-ranking over the ANN candidate pool: distributed
    cosine top-20 against the label-0 centroid query, then the inherently
    sequential greedy (lambda=0.7) on the driver over the bounded pool
    (operators/similarity.py::mmr_rerank documents the two-stage split).
    Oracle-checked since round 5: the greedy has fixed depth k=5, so the
    recurrence unrolls into five argmax CTEs (``_mmr_oracle_sql``) — every
    selection DECISION and both 6-decimal scores hash-compared; the
    independent-numpy pin in tests/test_similarity.py remains."""
    from .operators.similarity import label_centroid, mmr_rerank

    emb = load(spark, "embeddings", sf_dir)
    qvec = label_centroid(emb, 0)
    picks = mmr_rerank(emb, qvec, k=5, pool=20, lam=0.7)
    return spark.createDataFrame(
        [
            (r, int(i), round(rel, 6), round(score, 6))
            for (r, i, rel, score) in picks
        ],
        "sel_rank int, vec_id bigint, relevance double, mmr_score double",
    )


def _whitening_oracle_sql(ns_iters: int = 50, eps: float = 1e-5) -> str:
    """embedding_whitening's oracle (VERDICT r7 #4). Identity used:
    ||W y||^2 = y^T W^2 y = y^T (cov + eps I)^-1 y — the Mahalanobis quad
    form needs the INVERSE, not the eigendecomposition, and an inverse is
    SQL-computable by Newton–Schulz iteration (X <- X(2I - AX), quadratic
    convergence from X0 = A / (max_row_abs_sum)^2 for symmetric PD A).
    Cross-engine: the moment sums are rounded to 6 decimals on BOTH
    engines (operators/pca.py round_to) and cov is derived with the same
    op order, so A is bit-identical; eigh (driver) and Newton–Schulz
    (oracle) then both hit the true inverse to machine precision —
    prototype-measured max |w_norm| drift 2.8e-14 vs a 3e-8 midpoint
    margin under the 4-decimal round. CTEs are MATERIALIZED: DuckDB
    inlines plain CTEs, which blows up exponentially through an
    iteration chain."""
    its = []
    prev = "x0"
    for k in range(1, ns_iters + 1):
        its.append(f""",
    ax{k} AS MATERIALIZED (
      SELECT a.i, x.j, sum(a.v * x.v) AS v
      FROM amat a JOIN {prev} x ON a.j = x.i GROUP BY a.i, x.j),
    xax{k} AS MATERIALIZED (
      SELECT x.i, b.j, sum(x.v * b.v) AS v
      FROM {prev} x JOIN ax{k} b ON x.j = b.i GROUP BY x.i, b.j),
    x{k} AS MATERIALIZED (
      SELECT x.i, x.j, 2 * x.v - t.v AS v
      FROM {prev} x JOIN xax{k} t ON t.i = x.i AND t.j = x.j)""")
        prev = f"x{k}"
    return f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, CAST(x AS DOUBLE) AS x, idx FROM (
        SELECT vec_id, unnest(embedding) AS x,
               unnest(range(1, len(embedding) + 1)) AS idx
        FROM embeddings WHERE embedding IS NOT NULL)
    ),
    nn AS (SELECT count(DISTINCT vec_id) AS n FROM ex),
    sv AS MATERIALIZED (SELECT idx, round(sum(x), 6) AS s FROM ex GROUP BY idx),
    gm AS MATERIALIZED (
      SELECT a.idx AS i, b.idx AS j, round(sum(a.x * b.x), 6) AS v
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY a.idx, b.idx
    ),
    muv AS MATERIALIZED (SELECT idx, s / (SELECT n FROM nn) AS mu FROM sv),
    amat AS MATERIALIZED (
      SELECT g.i, g.j,
             (g.v - (SELECT n FROM nn) * (m1.mu * m2.mu))
               / ((SELECT n FROM nn) - 1)
               + CASE WHEN g.i = g.j THEN {eps!r} ELSE 0 END AS v
      FROM gm g JOIN muv m1 ON m1.idx = g.i JOIN muv m2 ON m2.idx = g.j
    ),
    r0 AS (SELECT max(rs) AS r
           FROM (SELECT sum(abs(v)) AS rs FROM amat GROUP BY i)),
    x0 AS MATERIALIZED (
      SELECT i, j, v / ((SELECT r FROM r0) * (SELECT r FROM r0)) AS v
      FROM amat){"".join(its)},
    yv AS MATERIALIZED (
      SELECT e.vec_id, e.idx, e.x - m.mu AS y
      FROM ex e JOIN muv m ON m.idx = e.idx
    ),
    tv AS MATERIALIZED (
      SELECT y.vec_id, a.i, sum(a.v * y.y) AS t
      FROM {prev} a JOIN yv y ON a.j = y.idx GROUP BY y.vec_id, a.i
    ),
    q AS (
      SELECT t.vec_id, sum(t.t * y.y) AS q
      FROM tv t JOIN yv y ON y.vec_id = t.vec_id AND y.idx = t.i
      GROUP BY t.vec_id
    )
    SELECT vec_id, round(sqrt(CASE WHEN q < 0 THEN 0 ELSE q END), 4) AS w_norm
    FROM q"""


@query("embedding_whitening", _whitening_oracle_sql())
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening of the embedding table: one distributed pass collects
    the d^2+d+1 moment sums (operators/pca.py::moment_sums — map-side
    partial Gram per Arrow batch), the d x d transform is eigendecomposed
    on the driver, and the whitened vectors come from a zero-shuffle
    broadcast matmul pass. The decorrelation standard before PQ/IVF
    training and SIF-style embedding cleanup. tests/test_pca.py pins
    cov(whitened) ~ I.

    Hash-checked (r8): moments rounded to 6 decimals on both engines pin
    cov bit-identically; the oracle then computes the Mahalanobis form
    y^T (cov+eps I)^-1 y — equal to ||W y||^2 — via Newton–Schulz
    inversion in SQL, agreeing with the driver's eigh to ~1e-14."""
    from .operators.pca import moment_sums, whiten, zca_whitening_matrix

    emb = load(spark, "embeddings", sf_dir)
    n, s, g = moment_sums(emb, round_to=6)
    mu, w = zca_whitening_matrix(n, s, g)
    out = whiten(emb, mu, w)
    return out.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    "whitened", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
            4,
        ).alias("w_norm"),
    )


@query(
    "similarity_knn_classifier",
    """
    WITH q AS (
      SELECT vec_id AS query_id, label AS true_label, embedding AS q_vec
      FROM embeddings WHERE vec_id < 100
    ), scored AS (
      SELECT q.query_id, q.true_label, c.label AS n_label,
             list_cosine_similarity(q.q_vec, c.embedding) AS s, c.vec_id
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ), top5 AS (
      SELECT query_id, true_label, n_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, vec_id) AS rk
        FROM scored
      ) WHERE rk <= 5
    ), votes AS (
      SELECT query_id, true_label, n_label,
             CAST(count(*) AS BIGINT) AS v
      FROM top5 GROUP BY query_id, true_label, n_label
    ), pred AS (
      SELECT query_id, true_label, n_label AS pred_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY v DESC, n_label) AS vr
        FROM votes
      ) WHERE vr = 1
    )
    SELECT true_label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS accuracy
    FROM pred GROUP BY true_label
    """,
)
def similarity_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classifier (k=5, cosine, leave-one-out over 100
    probes) with per-label accuracy — the standard embedding-quality probe
    (if labels aren't recoverable from neighbors, the embedding space is
    noise).

    Probes ride the scoring closure as a matrix, corpus streams once
    through ``operators/similarity.py::brute_force_topk_np`` (one BLAS
    matmul per Arrow batch); the vote is a per-query
    aggregate over k rows with deterministic tie-breaks (count desc, then
    smallest label — mirrored in the oracle). Label lookup joins the
    corpus-sized id→label table as a broadcast. At scale the probe side
    pages through the IVF/PQ variants; the voting stage is unchanged.
    """
    from pyspark.storagelevel import StorageLevel as _SL

    # four consumers (probes, corpus stream, neighbor labels, truth) —
    # persist the 3-column base once so the embeddings scan runs once
    emb = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding", "label")
        .persist(_SL.MEMORY_AND_DISK)
    )
    probes = emb.filter(F.col("vec_id") < 100)
    top5 = brute_force_topk_np(emb, probes, k=5)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = (
        top5.join(F.broadcast(labels), "neighbor_id")
        .join(F.broadcast(truth), "query_id")
        .groupBy("query_id", "true_label", "n_label")
        .agg(F.count("*").cast("bigint").alias("v"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("n_label").asc()
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("n_label").alias("pred_label"))
    )
    correct = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return pred.groupBy("true_label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        F.round(F.sum(correct).cast("double") / F.count("*"), 4).alias(
            "accuracy"
        ),
    )


@query("multimodal_resize")  # binary image transform → rows-only (no SQL codec)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — the RESIZE stage of the multimodal pipeline (decode →
    feature-extract → resize → frame-sample): every document renders as a
    deterministic gradient BMP whose dimensions derive from doc_id
    (non-divisible by the 16×16 target on purpose — the block-partition
    arithmetic is the part worth pinning), decodes back to a pixel array
    through the frozen BMP codec, and is thumbnailed by the deterministic
    area-mean resize (sources/imageops.py — int64 block sums, one float64
    division per cell; no interpolation library, so thumbnails are
    bit-stable across hosts). Render, decode, and resize all run inside
    one Arrow-batched ``mapInPandas`` riding the scan — payload bytes and
    pixel arrays live executor-side only, the 100 TB shape for media
    columns. Exact box-mean expectations (constant image → constant
    thumbnail; 2×2 block image → exact block means) are pinned in
    tests/test_multimodal.py."""
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from .session import ensure_package_shipped
    from .sources.imageops import resize_area_mean
    from .sources.multimodal import _decode_bmp_pixels, encode_bmp

    ensure_package_shipped(spark)
    # Spread the scan first: render+decode+resize is heavy per-doc Python
    # work, and a single-row-group table otherwise runs it all in one task
    # (the dedup_substring_runs x128 lesson; minhash_signatures precedent).
    from .operators.skew import spread_scan

    d = spread_scan(load(spark, "documents", sf_dir).select("doc_id"))

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {
            "doc_id": [], "src_w": [], "src_h": [],
            "thumb_mean_r": [], "thumb_mean_g": [], "thumb_mean_b": [],
            "thumb_md5": [],
        }
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                g = int(doc_id)
                w, h = 17 + g % 43, 11 + g % 29  # rarely divisible by 16
                payload = encode_bmp(
                    w, h,
                    lambda x, y, g=g: (
                        (g + x * 3) % 256, (g * 5 + y * 7) % 256,
                        (x * y + g) % 256,
                    ),
                )
                px = _decode_bmp_pixels(payload)[:, :, ::-1]  # BGR -> RGB
                th = resize_area_mean(px, 16, 16)
                q = np.floor(th + 0.5).astype(np.uint8)
                rows["doc_id"].append(g)
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["thumb_mean_r"].append(round(float(th[:, :, 0].mean()), 6))
                rows["thumb_mean_g"].append(round(float(th[:, :, 1].mean()), 6))
                rows["thumb_mean_b"].append(round(float(th[:, :, 2].mean()), 6))
                rows["thumb_md5"].append(hashlib.md5(q.tobytes()).hexdigest())
        yield pd.DataFrame(rows)

    return d.mapInPandas(
        _thumb,
        "doc_id long, src_w int, src_h int, thumb_mean_r double, "
        "thumb_mean_g double, thumb_mean_b double, thumb_md5 string",
    )


@query("multimodal_phash_dedup")  # binary image hash → rows-only (no SQL codec)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — image near-dup grouping via perceptual average-hash: every
    document renders as a deterministic 16×16 BMP whose pixels encode its
    (quantized) letter-frequency histogram — so documents with similar
    content produce similar images — each image hashes to a 64-bit aHash
    executor-side (sources/multimodal.py::perceptual_hash), and grouping
    on the hash recovers clusters of perceptually-near images: the image
    analogue of MinHash dedup, with the hash as the LSH bucket key.
    The corpus is MIXED-FORMAT — even doc_ids render as BMP, odd as PNG
    (r4: the stdlib-zlib PNG codec) — and the hash is container-invariant,
    so identical content dedups across formats, which is the property a
    real image-dedup pipeline needs. Render + hash are both Arrow-batched
    ``mapInPandas``; nothing binary touches the driver. Hash stability,
    near-dup Hamming locality, and BMP/PNG hash parity are pinned in
    tests/test_multimodal.py.
    """
    from collections.abc import Iterator

    import pandas as pd

    import numpy as np

    from .session import ensure_package_shipped
    from .sources.multimodal import encode_bmp_array, encode_png, perceptual_hash

    ensure_package_shipped(spark)
    d = load(spark, "documents", sf_dir).select("doc_id", "text")

    # channel index maps are render-constants: pixel (x, y) reads
    # hist[(y*16+x + off) % 26] for offsets (0, 7, 13)
    _i = np.arange(256)
    _CH = np.stack([(_i + off) % 26 for off in (0, 7, 13)], axis=1)  # 256×3

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.lower()
                n = max(len(t), 1)
                # letter frequency per mille, quantized to 32 levels — the
                # content signature the image carries. One bincount over
                # the utf-8 bytes replaces 26 str.count scans (ASCII
                # letters are single bytes, and utf-8 continuation bytes
                # are >= 0x80, so byte counts == code-point counts here)
                counts = np.bincount(
                    np.frombuffer(t.encode("utf-8"), dtype=np.uint8),
                    minlength=123,
                )[97:123].astype(np.int64)
                hist = (
                    np.minimum(counts * 1000 // n // 8, 31) * 8
                ).astype(np.uint8)
                arr = hist[_CH].reshape(16, 16, 3)  # one gather, no pix() loop
                enc = encode_bmp_array if int(doc_id) % 2 == 0 else encode_png
                payloads.append(bytearray(enc(arr)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = d.mapInPandas(_render, schema="doc_id bigint, payload binary")
    hashed = perceptual_hash(blobs)
    groups = hashed.groupBy("phash").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").alias("survivor_doc_id"),
    )
    return groups.orderBy(F.col("n_docs").desc(), F.col("phash")).limit(50)


# --- md5 oracle twins for the ANN/PQ family (r4, VERDICT r3 #5) --------------
# The full ANN rankings are rows-only by nature (iterative Lloyd fits are not
# SQL), but their DETERMINISTIC stages are: md5-seeded codebooks (iters=0),
# cell/bucket/code assignment, and ADC scoring are pure expressions both
# engines can evaluate bit-identically (sequential double accumulation on
# both sides; assignments argmin/argmax over scores rounded to 6 so sub-ulp
# noise can never flip a cell, ties to the lowest id).


def _sql_l2sq(a: str, b: str) -> str:
    """Sequential double squared-L2 (b's elements already double)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))"
    )


_SQL_SEEDS8 = """
    s0 AS (
      SELECT vec_id, embedding FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    )"""

_SQL_CENTROIDS8 = (
    _SQL_SEEDS8
    + f""",
    cn AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
             list_transform(embedding,
               x -> CAST(x AS DOUBLE) / {_sql_norm('embedding')}) AS c
      FROM s0
    )"""
)

_SQL_CELLS8 = (
    _SQL_CENTROIDS8
    + f""",
    scored AS (
      SELECT e.vec_id, e.embedding, cn.cell,
             round({_sql_dot('e.embedding', 'cn.c')}, 6) AS s
      FROM embeddings e CROSS JOIN cn
    ),
    assigned AS (
      SELECT vec_id, embedding, cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY s DESC, cell) AS rk
      FROM scored
    )"""
)


def _cell_expr_rounded(cents: list[list[float]], vec: str = "embedding"):
    """argmax-dot cell id with the dot rounded to 6 decimals (cross-engine
    assignment stability); ties to the lowest cell, as operators.ivf."""
    scored = F.array(
        *[
            F.named_struct(
                F.lit("s"),
                F.round(dot(vec, lit_double_array(c)), 6),
                F.lit("ni"),
                F.lit(-i),
            )
            for i, c in enumerate(cents)
        ]
    )
    return (-F.array_max(scored)["ni"]).cast("int")


@query(
    "ivf_cell_assignment_md5",
    f"""
    WITH {_SQL_CELLS8}
    SELECT CAST(cell AS INTEGER) AS cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM assigned WHERE rk = 1 GROUP BY cell
    """,
)
def ivf_cell_assignment_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — the deterministic stage of `dedup_semantic_ivf`/`similarity_ivf_ann`
    made oracle-checkable: md5-seeded centroids (kmeans_fit with ZERO Lloyd
    iterations — the seeding and assignment are exact; only the iterative
    refinement is rows-only) and the argmax-dot cell assignment as a pure
    expression. One corpus scan, k dot products per row, one cell-grain
    aggregate — the exact plan shape the full IVF index build uses."""
    emb = load(spark, "embeddings", sf_dir)
    cents = kmeans_fit(emb, k=8, iters=0)
    return (
        emb.select(_cell_expr_rounded(cents).alias("cell"), "vec_id")
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.min("vec_id").cast("bigint").alias("min_vec_id"),
        )
    )


@query(
    "lsh_bucket_assignment_md5",
    f"""
    WITH {_SQL_LSH_SIG}
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM sig GROUP BY bucket
    """,
)
def lsh_bucket_assignment_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — `similarity_lsh_ann`'s bucket stage made oracle-checkable: the
    md5-derived hyperplanes (`_fixed_planes`) and the sign-bit signature are
    fully deterministic, so both engines compute the identical bucket key
    per vector (the dot accumulates sequentially in double on both sides —
    the >= 0 comparison is exact, no rounding needed). Only the top-k
    ranking above this stage stays rows-only."""
    emb = load(spark, "embeddings", sf_dir)
    from .functions.vector import random_hyperplane_signs

    bucket = random_hyperplane_signs("embedding", _fixed_planes(8, 64))
    return (
        emb.select(bucket.alias("bucket"), "vec_id")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.min("vec_id").cast("bigint").alias("min_vec_id"),
        )
    )


_SQL_PQ_CODES = (
    _SQL_SEEDS8
    + """,
    cw AS (
      SELECT sub.s AS subspace,
             row_number() OVER (
               PARTITION BY sub.s
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
             list_transform(embedding[sub.s*16+1 : sub.s*16+16],
                            x -> CAST(x AS DOUBLE)) AS vec
      FROM s0 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) sub
    ),
    pq_scored AS (
      SELECT e.vec_id, e.embedding, cw.subspace, cw.code, cw.vec,
             round(__L2SQ__, 6) AS d2
      FROM embeddings e CROSS JOIN cw
    ),
    pq_assigned AS (
      SELECT vec_id, embedding, subspace, code, vec,
             row_number() OVER (PARTITION BY vec_id, subspace
                                ORDER BY d2, code) AS rk
      FROM pq_scored
    )""".replace(
        "__L2SQ__",
        _sql_l2sq("e.embedding[cw.subspace*16+1 : cw.subspace*16+16]", "cw.vec"),
    )
)


def _l2sq_expr(sub_col, lit_vec):
    """Sequential double squared-L2 between an array column and a double
    literal/array column — the Spark twin of ``_sql_l2sq``.

    The difference is zipped ONCE and squared via the aggregate lambda's
    bound variable (r10): writing ``(x-y)*(x-y)`` inside zip_with evaluates
    the subtraction twice per element (lambda bodies are not CSE'd). Same
    IEEE ops in the same order — subtract once, multiply, accumulate —
    so values are bit-identical."""
    return F.aggregate(
        F.zip_with(
            sub_col,
            lit_vec,
            lambda x, y: x.cast("double") - y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d * d,
    )


def _pq_code_expr(cbs: list[list[list[float]]], s: int, vec: str = "embedding"):
    """argmin-L2 codeword id for subspace ``s`` (distance rounded to 6 for
    cross-engine stability, ties to the lowest code — operators.pq keeps
    numpy argmin's first-minimum, same rule)."""
    from .functions.text import _bind

    # One transform over the codebook MATRIX literal instead of k separate
    # per-codeword expression trees (r10): k× fewer py4j round trips at plan
    # build (the dominant cost — see functions/vector.py::lit_double_array),
    # and the subvector slice is let-bound so it is sliced once per row, not
    # once per codeword. Distances, rounding, and the first-minimum tie rule
    # are unchanged (struct comparison orders by d, then code).
    mat = lit_double_matrix(cbs[s])
    scored = _bind(
        F.slice(F.col(vec), s * 16 + 1, 16),
        lambda sub: F.transform(
            mat,
            lambda cw, i: F.struct(
                F.round(_l2sq_expr(sub, cw), 6).alias("d"),
                i.alias("code"),
            ),
        ),
    )
    return F.array_min(scored)["code"]


@query(
    "pq_codes_md5",
    f"""
    WITH {_SQL_PQ_CODES}
    SELECT CAST(subspace AS INTEGER) AS subspace, CAST(code AS INTEGER) AS code,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM pq_assigned WHERE rk = 1 GROUP BY subspace, code
    """,
)
def pq_codes_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — `embedding_pq_codes`'s encode stage made oracle-checkable:
    md5-seeded per-subspace codebooks (pq_fit with ZERO Lloyd iterations)
    and the argmin-L2 code assignment as a pure expression (m=4 subspaces x
    k=8 codewords over the 64-dim embeddings). One corpus scan, m·k
    subvector distances per row, one (subspace, code)-grain aggregate —
    the exact plan shape the full PQ encode uses."""
    emb = load(spark, "embeddings", sf_dir)
    cbs = pq_fit(emb, m=4, k=8, iters=0)
    codes = emb.select(
        "vec_id", *[_pq_code_expr(cbs, s).alias(f"c{s}") for s in range(4)]
    )
    long = codes.select(
        "vec_id",
        F.expr("stack(4, 0, c0, 1, c1, 2, c2, 3, c3) AS (subspace, code)"),
    )
    return long.groupBy("subspace", "code").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.min("vec_id").cast("bigint").alias("min_vec_id"),
    )


@query(
    "pq_adc_md5",
    f"""
    WITH {_SQL_PQ_CODES},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    per_sub AS (
      SELECT a.vec_id, a.subspace,
             __QD2__ AS d
      FROM pq_assigned a CROSS JOIN q WHERE a.rk = 1
    ),
    adc AS (
      SELECT vec_id,
             round(max(CASE WHEN subspace = 0 THEN d END)
                   + max(CASE WHEN subspace = 1 THEN d END)
                   + max(CASE WHEN subspace = 2 THEN d END)
                   + max(CASE WHEN subspace = 3 THEN d END), 6) AS adc_dist
      FROM per_sub GROUP BY vec_id
    )
    SELECT vec_id, adc_dist, rk FROM (
      SELECT vec_id, adc_dist,
             row_number() OVER (ORDER BY adc_dist, vec_id) AS rk
      FROM adc
    ) WHERE rk <= 10
    """.replace(
        "__QD2__",
        _sql_l2sq("q.qv[a.subspace*16+1 : a.subspace*16+16]", "a.vec"),
    ),
)
def pq_adc_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — `similarity_pq_adc`'s asymmetric-distance scoring made
    oracle-checkable: codes from the md5-seeded codebooks (as
    `pq_codes_md5`), each vector reconstructed codeword-wise via
    element_at on the broadcast-literal codebook, ADC distance =
    sum over subspaces of L2^2(query subvector, assigned codeword) —
    summed in fixed subspace order on both engines, so the double result
    is bit-identical. Top-10 via orderBy+limit (distributed
    TakeOrderedAndProject, never a global row_number over the corpus);
    the rank column is attached to the 10 surviving rows only."""
    emb = load(spark, "embeddings", sf_dir)
    cbs = pq_fit(emb, m=4, k=8, iters=0)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cb_lits = [
        lit_double_matrix(cbs[s])
        for s in range(4)
    ]
    d = emb.crossJoin(F.broadcast(q))
    adc = None
    for s in range(4):
        rec = F.element_at(cb_lits[s], _pq_code_expr(cbs, s) + 1)
        qsub = F.slice(F.col("qv"), s * 16 + 1, 16)
        term = _l2sq_expr(qsub, rec)
        adc = term if adc is None else adc + term
    scored = d.select("vec_id", F.round(adc, 6).alias("adc_dist"))
    top = scored.orderBy("adc_dist", "vec_id").limit(10)
    return top.withColumn(
        "rk",
        F.row_number().over(Window.orderBy("adc_dist", "vec_id")),
    )


@query(
    "dedup_semantic_cells_md5",
    f"""
    WITH {_SQL_CELLS8}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(a.cell AS INTEGER) AS cell,
           round({_sql_dot('a.embedding', 'b.embedding')}
                 / ({_sql_norm('a.embedding')} * {_sql_norm('b.embedding')}),
                 4) AS score
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
      AND a.rk = 1 AND b.rk = 1
    WHERE round({_sql_dot('a.embedding', 'b.embedding')}
                / ({_sql_norm('a.embedding')} * {_sql_norm('b.embedding')}),
                4) >= 0.4
    """,
)
def dedup_semantic_cells_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — `dedup_semantic_ivf`'s candidate-pair stage made oracle-checkable:
    cells from the md5-seeded centroids (as `ivf_cell_assignment_md5`),
    candidate pairs restricted to same-cell (the Sigma|cell|^2 bound that makes
    semantic dedup scale — never all-pairs), exact cosine on the survivors.
    The cosine accumulates sequentially in double on both engines, so the
    rounded threshold comparison is exact.

    Plan notes (r4 hoist + r5 shave, both value-preserving so the oracle
    SQL is unchanged):
    - norms AND float->double element casts are per-ROW columns computed
      before the self-join — inside the Sigma|cell|^2 pair space only one
      cast-free 64-element fold runs (r4: 3 folds -> 1, 18.4s -> ~6s at
      sf0.1; r5: cast hoist shaves the fold constant further);
    - the streamed side is repartitioned to cluster parallelism before the
      join: the join amplifies N rows into Sigma|cell|^2 pair evaluations,
      so byte-based scan partitioning under-parallelizes it (a corpus in
      one input split ran every fold in ONE task — measured 4.8s -> 1.6s
      at sf0.1 on local[32]); the shuffle moves only N rows;
    - the score>=0.4 predicate lands in the join condition, so the second
      fold in the output projection runs ONLY for survivors (245 of
      252,560 pairs at sf0.1 = 0.1% overhead) — the r4 VERDICT's
      double-fold concern is disproven in EXPLAIN.md rather than fixed,
      because the condition placement is the plan you want: non-survivors
      never materialize as rows.

    ROUTING (r10): quadratic-in-cell-size like `dedup_semantic_ivf` — for
    unscreened corpora prefer `dedup_semantic_windowed` (see its docstring
    and COVERAGE.md's N2 row for the measured collapse numbers)."""
    from .functions.vector import dot_precast, to_double_array

    emb = load(spark, "embeddings", sf_dir)
    cents = kmeans_fit(emb, k=8, iters=0)
    assigned = emb.select(
        "vec_id",
        to_double_array("embedding").alias("ed"),
        _cell_expr_rounded(cents).alias("cell"),
        norm("embedding").alias("nrm"),
    )
    target = spark.sparkContext.defaultParallelism
    a_side = assigned
    if a_side.rdd.getNumPartitions() < target:
        a_side = a_side.repartition(target, "vec_id")
    a = a_side.alias("a")
    b = assigned.alias("b")
    nn = F.col("a.nrm") * F.col("b.nrm")
    d = dot_precast(F.col("a.ed"), F.col("b.ed"))
    score = F.round(
        F.when(nn > 0, d / nn).otherwise(F.lit(0.0)), 4
    )
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.cell").alias("cell"),
            score.alias("score"),
        )
        .filter(F.col("score") >= 0.4)
    )
