"""Product quantization (PQ) for the embedding column — the memory side of
the ANN-at-scale story (IVF partitions the corpus, PQ compresses it).

A dim-d vector is split into ``m`` contiguous subvectors; each subspace gets
its own k-codeword codebook (plain L2 Lloyd, md5-deterministic seeding as in
``operators/ivf.py``), and a vector is stored as m small integer codes —
dim×4 bytes shrink to m bytes at k ≤ 256. Search decodes against the
broadcast-literal codebooks (reconstruction-based asymmetric scoring), so
the corpus is never re-read at full width.

Scale shape (100 TB): codebooks are tiny (m × k × dim/m = dim × k floats —
driver-side by construction); fitting scans the corpus once per Lloyd
iteration per subspace with a map-side-combined (cell → per-dim mean)
aggregate, and in production is run on an md5-deterministic sample
(q_dq.py convention) with one full-corpus encode afterwards. Encoding and
decoding are pure column expressions riding the scan — zero shuffle.

Everything is deterministic (md5 seeding, fixed iterations, ties to the
lowest code), so re-runs and backfills produce byte-identical codes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _sq_l2(vec: Column, c: list[float]) -> Column:
    """||vec - c||^2 as a single fold (double accumulation)."""
    return F.aggregate(
        F.zip_with(vec, _lit_vec(c), lambda x, y: (x.cast("double") - y) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_code(vec: Column, codebook: list[list[float]]) -> Column:
    """argmin_c ||vec - c||^2, ties to the lowest code id — array_min over
    (dist, code) structs; whole-stage codegen, no UDF."""
    scored = F.array(
        *[
            F.named_struct(F.lit("d"), _sq_l2(vec, c), F.lit("i"), F.lit(i))
            for i, c in enumerate(codebook)
        ]
    )
    return F.array_min(scored)["i"].cast("int")


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
                means = (
                    sliced.select(
                        _nearest_code(F.col(f"_v{s}"), codebooks[s]).alias("cell"),
                        f"_v{s}",
                    )
                    .groupBy("cell")
                    .agg(
                        *[
                            F.avg(F.element_at(f"_v{s}", i + 1)).alias(f"c{i}")
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
    """Add ``out_col``: array<int> of length m — the PQ codes. Pure column
    expressions against broadcast-literal codebooks; rides the scan."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    codes = F.array(
        *[
            _nearest_code(
                F.transform(
                    F.slice(vec_col, s * d_sub + 1, d_sub),
                    lambda x: x.cast("double"),
                ),
                codebooks[s],
            )
            for s in range(m)
        ]
    )
    return df.withColumn(out_col, codes)


def pq_decode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    codes_col: str = "pq_codes",
    out_col: str = "pq_vec",
) -> DataFrame:
    """Reconstruct the approximate vector from codes: concat of the selected
    codewords via element_at on literal array-of-array codebooks."""
    books = [
        F.array(*[_lit_vec(c) for c in cb]) for cb in codebooks
    ]  # books[s][code] -> codeword
    rec = F.concat(
        *[
            F.element_at(books[s], F.element_at(F.col(codes_col), s + 1) + 1)
            for s in range(len(codebooks))
        ]
    )
    return df.withColumn(out_col, rec)
