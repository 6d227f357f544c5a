"""Empirical weak-scaling harness: does the engine's cost grow linearly?

Builds scaled replicas of the sf0.1 test tables (xM rows via key-offset
replication that PRESERVES referential integrity — each replica's orders
join its own lineitem, users keep their own event series), then times a
representative headline subset at x1 / x8 / x32 and reports the growth
ratios. The point: plan-shape audits (`tools/plan_audit.py`) argue scale
safety statically; this measures it. A query whose time grows ~linearly
with data on a fixed 32-core box is weak-scaling clean — the same plan on
1000 executors at 100 TB keeps per-core work constant. A query whose
x32/x8 ratio blows past ~6-8x is hiding a super-linear term (pair
explosion, single-reducer sort, driver materialization) that no cluster
size outruns.

Replication is the standard scaling-surrogate for TPC-H-style data (the
dbgen scale factor itself scales fact rows linearly while keeping value
distributions fixed): group-key cardinality per replica is unchanged, so
aggregate output grows linearly, join fan-out per key is constant, and
skew ratios are preserved.

Usage: python tools/scale_run.py [--mults 1,8,32] [--queries a,b,...]
Writes SCALE_RUN.json at the repo root; scaled data lives under
.scale_data/ (gitignored, rebuilt on demand).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seoul_big_data_spark.queries import QUERIES  # noqa: E402
from seoul_big_data_spark.session import get_spark  # noqa: E402
from seoul_big_data_spark.sources.tables import TABLES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = "/root/testdata/sf0.1"
SCALE_DIR = os.path.join(ROOT, ".scale_data")

# (table, [key columns to offset]) — every FK pair shares its offset so each
# replica is a self-contained sub-database (joins never cross replicas).
_KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# Dimension tables copied verbatim (fixed-size at every TPC-H scale factor).
_STATIC = ("region", "nation")

# Salt-recipe version, embedded in the _complete and per-table markers. Bump
# on ANY change to the replication salts (key strides, document letter
# permutation, embedding sign flips, skew shape): a pre-existing build with a
# different recipe is stale and rebuilds instead of being silently reused —
# the r5 diff changed the documents salt (Caesar -> md5 permutation) and
# added sign flips, and _SUCCESS-based resume would have mixed recipes
# across tiers (ADVICE r5).
RECIPE_VERSION = "r8-mdperm-signflip-32files-1"
REPLICA_FILES = 32

# Files per replicated table. The original builder wrote each table as ONE
# parquet file (crossJoin against a broadcast replica list preserves the
# single-partition base read), so every tier's FIRST stage — scan + map-side
# work — ran on 1 task of 32 cores until the file crossed the 128 MB
# maxPartitionBytes boundary (x512), where split-count jumps made ratios
# artificially sub-linear (measured: text_term_frequency r512/128 = 1.17 on
# 1-file-vs-4-split dirs). 32 files at every tier keeps scan parallelism
# constant ≥ the core count (above 128 MB/file Spark's byte-range splitting
# raises it further), so tier ratios measure work growth, not accidental
# split-count growth. Round-robin repartition is deterministic
# (sortBeforeRepartition is on by default).


def _marker_ok(path: str) -> bool:
    try:
        with open(path) as fh:
            return fh.read().strip() == RECIPE_VERSION
    except OSError:
        return False


def _write_marker(path: str) -> None:
    with open(path, "w") as fh:
        fh.write(RECIPE_VERSION + "\n")

# One offset per key FAMILY (o_custkey must move in lockstep with c_custkey).
_FAMILY = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "event_id": "event_id", "user_id": "user_id",
    "doc_id": "doc_id", "vec_id": "vec_id",
}

# Headline subset: one per scale-critical family, including the three
# round-4 scale-safe rewrites (equidepth deciles, RFM, peak concurrency) —
# the queries whose OLD single-reducer forms this harness would convict.
DEFAULT_QUERIES = [
    "flagship_pricing_summary",
    "ingest_resume_load",
    "filter_eq",
    "join_catalog_dims",
    "join_left_outer_agg",
    "window_latest_per_group",
    "agg_cube",
    "agg_count_distinct",
    "events_sessionization",
    "events_asof_join",
    "text_term_frequency",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_brute_force_topk",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "agg_equidepth_deciles",
    "stats_rfm_segmentation",
    "events_peak_concurrency",
    "corpus_prep_pipeline",
]


def _letter_perm(rep: int) -> str:
    """Deterministic permutation of a–z per replica (replica 0 = identity);
    md5-driven Fisher–Yates. The previous CYCLIC-SHIFT salt had only 26
    distinct forms, so past mult=26 rotation classes repeat and replicas
    within a class are bit-identical duplicates of each other — at x128
    (~5 replicas/class) every document gained ~4 cross-replica exact
    near-dup partners and pair-generating queries measured 12x/step
    instead of ~4x: a harness artifact, not an operator bend. 26! forms
    never repeat at any realistic tier."""
    letters = list("abcdefghijklmnopqrstuvwxyz")
    if rep == 0:
        return "".join(letters)
    import hashlib

    stream = b""
    pos = 0

    def _next(n: int) -> int:
        nonlocal stream, pos
        while pos + 4 > len(stream):
            stream += hashlib.md5(
                f"textsalt:{rep}:{len(stream)}".encode()
            ).digest()
        v = int.from_bytes(stream[pos : pos + 4], "big")
        pos += 4
        return v % n

    for i in range(25, 0, -1):
        j = _next(i + 1)
        letters[i], letters[j] = letters[j], letters[i]
    return "".join(letters)


def _sign_array(rep: int, dim: int) -> list[float]:
    """Deterministic ±1 pattern per replica (md5-seeded; replica 0 is all
    +1 = the original data). diag(±1) is ORTHOGONAL: within-replica dot
    products, norms, and cosines are preserved BIT-FOR-BIT (each product
    term x_k·y_k flips sign twice; element order — hence accumulation
    order — is unchanged), while cross-replica cosines of duplicated
    vectors collapse toward 0. See the documents Caesar-shift note below:
    same reasoning, embedding edition."""
    import hashlib

    if rep == 0:
        return [1.0] * dim
    out: list[float] = []
    block = 0
    while len(out) < dim:
        digest = hashlib.md5(f"embsalt:{rep}:{block}".encode()).digest()
        out.extend(1.0 if byte & 1 else -1.0 for byte in digest)
        block += 1
    return out[:dim]


def _semantic_kscaled(mult: int):
    """`dedup_semantic_cells_md5`'s SCALE deployment shape, parameterized by
    the tier multiplier: cell COUNT tracks the corpus (k = 8·mult), holding
    expected cell size — and with it the Σ|cell|² pair work PER ROW —
    constant, which is how SemDeDup-style dedup actually runs at 100 TB.
    The registered fixed-k=8 twin exists for oracle certification; at fixed
    k its pair work is N²/k by construction, quadratic at ANY k — the bend
    is in the query's contract, not the engine (SCALE.md §semantic-dedup).
    Assignment uses the bulk numpy-matmul path past k=64 (literal dot
    expressions stop being a sane plan at k ~ hundreds); same cosine
    threshold as the twin."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.operators.ivf import (  # noqa: PLC0415
            kmeans_fit,
            semantic_dedup_pairs,
        )
        from seoul_big_data_spark.sources.tables import load  # noqa: PLC0415

        emb = load(spark, "embeddings", sf_dir)
        k = 8 * mult
        # >= matches kmeans_fit's bulk_assign_from boundary: the x8 tier
        # (k=64) measured 20 s on the literal-expression path vs 7 s at
        # x32 on the matmul path — a routing artifact, not a scale signal.
        return semantic_dedup_pairs(
            emb, kmeans_fit(emb, k=k, iters=0), threshold=0.4,
            bulk_assign=k >= 64,
        )

    return run


def _semantic_kscaled_hier(mult: int):
    """The kscaled deployment with the O(√k)-MACs coarse-then-fine
    assignment (`assign_cells_hier`) — the path a run enters once k
    passes ~10^4, where even the flat matmul's N·k·dim cost dominates.
    Same k ∝ N shape and threshold as the flat variant so the two
    timings isolate the assignment stage's asymptotics."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.operators.ivf import (  # noqa: PLC0415
            kmeans_fit,
            semantic_dedup_pairs,
        )
        from seoul_big_data_spark.sources.tables import load  # noqa: PLC0415

        emb = load(spark, "embeddings", sf_dir)
        k = 8 * mult
        cents = kmeans_fit(emb, k=k, iters=0)
        return semantic_dedup_pairs(
            emb, cents, threshold=0.4, hier_assign=True
        )

    return run


def _semantic_kscaled_fit(mult: int):
    """Stage decomposition (VERDICT r6 #4 / r7 #5), stage 1 of 3: the
    md5-seeded iters=0 fit alone — one normalized scan + a distributed
    top-k collect of k seed vectors. Timed so full − assign − fit isolates
    the pair stage arithmetically from the same SCALE_RUN.json rows."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.operators.ivf import kmeans_fit  # noqa: PLC0415
        from seoul_big_data_spark.sources.tables import load  # noqa: PLC0415

        kmeans_fit(load(spark, "embeddings", sf_dir), k=8 * mult, iters=0)
        return spark.range(1)

    return run


def _semantic_kscaled_assign(mult: int):
    """Stage decomposition, stages 1+2: fit + cell assignment + the per-cell
    size aggregate (forces full materialization of the assignment), WITHOUT
    the pair join — the kscaled full-query time minus this is the pair
    stage. Same bulk-path routing boundary as the full variant."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.operators.ivf import (  # noqa: PLC0415
            assign_cells,
            assign_cells_bulk,
            kmeans_fit,
        )
        from seoul_big_data_spark.sources.tables import load  # noqa: PLC0415

        emb = load(spark, "embeddings", sf_dir)
        k = 8 * mult
        cents = kmeans_fit(emb, k=k, iters=0)
        assigner = assign_cells_bulk if k >= 64 else assign_cells
        return assigner(emb, cents).groupBy("cell").count()

    return run


def _semantic_kscaled_hier_assign(mult: int):
    """Stage decomposition for the hierarchical variant: fit + the
    O(√k)-MACs coarse-then-fine assignment + per-cell sizes, no pair join."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.operators.ivf import (  # noqa: PLC0415
            assign_cells_hier,
            kmeans_fit,
        )
        from seoul_big_data_spark.sources.tables import load  # noqa: PLC0415

        emb = load(spark, "embeddings", sf_dir)
        cents = kmeans_fit(emb, k=8 * mult, iters=0)
        return assign_cells_hier(emb, cents).groupBy("cell").count()

    return run


# Harness-level scale variants: name → factory(mult) → callable(spark, dir).
# For operators whose registered query pins a size parameter for oracle
# determinism, the variant re-parameterizes it the way a real deployment
# scales (documented per entry); timings land in SCALE_RUN.json beside the
# registered queries under the variant name.
def _semantic_kscaled_windowed(mult: int):
    """The kscaled deployment (k = 8·mult) on the MODE-COLLAPSE-safe
    windowed pair form (`semantic_dedup_pairs_windowed`, bulk assignment
    past k=64): candidate work is N·window regardless of how mass
    distributes over cells. Exists so the collapse readings on the
    quadratic kscaled variants (1.54×/1.76× at x32) have their mitigation
    measured on the SAME deployment shape, not only on the registered
    fixed-k query."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.operators.ivf import (  # noqa: PLC0415
            kmeans_fit,
            semantic_dedup_pairs_windowed,
        )
        from seoul_big_data_spark.sources.tables import load  # noqa: PLC0415

        emb = load(spark, "embeddings", sf_dir)
        k = 8 * mult
        # assignment routing mirrors the quadratic variants: expression
        # path at small k, BLAS matmul to k ~ 10^3, coarse-then-fine
        # O(sqrt k) past that (at x512/k=4096 the flat matmul alone
        # measured ~100 s — the 17.96/step wall the hier path avoids).
        return semantic_dedup_pairs_windowed(
            emb,
            kmeans_fit(emb, k=k, iters=0),
            threshold=0.4,
            window=8,
            bulk_assign=64 <= k < 1024,
            hier_assign=k >= 1024,
        )

    return run


def _join_skew_unsalted_twin(mult: int):
    """join_skew_salted WITHOUT the salting — the same equi-join + agg on
    the plain key. Under the hot-events dir this is the AQE skew-join
    test bench: the tiers side (distinct user_id) is too big to
    auto-broadcast at x32, so the sort-merge join's hot partition is
    exactly what spark.sql.adaptive.skewJoin exists to split — this twin
    measures whether it actually does, next to the explicit-salt form
    (VERDICT r9 #6)."""

    def run(spark, sf_dir):
        from seoul_big_data_spark.sources.tables import load

        e = load(spark, "events", sf_dir)
        tiers = (
            e.select("user_id").distinct()
            .withColumn("tier", (F.col("user_id") % 5).cast("bigint"))
        )
        joined = e.select("user_id", "value").join(tiers, "user_id")
        return joined.groupBy("tier").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

    return run


VARIANTS = {
    "dedup_semantic_cells_kscaled": _semantic_kscaled,
    "dedup_semantic_cells_kscaled_windowed": _semantic_kscaled_windowed,
    "dedup_semantic_cells_kscaled_hier": _semantic_kscaled_hier,
    "dedup_semantic_cells_kscaled_fit": _semantic_kscaled_fit,
    "dedup_semantic_cells_kscaled_assign": _semantic_kscaled_assign,
    "dedup_semantic_cells_kscaled_hier_assign": _semantic_kscaled_hier_assign,
}

# Tables each variant actually reads — lets a high tier (x512) build only
# what the requested queries scan instead of the full 10-table replica set.
VARIANT_TABLES = {name: ("embeddings",) for name in VARIANTS}
VARIANTS["join_skew_unsalted_twin"] = _join_skew_unsalted_twin
VARIANT_TABLES["join_skew_unsalted_twin"] = ("events",)

# Same declaration for the REGISTERED queries measured at the x512 tier
# (r8: the tier initially existed only for the kscaled embedding curves;
# these single-table scan sets let the flagship dedup/text/events/ingest
# curves reach x512 without replicating the other nine tables 512x).
# A query whose scan set is not declared here still gets the full replica
# set — and a wrong declaration fails loudly (missing parquet path), never
# silently measures the wrong data.
QUERY_TABLES = {
    "dedup_minhash_lsh": ("documents",),
    "dedup_exact": ("documents",),
    "dedup_substring_runs": ("documents",),
    "text_term_frequency": ("documents",),
    "corpus_prep_pipeline": ("documents",),
    "multimodal_resize": ("documents",),
    "events_sessionization": ("events",),
    "window_latest_per_group": ("orders",),
    "similarity_brute_force_topk": ("embeddings",),
    "ingest_resume_load": ("lineitem",),
    "dedup_survivor_best_quality": ("documents",),
    "text_textrank_keywords": ("documents",),
    "dedup_cluster_size_histogram": ("documents",),
    "dedup_lsh_recall_eval": ("documents",),
    "pq_codes_md5": ("embeddings",),
    "pq_adc_md5": ("embeddings",),
    "lsh_bucket_assignment_md5": ("embeddings",),
    "ivf_cell_assignment_md5": ("embeddings",),
    "similarity_lsh_ann": ("embeddings",),
    "similarity_ivf_pq_ann": ("embeddings",),
    "embedding_quantize_int8": ("embeddings",),
    "embedding_random_projection": ("embeddings",),
    "dedup_semantic_ivf": ("embeddings",),
    "dedup_semantic_windowed": ("embeddings",),
    "events_hourly_rollup": ("events",),
    "events_bot_detection": ("events",),
    "events_peak_concurrency": ("events",),
    "dedup_simhash_md5": ("documents",),
    "text_entropy_compressibility": ("documents",),
    "events_interarrival_profile": ("events",),
    "events_attribution_first_touch": ("events",),
    "events_top_session_paths": ("events",),
    "events_session_busy_overlap": ("events",),
    "text_bpe_tokenize": ("documents",),
    "text_bpe_token_budget": ("documents",),
    "text_bpe_chunk": ("documents",),
}


def _offsets(spark) -> dict[str, int]:
    """Power-of-ten stride per key family, from the base data's max key."""
    strides: dict[str, int] = {}
    for table, keys in _KEYED.items():
        df = spark.read.parquet(os.path.join(BASE_SF, f"{table}.parquet"))
        for k in keys:
            fam = _FAMILY[k]
            if k not in df.columns:
                continue
            mx = df.agg(F.max(F.col(k).cast("long"))).first()[0] or 0
            stride = 10
            while stride <= mx:
                stride *= 10
            strides[fam] = max(strides.get(fam, 0), stride)
    return strides


def build(spark, mult: int, tables: tuple | None = None) -> str:
    """Materialize the xM replica set; returns its sf_dir (cached).

    ``tables`` (r8): build only that subset — the x512 tier exists for the
    kscaled embeddings curves, and replicating the other nine tables 512×
    would cost build time and disk for data nothing reads. A subset build
    never writes the tier ``_complete`` marker (per-table recipe markers
    still cache each table), so a later full build resumes correctly."""
    out = os.path.join(SCALE_DIR, f"x{mult}")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    if os.path.exists(marker):
        # complete build under an older recipe: stale wholesale
        shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    strides = _offsets(spark)
    reps = F.broadcast(
        spark.range(mult).select(F.col("id").cast("long").alias("_rep"))
    )
    subset = tables is not None
    for table in (tables if subset else TABLES):
        src = os.path.join(BASE_SF, f"{table}.parquet")
        dst = os.path.join(out, f"{table}.parquet")
        tmarker = os.path.join(out, f"{table}.recipe")
        # Per-table resume: a build interrupted never re-replicates the
        # finished tables — but only when the per-table marker carries the
        # CURRENT salt recipe (_SUCCESS alone is Spark's commit marker and
        # says nothing about which recipe produced the data).
        if os.path.exists(os.path.join(dst, "_SUCCESS")) and _marker_ok(tmarker):
            continue
        shutil.rmtree(dst, ignore_errors=True)
        df = spark.read.parquet(src)
        if table in _STATIC:
            df.write.mode("overwrite").parquet(dst)
            _write_marker(tmarker)
            continue
        # Spread the BASE rows across REPLICA_FILES partitions before the
        # expanding crossJoin: the base tables are single small parquet
        # files (1-3 splits), so without this the mult-fold expansion — and
        # the per-replica salt case-chains — run on 1-3 tasks (measured: the
        # x512 lineitem expansion crawled for minutes on one straggler).
        # Partitioning first also fixes the output file count with no
        # post-expansion shuffle of the full replica data.
        rep = df.repartition(REPLICA_FILES).crossJoin(reps)
        for k in _KEYED[table]:
            if k in df.columns:
                dtype = dict(df.dtypes)[k]
                rep = rep.withColumn(
                    k,
                    (F.col(k) + F.col("_rep") * strides[_FAMILY[k]]).cast(dtype),
                )
        if table == "embeddings":
            # Per-replica sign flip (orthogonal diag(±1); see _sign_array):
            # verbatim replication makes every vector a mult-way duplicate
            # clique, so the same-cell candidate-pair count of semantic
            # dedup — and the ≥threshold survivor count — grows QUADRATICALLY
            # in the multiplier: an adversarial input, not a scaled corpus
            # (a real 128×-larger embedding table has 128× more distinct
            # vectors at the same near-dup rate). Within-replica geometry is
            # preserved exactly; cross-replica cosines decorrelate.
            dim = len(df.select("embedding").first()[0])
            flipped = None
            for i in range(1, mult):
                signs = F.array(*[F.lit(s) for s in _sign_array(i, dim)])
                expr = F.zip_with(
                    "embedding", signs, lambda x, s: (x * s).cast("float")
                )
                flipped = (
                    F.when(F.col("_rep") == i, expr)
                    if flipped is None
                    else flipped.when(F.col("_rep") == i, expr)
                )
            if flipped is not None:
                rep = rep.withColumn(
                    "embedding", flipped.otherwise(F.col("embedding"))
                )
        if table == "documents":
            # Per-replica letter permutation (translate() is a character
            # bijection): WITHIN-replica near-dup structure is preserved
            # exactly — shingle sets transform identically on both sides of
            # every pair — while CROSS-replica shingle overlap drops to
            # ~zero. Without this, verbatim replication turns every document
            # into an M-way duplicate clique and the corpus's true
            # duplicate-pair count is quadratic in M — an adversarial input,
            # not a scaled one (see SCALE.md and _letter_perm on why a
            # cyclic shift is NOT enough past mult=26).
            lower = "abcdefghijklmnopqrstuvwxyz"
            shifted = None
            for i in range(1, mult):
                perm = _letter_perm(i)
                expr = F.translate(
                    F.col("text"), lower + lower.upper(), perm + perm.upper()
                )
                shifted = (
                    F.when(F.col("_rep") == i, expr)
                    if shifted is None
                    else shifted.when(F.col("_rep") == i, expr)
                )
            if shifted is not None:
                rep = rep.withColumn(
                    "text", shifted.otherwise(F.col("text"))
                )
        rep.drop("_rep").write.mode("overwrite").parquet(dst)
        _write_marker(tmarker)
    if not subset:
        _write_marker(marker)
    return out


def build_skew(spark, mult: int = 32, hot_reps: int = 8, hot_user: int = 42) -> str:
    """x{mult} variant with a deliberately hot events key: replicas
    0..hot_reps-1 keep ONE shared user_id, so one user owns
    hot_reps/mult of all events (25% at the defaults — the bot/celebrity
    shape). Non-events tables are symlinked from the uniform build."""
    base = build(spark, mult)
    out = os.path.join(SCALE_DIR, f"x{mult}skew")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "events":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    df = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    reps = F.broadcast(
        spark.range(mult).select(F.col("id").cast("long").alias("_rep"))
    )
    strides = _offsets(spark)
    rep = df.repartition(REPLICA_FILES).crossJoin(reps)
    rep = rep.withColumn(
        "event_id", F.col("event_id") + F.col("_rep") * strides["event_id"]
    )
    rep = rep.withColumn(
        "user_id",
        F.when(F.col("_rep") < hot_reps, F.lit(hot_user)).otherwise(
            F.col("user_id") + F.col("_rep") * strides["user_id"]
        ),
    )
    rep.drop("_rep").write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    _write_marker(marker)
    return out


def merge_query_row(merged: dict, name: str, row: dict) -> None:
    """Merge one run's measured points into the persisted per-query rows
    (pure on dicts; pinned by tests/test_scale_harness.py). Two contracts
    from ADVICE r8:

    - Provenance is PER POINT: a partial re-measure must not relabel the
      row's stale, unre-measured points as produced by the current recipe.
      ``recipes`` maps each x{m} key measured THIS run to RECIPE_VERSION;
      the legacy whole-row ``recipe`` tag is dropped on first touch (it
      over-claimed).
    - Ratios are derived state: recompute EVERY consecutive-pair ratio
      derivable from the merged row's points (a single-tier re-measure
      otherwise keeps stale ratios computed from the overwritten point),
      and drop any ratio whose operands are gone.
    """
    existing = merged.setdefault(name, {})
    existing.pop("recipe", None)
    recipes = existing.setdefault("recipes", {})
    for k in row:
        if re.fullmatch(r"x\d+", k):
            recipes[k] = RECIPE_VERSION
    existing.update(row)
    pts = sorted(
        int(k[1:]) for k in existing if re.fullmatch(r"x\d+", k)
    )
    for k in [k for k in existing if re.fullmatch(r"r\d+_\d+", k)]:
        del existing[k]
    for lo, hi in zip(pts, pts[1:]):
        denom = existing[f"x{lo}"]
        existing[f"r{hi}_{lo}"] = (
            round(existing[f"x{hi}"] / denom, 2) if denom else None
        )


def build_skew_orders(
    spark, mult: int = 32, hot_reps: int = 8, hot_cust: int = 7
) -> str:
    """x{mult} variant with a deliberately hot JOIN foreign key: replicas
    0..hot_reps-1 of ORDERS point o_custkey at ONE customer, so one
    customer owns hot_reps/mult of all orders (25% at the defaults — the
    whale-account shape). o_orderkey keeps its per-replica offset (PK
    uniqueness; the lineitem→orders join stays uniform, so the skew lands
    exactly on the orders→customer equi-join and any o_custkey-partitioned
    window). Non-orders tables are symlinked from the uniform build
    (VERDICT r9 #6 — the join family had no skew measurements)."""
    base = build(spark, mult)
    out = os.path.join(SCALE_DIR, f"x{mult}skeworders")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "orders":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    df = spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
    reps = F.broadcast(
        spark.range(mult).select(F.col("id").cast("long").alias("_rep"))
    )
    strides = _offsets(spark)
    rep = df.repartition(REPLICA_FILES).crossJoin(reps)
    rep = rep.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("_rep") * strides["orderkey"]
    )
    rep = rep.withColumn(
        "o_custkey",
        F.when(F.col("_rep") < hot_reps, F.lit(hot_cust)).otherwise(
            F.col("o_custkey") + F.col("_rep") * strides["custkey"]
        ),
    )
    rep.drop("_rep").write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    _write_marker(marker)
    return out


def build_skew_docs(spark, mult: int = 32, hot_reps: int = 8) -> str:
    """x{mult} variant with a deliberately hot TEXT shape: replicas
    0..hot_reps-1 skip the per-replica letter permutation, so one template
    family (verbatim copies of the base corpus) owns hot_reps/mult of all
    documents — 25% at the defaults, the boilerplate/bot-template shape.
    This is the text/dedup analogue of build_skew's hot user: hot tokens
    for term-frequency groupBys (the shared replicas collapse into ONE
    token universe at 8x count while permuted replicas stay disjoint), hot
    LSH bands / duplicate-hash joins for the dedup family. doc_ids still
    stride per replica (no key collisions); non-documents tables symlink
    from the uniform build. NOTE: this is the adversarial duplicate-clique
    input build() deliberately salts away for weak-scaling ratios — here
    it is the point (skew measurement), so the variant lives in its own
    dir and never feeds the x-ratio record."""
    base = build(spark, mult)
    out = os.path.join(SCALE_DIR, f"x{mult}skewdocs")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "documents":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    df = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    reps = F.broadcast(
        spark.range(mult).select(F.col("id").cast("long").alias("_rep"))
    )
    strides = _offsets(spark)
    rep = df.repartition(REPLICA_FILES).crossJoin(reps)
    rep = rep.withColumn(
        "doc_id", F.col("doc_id") + F.col("_rep") * strides["doc_id"]
    )
    lower = "abcdefghijklmnopqrstuvwxyz"
    shifted = None
    for i in range(hot_reps, mult):
        perm = _letter_perm(i)
        expr = F.translate(
            F.col("text"), lower + lower.upper(), perm + perm.upper()
        )
        shifted = (
            F.when(F.col("_rep") == i, expr)
            if shifted is None
            else shifted.when(F.col("_rep") == i, expr)
        )
    if shifted is not None:
        rep = rep.withColumn("text", shifted.otherwise(F.col("text")))
    rep.drop("_rep").write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    _write_marker(marker)
    return out


def build_skew_emb(spark, mult: int = 32, hot_reps: int = 8) -> str:
    """x{mult} variant with a deliberately hot EMBEDDING shape: replicas
    0..hot_reps-1 skip the per-replica sign flip, so hot_reps verbatim
    copies of every base vector coexist — 25% of the corpus at the
    defaults is duplicate-flooded, the mode-collapse / re-crawled-content
    shape real embedding dedup sees. Identical vectors share a nearest
    centroid by construction, so every IVF cell's hot share is an
    hot_reps-way duplicate clique and SemDeDup's Σ|cell|² candidate work
    amplifies QUADRATICALLY in the flood factor — exactly the adversarial
    input build() deliberately salts away for weak-scaling ratios (see
    the embeddings branch there); here it is the point. Probe-bounded ANN
    search over the same dirs is the control: its per-query top-k work is
    flood-invariant. vec_ids still stride per replica; other tables
    symlink from the uniform build."""
    base = build(spark, mult)
    out = os.path.join(SCALE_DIR, f"x{mult}skewemb")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "embeddings":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    df = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    reps = F.broadcast(
        spark.range(mult).select(F.col("id").cast("long").alias("_rep"))
    )
    strides = _offsets(spark)
    rep = df.repartition(REPLICA_FILES).crossJoin(reps)
    rep = rep.withColumn(
        "vec_id", F.col("vec_id") + F.col("_rep") * strides["vec_id"]
    )
    dim = len(df.select("embedding").first()[0])
    flipped = None
    for i in range(hot_reps, mult):
        signs = F.array(*[F.lit(s) for s in _sign_array(i, dim)])
        expr = F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float"))
        flipped = (
            F.when(F.col("_rep") == i, expr)
            if flipped is None
            else flipped.when(F.col("_rep") == i, expr)
        )
    if flipped is not None:
        rep = rep.withColumn("embedding", flipped.otherwise(F.col("embedding")))
    rep.drop("_rep").write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    _write_marker(marker)
    return out


def build_collapse_emb(spark, mult: int = 32, hot_reps: int = 8) -> str:
    """x{mult} variant with a MODE-COLLAPSED embedding shape: replicas
    0..hot_reps-1 replace every vector with ONE fixed direction plus a
    tiny deterministic per-(vec_id, element) jitter — 25% of the corpus
    at the defaults is near-identical-but-distinct, the shape templated/
    spam content embeds to. Unlike the duplicate flood (build_skew_emb,
    measured flat 0.91–0.98: copies land in their base vectors' own
    cells, so cell mass stays spread), collapse concentrates a 0.25·N
    mass in ONE k-means cell regardless of k: SemDeDup's within-cell
    candidate join does (0.25·N)² work in a single cell-keyed task — the
    quadratic straggler this variant exists to measure. Jitter keeps the
    vectors distinct (an exact-duplicate collapse cannot absorb them)
    with pairwise cosines ≈ 1. vec_ids stride per replica; other tables
    symlink from the uniform build."""
    base = build(spark, mult)
    out = os.path.join(SCALE_DIR, f"x{mult}collapse")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "embeddings":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    df = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    reps = F.broadcast(
        spark.range(mult).select(F.col("id").cast("long").alias("_rep"))
    )
    strides = _offsets(spark)
    rep = df.repartition(REPLICA_FILES).crossJoin(reps)
    rep = rep.withColumn(
        "vec_id", F.col("vec_id") + F.col("_rep") * strides["vec_id"]
    )
    dim = len(df.select("embedding").first()[0])
    # the collapse direction: the base corpus's vec_id-0 vector (any fixed
    # direction works; using real data keeps the norm scale realistic)
    base_vec = (
        df.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    base_lit = F.array(*[F.lit(float(v)) for v in base_vec])
    jittered = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.element_at(base_lit, i + 1)
            + (F.xxhash64(F.col("vec_id"), i) % 1000).cast("double")
            / F.lit(1.0e6)
        ).cast("float"),
    )
    flipped = None
    for i in range(hot_reps, mult):
        signs = F.array(*[F.lit(s) for s in _sign_array(i, dim)])
        expr = F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float"))
        flipped = (
            F.when(F.col("_rep") == i, expr)
            if flipped is None
            else flipped.when(F.col("_rep") == i, expr)
        )
    collapsed = jittered if flipped is None else flipped.otherwise(jittered)
    rep = rep.withColumn("embedding", collapsed)
    rep.drop("_rep").write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    _write_marker(marker)
    return out


def build_realtext(spark) -> str:
    """A real-text documents tier (VERDICT r8 #7): every scale number so
    far rides seed-42 synthetic tables + salted replication; this tier
    replaces `documents` with REAL human-written English harvested locally
    (no network in the sandbox) — docstrings of the Python stdlib and the
    installed scientific stack (numpy/pandas/pyspark/...), which carry the
    true Zipf token distribution, genuine near-dup structure (parameter/
    Returns boilerplate, templated numpy docstring sections), and natural
    length variance the synthetic generator lacks.

    Deterministic: sorted file walk, AST docstring extraction, fixed
    chunking (whitespace-split ~<=600 chars), sequential doc_ids. Other
    tables symlink from the uniform x32 build. The dir records its own
    corpus stats in _meta.json for normalizing deltas vs the synthetic
    tier."""
    import ast as pyast
    import glob as pyglob

    out = os.path.join(SCALE_DIR, "realtext")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    base = build(spark, 32)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "documents":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    lib = os.path.dirname(os.path.dirname(pyast.__file__)) + "/python3.11"
    lib = lib if os.path.isdir(lib) else os.path.dirname(pyast.__file__)
    docs: list[tuple[int, str, str, str, int]] = []
    doc_id = 0
    for path in sorted(pyglob.glob(os.path.join(lib, "**", "*.py"), recursive=True)):
        rel = os.path.relpath(path, lib)
        top = rel.split(os.sep)[0]
        source = (
            rel.split(os.sep)[1] if top == "site-packages" else f"stdlib:{top}"
        ).removesuffix(".py")
        try:
            tree = pyast.parse(
                open(path, encoding="utf-8", errors="ignore").read()
            )
        except SyntaxError:
            continue
        for node in pyast.walk(tree):
            if isinstance(
                node,
                (pyast.Module, pyast.ClassDef, pyast.FunctionDef, pyast.AsyncFunctionDef),
            ):
                ds = pyast.get_docstring(node)
                if not ds or len(ds) < 80:
                    continue
                text = " ".join(ds.split())  # collapse whitespace/newlines
                words, buf, blen = text.split(" "), [], 0
                for w in words:
                    if blen + len(w) + 1 > 600 and buf:
                        chunk = " ".join(buf)
                        docs.append((doc_id, chunk, "en", source, len(chunk)))
                        doc_id += 1
                        buf, blen = [], 0
                    buf.append(w)
                    blen += len(w) + 1
                if buf:
                    chunk = " ".join(buf)
                    docs.append((doc_id, chunk, "en", source, len(chunk)))
                    doc_id += 1
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.repartition(REPLICA_FILES).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    n_chars = sum(d[4] for d in docs)
    with open(os.path.join(out, "_meta.json"), "w") as fh:
        json.dump(
            {
                "n_docs": len(docs),
                "n_chars": n_chars,
                "harvest": "python-stdlib+site-packages docstrings",
                "chunk_chars": 600,
            },
            fh,
        )
    _write_marker(marker)
    return out


def build_realemb(spark) -> str:
    """A real-geometry embeddings tier (VERDICT r9 #5): every ANN/SemDeDup
    scale number so far rides i.i.d. synthetic vectors; this tier derives
    embeddings FROM the realtext corpus with in-repo operators — hashed
    token-frequency features random-projected to 64 dims (the SimHash-style
    ±1 plane trick as float weights: weight(token, dim) =
    xxhash64(token, dim) mapped into [-1, 1], embedding = Σ tf(token) ·
    weight) — so near-dup docstrings (numpy parameter boilerplate,
    templated Returns sections) produce genuinely high-cosine neighborhoods
    and the corpus carries the anisotropic, cluster-heavy geometry real
    embedding models emit, instead of i.i.d. Gaussian isotropy.

    Deterministic (xxhash64 on content), pure Catalyst expressions, one
    aggregate over the exploded-token table. vec_id = doc_id; other tables
    symlink from the uniform x32 build. _meta.json records corpus stats for
    normalizing deltas vs the synthetic tier (the realtext precedent)."""
    out = os.path.join(SCALE_DIR, "realemb")
    marker = os.path.join(out, "_complete")
    if _marker_ok(marker):
        return out
    realtext = build_realtext(spark)
    base = build(spark, 32)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        if table != "embeddings":
            os.symlink(
                os.path.join(base, f"{table}.parquet"),
                os.path.join(out, f"{table}.parquet"),
            )
    d = spark.read.parquet(os.path.join(realtext, "documents.parquet"))
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != F.lit(""))
        ).alias("w"),
    ).groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dims = [
        F.sum(
            F.col("tf").cast("double")
            * ((F.xxhash64(F.col("w"), F.lit(i)) % 10007) / 10007.0 * 2.0 - 1.0)
        ).alias(f"_e{i}")
        for i in range(64)
    ]
    emb = (
        toks.groupBy("doc_id")
        .agg(*dims)
        .select(
            F.col("doc_id").alias("vec_id"),
            F.array(*[F.col(f"_e{i}").cast("float") for i in range(64)]).alias(
                "embedding"
            ),
            (F.col("doc_id") % 10).cast("int").alias("label"),
        )
    )
    emb.repartition(REPLICA_FILES).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    n_vecs = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
    with open(os.path.join(out, "_meta.json"), "w") as fh:
        json.dump(
            {
                "n_vecs": n_vecs,
                "dim": 64,
                "recipe": "realtext hashed-tf random projection (xxhash64 planes)",
                "source_tier": "realtext",
            },
            fh,
        )
    _write_marker(marker)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,8,32")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument(
        "--skew",
        action="store_true",
        help="also time each query on the hot-key events variant "
        "(one user owns 25%% of x32 events) and record the skew ratio",
    )
    ap.add_argument(
        "--skeworders",
        action="store_true",
        help="time each query on the hot-FK orders variant (one customer "
        "owns 25%% of x32 orders) and record the skeworders ratio",
    )
    ap.add_argument(
        "--skewdocs",
        action="store_true",
        help="time each query on the hot-template documents variant "
        "(one verbatim template family owns 25%% of x32 documents) and "
        "record the skewdocs ratio",
    )
    ap.add_argument(
        "--skewemb",
        action="store_true",
        help="time each query on the duplicate-flooded embeddings variant "
        "(25%% of x32 vectors are verbatim copies of the base corpus) and "
        "record the skewemb ratio",
    )
    ap.add_argument(
        "--modecollapse",
        action="store_true",
        help="time each query on the mode-collapsed embeddings variant "
        "(25%% of x32 vectors near-identical in ONE direction) and record "
        "the collapse ratio",
    )
    ap.add_argument(
        "--realemb",
        action="store_true",
        help="time each query on the real-geometry embeddings tier "
        "(hashed-tf random projection of the realtext corpus) next to "
        "synthetic x32 and record the ratio (normalize by _meta.json "
        "corpus stats when comparing)",
    )
    ap.add_argument(
        "--realtext",
        action="store_true",
        help="time each query on the real-text documents tier (local "
        "docstring harvest) next to synthetic x32 and record the ratio "
        "(normalize by the _meta.json corpus stats when comparing)",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    names = [q for q in args.queries.split(",") if q]

    if (args.skew or args.skewdocs or args.skewemb or args.modecollapse
            or args.realtext or args.skeworders or args.realemb):
        spark = get_spark("scale_run_skew")
        uniform = build(spark, 32)
        if args.realemb:
            skewed, tag, ratio_key = (
                build_realemb(spark),
                "realemb",
                "realemb_ratio",
            )
        elif args.realtext:
            skewed, tag, ratio_key = (
                build_realtext(spark),
                "realtext",
                "realtext_ratio",
            )
        elif args.modecollapse:
            skewed, tag, ratio_key = (
                build_collapse_emb(spark, 32),
                "x32collapse",
                "collapse_ratio",
            )
        elif args.skeworders:
            skewed, tag, ratio_key = (
                build_skew_orders(spark, 32),
                "x32skeworders",
                "skeworders_ratio",
            )
        elif args.skewemb:
            skewed, tag, ratio_key = (
                build_skew_emb(spark, 32),
                "x32skewemb",
                "skewemb_ratio",
            )
        elif args.skewdocs:
            skewed, tag, ratio_key = (
                build_skew_docs(spark, 32),
                "x32skewdocs",
                "skewdocs_ratio",
            )
        else:
            skewed, tag, ratio_key = build_skew(spark, 32), "x32skew", "skew_ratio"
        skew_out = {}
        for name in names:
            row = {}
            for tag_i, d in (("x32", uniform), (tag, skewed)):
                # Same VARIANTS routing as the main loop — a variant name
                # passed with --skew must resolve, not KeyError (ADVICE r5).
                q = VARIANTS[name](32) if name in VARIANTS else QUERIES[name]
                q(spark, d).count()
                samples = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    q(spark, d).count()
                    samples.append(time.perf_counter() - t0)
                row[tag_i] = round(min(samples), 3)
            row[ratio_key] = (
                round(row[tag] / row["x32"], 2) if row["x32"] else None
            )
            skew_out[name] = row
            print(f"[skew:{name}] " + json.dumps(row))
        out_path = os.path.join(ROOT, "SCALE_RUN.json")
        doc = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                doc = json.load(fh)
        # merge per query (a query measured under both --skew and
        # --skewdocs keeps both readings)
        section = (
            "realemb" if args.realemb else "realtext" if args.realtext else "skew"
        )
        sect = doc.setdefault(section, {})
        for name, row in skew_out.items():
            sect.setdefault(name, {}).update(row)
        if args.realtext or args.realemb:
            meta_path = os.path.join(skewed, "_meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as fh:
                    sect["_corpus"] = json.load(fh)
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
        spark.stop()
        print("SCALE_RUN.json written (skew)")
        return

    spark = get_spark("scale_run")
    # Build only the tables the requested queries scan when every requested
    # name declares its scan set (the kscaled x512 case); a registered query
    # in the list means the full replica set.
    need: tuple | None = None
    scan_sets = {**QUERY_TABLES, **VARIANT_TABLES}
    if all(n in scan_sets for n in names):
        need = tuple(sorted({t for n in names for t in scan_sets[n]}))
    dirs: dict[int, str] = {}
    for m in mults:
        t0 = time.perf_counter()
        # x1 goes through build() too (replica 0 is identity, so the data
        # is unchanged): BASE_SF is a single small parquet file per table
        # (1-3 splits), so measuring x1 on it serializes first stages onto
        # 1-3 cores while x8+ dirs have REPLICA_FILES files — r8_1 ratios
        # would mix layouts, the exact artifact the 32-file recipe fixed
        # (ADVICE r8).
        dirs[m] = build(spark, m, tables=need)
        print(f"[build x{m}] {time.perf_counter() - t0:.1f}s -> {dirs[m]}")

    out_path = os.path.join(ROOT, "SCALE_RUN.json")

    def _persist(name: str, row: dict) -> None:
        """Deep-merge one query's points into SCALE_RUN.json immediately —
        an hours-long multi-query run killed mid-flight keeps every
        completed measurement (never clobbers other queries' or other
        mults' points)."""
        merged: dict = {}
        doc: dict = {}
        if os.path.exists(out_path):
            try:
                with open(out_path) as fh:
                    doc = json.load(fh)
                merged = doc.get("queries", {})
            except (OSError, json.JSONDecodeError):
                # Never silently discard a corrupted-but-recoverable record
                # (it may hold sections — e.g. 'skew' — this run won't
                # regenerate): park it beside the new file (ADVICE r5).
                try:
                    os.replace(out_path, out_path + ".bad")
                except OSError:
                    pass
                merged, doc = {}, {}
        merge_query_row(merged, name, row)
        doc.update(
            {
                "base_sf_dir": BASE_SF,
                "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "method": "key-offset replication; warm + min-of-2 per point",
                "queries": merged,
            }
        )
        doc["mults"] = sorted(set(doc.get("mults", [])) | set(mults))
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, out_path)

    for name in names:
        row: dict[str, float] = {}
        for m in mults:
            q = VARIANTS[name](m) if name in VARIANTS else QUERIES[name]
            q(spark, dirs[m]).count()  # warm: codegen + file listing
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                q(spark, dirs[m]).count()
                samples.append(time.perf_counter() - t0)
            row[f"x{m}"] = round(min(samples), 3)
        # ratios are computed inside _persist from the MERGED row (all
        # derivable consecutive pairs, not just this run's --mults)
        _persist(name, row)
        print(f"[{name}] " + json.dumps(row))

    spark.stop()
    print("SCALE_RUN.json written")


if __name__ == "__main__":
    main()
