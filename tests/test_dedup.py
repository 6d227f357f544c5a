"""N1/N2 dedup family — ground-truth checks for the hash-based operators
that have no cross-engine oracle (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators import dedup
from seoul_big_data_spark.sources.tables import load


def test_exact_dedup_survivor_is_lowest_id(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    out = dedup.exact(d)
    # survivors are unique per text and are the min doc_id of their text group
    expected = d.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    assert out.count() == expected.count()
    assert out.join(expected, "doc_id", "left_anti").count() == 0


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    """LSH candidates must contain every pair with high exact Jaccard
    (the S-curve guarantees near-1 recall at 0.8 with 16 hashes / 4 bands)."""
    d = load(spark, "documents", sf_dir)
    truth = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.8)
    cand = dedup.minhash_lsh_candidates(d, k_shingle=3, n_hashes=16, bands=4)
    missed = truth.join(cand, ["id_a", "id_b"], "left_anti")
    n_truth = truth.count()
    n_missed = missed.count()
    if n_truth:
        assert n_missed / n_truth <= 0.1, f"LSH missed {n_missed}/{n_truth} pairs"


def test_minhash_identical_docs_always_candidates(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "an entirely different document about big data engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = dedup.minhash_lsh_candidates(df).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in cand}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_properties(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "completely unrelated text about spark query engines here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    # identical text -> identical fingerprint
    assert got[1] == got[2]

    def hamming(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    # near-dup is closer than unrelated text
    assert hamming(got[1], got[3]) < hamming(got[1], got[4])


def test_ngram_jaccard_symmetric_bounds(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.3)
    bad = pairs.filter(
        (F.col("jaccard") < 0.3) | (F.col("jaccard") > 1.0) | (F.col("id_a") >= F.col("id_b"))
    )
    assert bad.count() == 0


def test_connected_components_known_graph(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(verts, edges).collect()
    }
    # {1,2,3} -> 1; {5,6} -> 5; isolated {4},{7} -> themselves
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_chain_diameter(spark):
    """A long chain needs diameter iterations — convergence check works."""
    n = 6
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = dedup.connected_components(verts, edges).collect()
    assert all(r["component"] == 0 for r in got)


def test_lsh_guards_bucket_cap_and_stop_shingles(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "a completely different corpus document entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # default: the identical trio produces all 3 pairs
    full = dedup.minhash_lsh_candidates(df)
    assert full.count() == 3
    # bucket cap of 2 skips the size-3 degenerate bucket -> no pairs
    capped = dedup.minhash_lsh_candidates(df, max_bucket_size=2)
    assert capped.count() == 0
    # stop-shingle filter: shingles in >3 docs dropped; the trio's shingles
    # appear in exactly 3 docs so candidates survive
    filtered = dedup.minhash_lsh_candidates(df, max_shingle_df=3)
    assert filtered.count() == 3


def test_ngram_jaccard_stop_shingle_filter(spark):
    """max_shingle_df: (a) a loose cap is a no-op (identical pairs);
    (b) hot boilerplate shingles are dropped but truly-similar pairs
    survive with their similarity intact."""
    boiler = "subscribe to our newsletter for more"
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta {boiler}"),
        (2, f"alpha beta gamma delta epsilon eta {boiler}"),
        (3, f"totally different content one two three {boiler}"),
        (4, f"unrelated words four five six seven {boiler}"),
        (5, f"more filler text eight nine ten {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = dedup.ngram_jaccard_pairs(df, k_shingle=3, threshold=0.3)
    noop = dedup.ngram_jaccard_pairs(
        df, k_shingle=3, threshold=0.3, max_shingle_df=1000
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, noop.collect()))
    # cap=4: the boilerplate shingles (in all 5 docs) are dropped
    filtered = dedup.ngram_jaccard_pairs(
        df, k_shingle=3, threshold=0.3, max_shingle_df=4
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in filtered.collect()}
    assert (1, 2) in pairs  # genuinely similar pair survives the filter
    # boilerplate-only overlaps no longer qualify
    assert (3, 4) not in pairs and (3, 5) not in pairs and (4, 5) not in pairs


def test_exact_dedup_hash_key_collision_guard(spark):
    """The dedup window is keyed (xxhash64(text), text). Simulate the
    worst-case collision — EVERY distinct text landing on the same hash —
    by replacing the hash component with a constant: the text column in the
    partition key must still keep distinct texts in distinct groups, so the
    survivor set is identical to the real operator's."""
    from pyspark.sql import Window

    rows = [
        (10, "alpha"), (3, "alpha"), (7, "alpha"),
        (5, "beta"), (2, "beta"),
        (1, ""), (9, ""),          # empty-string group
        (4, "éclair 中文"), (6, "éclair 中文"),
        (8, "x" * 5000), (11, "x" * 5000), (12, "x" * 4999),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    real = {(r["doc_id"], r["text"]) for r in dedup.exact(df).collect()}
    w = Window.partitionBy(F.lit(0), F.col("text")).orderBy("doc_id")
    collided = {
        (r["doc_id"], r["text"])
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .collect()
    }
    oracle = {
        (r["doc_id"], r["text"])
        for r in df.groupBy("text").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert real == collided == oracle


def test_exact_dedup_property_random_corpora(spark):
    """Property: for duplicate-heavy random corpora (drawn from a tiny
    alphabet so collisions-in-content are guaranteed), exact() == the
    groupBy-min survivor oracle, row for row."""
    import random

    rng = random.Random(42)
    vocab = ["", "a", "b", "ab", "ba", "a b", "中", "long " * 100]
    for trial in range(5):
        rows = [
            (i, rng.choice(vocab)) for i in rng.sample(range(10_000), 60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["doc_id"], r["text"]) for r in dedup.exact(df).collect()}
        want = {
            (r["doc_id"], r["text"])
            for r in df.groupBy("text")
            .agg(F.min("doc_id").alias("doc_id"))
            .collect()
        }
        assert got == want, f"trial {trial}"


def test_incremental_jaccard_matches_full_pair_subset(spark, sf_dir):
    """incremental_jaccard_pairs(corpus, increment) must equal exactly the
    new x old subset of the full pair operator over corpus+increment (same
    cap, same threshold), and emit zero old-old or new-new pairs."""
    d = load(spark, "documents", sf_dir)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    incr = d.filter(F.col("doc_id") % 5 == 0)
    inc = dedup.incremental_jaccard_pairs(
        corpus, incr, k_shingle=3, threshold=0.3, max_shingle_df=25
    )
    got = {
        (r["id_new"], r["id_old"], round(r["jaccard"], 6)) for r in inc.collect()
    }
    full = dedup.ngram_jaccard_pairs(
        d, k_shingle=3, threshold=0.3, max_shingle_df=25
    )
    want = set()
    for r in full.collect():
        a_new, b_new = r["id_a"] % 5 == 0, r["id_b"] % 5 == 0
        if a_new and not b_new:
            want.add((r["id_a"], r["id_b"], round(r["jaccard"], 6)))
        elif b_new and not a_new:
            want.add((r["id_b"], r["id_a"], round(r["jaccard"], 6)))
    assert got == want
    assert all(n % 5 == 0 and o % 5 != 0 for n, o, _ in got)


def test_prefix_filter_jaccard_equals_exact(spark, sf_dir):
    """Prefix filtering is LOSSLESS: pairs from
    prefix_filter_jaccard_pairs must equal ngram_jaccard_pairs exactly
    (same threshold, same shingling) — the whole point of the All-Pairs
    candidate generator is identical output with far fewer candidates."""
    d = load(spark, "documents", sf_dir)
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.prefix_filter_jaccard_pairs(
            d, k_shingle=3, threshold=0.3
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3).collect()
    }
    assert got == want and len(want) > 0


def test_prefix_filter_jaccard_property_random(spark):
    """Adversarial small corpora (tiny vocab → heavy overlap; includes
    threshold-boundary pairs) — prefix-filter output must equal a pure
    Python brute force at several thresholds, including ones whose
    rational form exercises the integer boundary arithmetic."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = ["w%d" % i for i in range(12)]
    for t in (0.3, 0.5, 0.8):
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def sh3(text):
            toks = text.lower().split()
            if len(toks) <= 3:
                return {" ".join(toks)}
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        want = set()
        sets = {i: sh3(tx) for i, tx in rows}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            # same exact rational boundary the operator uses
            num, den = {0.3: (3, 10), 0.5: (1, 2), 0.8: (4, 5)}[t]
            if union and inter * den >= num * union:
                want.add((a, b))
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.prefix_filter_jaccard_pairs(
                df, k_shingle=3, threshold=t
            ).collect()
        }
        assert got == want, f"threshold {t}"


def test_prefix_filter_candidates_fewer_than_inverted_join(spark, sf_dir):
    """The efficiency claim, measured: candidate pairs generated from
    prefix shingles must be a strict subset of (and materially fewer than)
    the full inverted-index join's shared-shingle pairs."""
    from pyspark.sql import Window as W

    d = load(spark, "documents", sf_dir)
    from seoul_big_data_spark.functions.text import shingles

    sh = d.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles("text", 3))).alias("shingle"),
    )
    full_pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .count()
    )
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    ranked = (
        sh.join(sdf, "shingle")
        .withColumn("n", F.count("*").over(W.partitionBy("id")))
        .withColumn(
            "pos",
            F.row_number().over(W.partitionBy("id").orderBy("sdf", "shingle")),
        )
    )
    prefix = ranked.filter(
        F.col("pos") <= F.expr("n - (3 * n + 9) DIV 10 + 1")
    )
    cand_pairs = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .count()
    )
    assert cand_pairs < full_pairs
