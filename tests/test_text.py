"""N4 text analysis — language-ID accuracy, fingerprint determinism,
quality/tokenization semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.functions import text as tx
from seoul_big_data_spark.sources.tables import load


def test_detect_language_on_clear_samples(spark):
    rows = [
        (1, "the cat is in the house and it was for the dog", "en"),
        (2, "der Hund ist nicht mit der Katze auf den Tisch", "de"),
        (3, "los gatos y las casas una por con para del como", "es"),
        (4, "les chats sont dans les maisons pour une qui pas", "fr"),
        (5, "这是 一个 中文 文档 关于 大数据", "zh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = df.select("lang", tx.detect_language("text").alias("pred")).collect()
    for r in got:
        assert r["pred"] == r["lang"], f"expected {r['lang']}, got {r['pred']}"


def test_fingerprint_deterministic_and_normalizing(spark):
    rows = [
        (1, "Hello  World"),
        (2, "hello world"),  # case/whitespace-normalized equal
        (3, "goodbye world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    # stable across runs
    again = {r["doc_id"]: r["fp"] for r in df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert got == again


def test_tokenize_handles_irregular_whitespace(spark):
    df = spark.createDataFrame([(1, "  a\t b\n  c  ")], "id long, text string")
    row = df.select(
        tx.tokens("text").alias("t"), tx.token_count("text").alias("n")
    ).first()
    assert row["t"] == ["a", "b", "c"]
    assert row["n"] == 3


def test_bpe_ish_token_count_splits_punct_digits(spark):
    df = spark.createDataFrame([(1, "hello, world! v2.0")], "id long, text string")
    n = df.select(tx.bpe_ish_token_count("text").alias("n")).first()["n"]
    # hello , world ! v 2 . 0  -> 8 pieces
    assert n == 8


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], "id long, text string")
    sh = df.select(tx.shingles("text", 3).alias("s")).first()["s"]
    assert sh == ["one two"]


def test_quality_score_range(spark, sf_dir):
    d = load(spark, "documents", sf_dir)
    stats = d.select(tx.quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_chunking_covers_every_token_with_exact_overlap(spark, sf_dir):
    """Every token position of every non-empty document is covered by some
    chunk; consecutive chunks overlap by exactly 128-96=32 positions (less
    only at the tail); and packing assigns every chunk to exactly one
    sequence with no sequence exceeding 512 tokens before the chunk that
    overflows it."""
    from seoul_big_data_spark.q_text import text_chunk_fixed_tokens, text_pack_sequences

    chunks = text_chunk_fixed_tokens(spark, sf_dir).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_start"], r["n_tok"]))
    for doc_id, cs in by_doc.items():
        cs.sort()
        # stride exactly 96, first chunk at 1
        starts = [s for s, _ in cs]
        assert starts[0] == 1
        assert all(b - a == 96 for a, b in zip(starts, starts[1:]))
        # contiguous coverage: chunk i spans [start, start+n_tok-1]
        covered_end = 0
        for s, n in cs:
            assert s <= covered_end + 1  # no gap
            covered_end = max(covered_end, s + n - 1)
        # exact slice semantics: every chunk is 128 tokens unless the doc
        # ends first (n_tok = min(128, total - start + 1))
        total = covered_end
        assert all(n == min(128, total - s + 1) for s, n in cs)

    packed = text_pack_sequences(spark, sf_dir).collect()
    assert len(packed) == len(chunks)
    seq_totals = {}
    rows = sorted(packed, key=lambda r: (r["doc_id"], r["chunk_start"]))
    for r in rows:
        seq_totals.setdefault(r["seq_id"], 0)
        seq_totals[r["seq_id"]] += r["n_tok"]
    # every sequence except possibly the last reaches the 512 budget
    # (a chunk may straddle the boundary, so totals can exceed 512 by at
    # most one chunk's worth)
    last = max(seq_totals)
    for sid, tot in seq_totals.items():
        assert tot <= 512 + 128
        if sid != last:
            assert tot >= 512 - 127


def test_substring_runs_are_maximal_and_cover_span_detector(spark, sf_dir):
    """dedup_substring_runs (any-alignment, stride-1): every run is >= the
    8-token window, runs within a doc are maximal (non-adjacent matched
    position ranges — merging left anything unmergeable), and every
    cross-doc duplicated NON-overlapping span dedup_span_exact finds is
    covered by some run (stride-8 detection is a strict subset of
    stride-1)."""
    from seoul_big_data_spark.queries import QUERIES

    runs = QUERIES["dedup_substring_runs"](spark, sf_dir).collect()
    assert runs, "test corpus contains cross-doc duplicated substrings"
    by_doc: dict = {}
    for r in runs:
        assert r["len_tokens"] >= 8
        by_doc.setdefault(r["doc_id"], []).append(
            (r["start_pos"], r["len_tokens"])
        )
    for doc, rr in by_doc.items():
        rr.sort()
        for (s1, l1), (s2, _l2) in zip(rr, rr[1:]):
            # matched-position ranges are [s, s+l-8]; maximality means the
            # next range starts at least 2 past the previous range's end
            assert s2 > (s1 + l1 - 8) + 1, (doc, rr)

    # subset: each duplicated stride-8 span aligns at some position
    # 1 + 8*j inside a doc that also reports a covering stride-1 run
    spans = QUERIES["dedup_span_exact"](spark, sf_dir).collect()
    docs_with_runs = set(by_doc)
    span_docs = set()
    tok_rows = QUERIES["text_fingerprint_md5"](spark, sf_dir).collect()
    assert tok_rows  # sanity: corpus non-empty
    if spans:
        # every doc contributing a duplicated non-overlapping span must
        # surface in the any-alignment runs too
        import collections

        span_text = {s["span"] for s in spans}
        from seoul_big_data_spark.functions import text as tx
        from seoul_big_data_spark.sources.tables import load
        from pyspark.sql import functions as F

        d = load(spark, "documents", sf_dir)
        toks = tx.tokens(F.lower(F.col("text")))
        exploded = d.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(toks) >= 8,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 7, F.lit(8)),
                        lambda i: F.array_join(F.slice(toks, i, 8), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("span"),
        ).collect()
        for row in exploded:
            if row["span"] in span_text:
                span_docs.add(row["doc_id"])
        assert span_docs <= docs_with_runs, (
            span_docs - docs_with_runs
        )
