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
