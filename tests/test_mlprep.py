"""Corpus-hygiene layer (q_mlprep): repetition metrics, contamination
screening, PII redaction, weighted mixture sampling — semantic checks
beyond the oracle hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.q_mlprep import (
    sample_weighted_mixture,
    text_contamination_overlap,
    text_pii_redact,
    text_repetition_metrics,
)


def test_repetition_metrics_bounds_and_known_doc(spark, sf_dir):
    df = text_repetition_metrics(spark, sf_dir)
    bad = df.filter(
        (F.col("top_token_frac") <= 0)
        | (F.col("top_token_frac") > 1)
        | (F.col("dup_2gram_frac") < 0)
        | (F.col("dup_2gram_frac") > 1)
    )
    assert bad.count() == 0
    assert df.agg(F.min("n_tokens")).first()[0] >= 1


def test_contamination_scores_bounded_and_exclude_benchmark(spark, sf_dir):
    df = text_contamination_overlap(spark, sf_dir)
    assert df.filter(
        (F.col("contamination") < 0) | (F.col("contamination") > 1)
    ).count() == 0
    # benchmark source itself must not be scored
    from seoul_big_data_spark.sources.tables import load

    bench_ids = {
        r["doc_id"]
        for r in load(spark, "documents", sf_dir)
        .filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    scored = {r["doc_id"] for r in df.select("doc_id").collect()}
    assert not (bench_ids & scored)


def test_pii_redact_masks_every_injected_hit(spark, sf_dir):
    df = text_pii_redact(spark, sf_dir)
    # every row got exactly one injected email + phone, and the redacted
    # text contains the placeholders and no raw match remains
    bad = df.filter(
        (F.col("n_emails") != 1)
        | (F.col("n_phones") != 1)
        | ~F.col("redacted").contains("<EMAIL>")
        | ~F.col("redacted").contains("<PHONE>")
        | F.col("redacted").rlike("@ex\\.org")
        | F.col("redacted").rlike("010-[0-9]{4}-[0-9]{4}")
    )
    assert bad.count() == 0


def test_weighted_mixture_rates_ordered_by_tier(spark, sf_dir):
    from seoul_big_data_spark.sources.tables import load

    total = (
        load(spark, "documents", sf_dir)
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
    )
    kept = sample_weighted_mixture(spark, sf_dir).groupBy("source").count()
    rates = {
        r["source"]: r["count"] / r["n"]
        for r in kept.join(total, "source").collect()
    }
    hi = [v for k, v in rates.items() if k in {"src0", "src1", "src2", "src3"}]
    mid = [v for k, v in rates.items() if k in {"src4", "src5", "src6", "src7"}]
    lo = [v for k, v in rates.items() if k not in
          {"src0", "src1", "src2", "src3", "src4", "src5", "src6", "src7"}]
    # acceptance ordering must hold tier-wise (sampling noise at sf0.001 is
    # tolerable because the md5 draw is uniform; compare tier means)
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(hi) > mean(mid) > mean(lo)
    # determinism: same draw twice → identical selection
    a = {r["doc_id"] for r in sample_weighted_mixture(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in sample_weighted_mixture(spark, sf_dir).collect()}
    assert a == b
