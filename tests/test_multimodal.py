"""N5 multimodal plumbing — mapInPandas decode stage with stubbed codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seoul_big_data_spark.sources.multimodal import _decode_payload, decode_features
from seoul_big_data_spark.sources.tables import load


def test_decode_features_schema_and_determinism(spark, sf_dir):
    d = load(spark, "documents", sf_dir).limit(50)
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = decode_features(blobs)
    assert out.columns == ["doc_id", "n_bytes", "format", "width", "height", "feat_mean"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 50
    # n_bytes must equal the utf-8 length computed natively
    native = {
        r["doc_id"]: r["n"]
        for r in blobs.select("doc_id", F.octet_length("payload").alias("n")).collect()
    }
    for doc_id, r in rows.items():
        assert r["n_bytes"] == native[doc_id]
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert 0.0 <= r["feat_mean"] <= 255.0


def test_real_codecs_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG...", fmt="image/png")
