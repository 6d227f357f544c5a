"""Multimodal column plumbing (north-star N5, SURVEY.md §2.10).

Images/audio/video are opaque ``binary`` payload columns with typed metadata.
The decode / feature-extract / resize / frame-sample stages run as Arrow-
batched ``mapInPandas`` — per-partition, vectorized, no driver involvement —
which is the correct 100 TB shape: decode cost scales with executors, and the
payload bytes never leave the executor that scanned them.

The actual media decoding is STUBBED: this container has no image/audio libs
(PIL/cv2/torchaudio). ``_decode_payload`` raises ``NotImplementedError`` for
real media and falls back to a deterministic fake for payloads tagged
``fake/*`` — so the Spark-side plumbing (schema, batching, UDF signature) is
real and fully tested while the codec slot stays explicit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, width int, height int, "
    "feat_mean double"
)


def _decode_payload(payload: bytes, fmt: str = "fake/text") -> dict:
    """Decode one payload. REAL CODECS NOT AVAILABLE IN THIS CONTAINER.

    For ``fake/*`` formats, produces deterministic pseudo-features from the
    raw bytes (so tests exercise the full path). Any real media format raises
    NotImplementedError — the integration point for PIL/ffmpeg when present.
    """
    if not fmt.startswith("fake/"):
        raise NotImplementedError(
            f"media codec for {fmt!r} not available in this environment; "
            "plug PIL/cv2/ffmpeg here"
        )
    n = len(payload)
    # Deterministic fake: "dimensions" from byte length, "feature" = mean byte.
    return {
        "n_bytes": n,
        "format": fmt,
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "feat_mean": (sum(payload) / n) if n else 0.0,
    }


def decode_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode stage: (doc_id, payload binary) → typed metadata +
    features. Arrow moves each partition's batch into pandas once; the loop
    below is per-batch vectorizable when a real codec lands."""

    from ..session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"doc_id": doc_id, **_decode_payload(bytes(payload))}
                for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "format",
                    "width",
                    "height",
                    "feat_mean",
                ],
            )

    return df.mapInPandas(_decode, schema=DECODE_SCHEMA)
