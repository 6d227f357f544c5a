"""AIFF/AIFF-C codec: exact int16-grid recovery across the PCM depth
matrix, sowt and float AIFC forms, 80-bit extended sample-rate
roundtrip, feature parity with the WAV path, and malformed rejection."""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.sources.aiffcodec import (
    _read_extended,
    _write_extended,
    decode_aiff,
    encode_aiff,
)
from seoul_big_data_spark.sources.multimodal import _decode_wav, encode_wav


def _sig(n=480, channels=1, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=n * channels, dtype=np.int16)


@pytest.mark.parametrize("rate", [8000, 11025, 44100, 48000, 96000])
def test_extended_float_roundtrip(rate):
    assert _read_extended(_write_extended(float(rate))) == float(rate)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_aiff_pcm_depths(bits):
    x = _sig()
    if bits == 8:  # top-byte grid: only the high byte survives
        x = (x >> 8) << 8
    d = decode_aiff(encode_aiff(8000, 1, x, bits=bits))
    assert d["format"] == "aiff" and d["sample_rate"] == 8000
    assert d["n_samples"] == len(x)
    # exact grid recovery: re-encode at 16-bit and compare features
    ref = decode_aiff(encode_aiff(8000, 1, x, bits=16))
    assert d["rms"] == ref["rms"] and d["zero_cross_rate"] == ref["zero_cross_rate"]


@pytest.mark.parametrize("comp", [b"sowt", b"fl32", b"fl64"])
def test_aifc_forms(comp):
    x = _sig(channels=2)
    d = decode_aiff(encode_aiff(44100, 2, x, compression=comp))
    ref = decode_aiff(encode_aiff(44100, 2, x))
    assert d["channels"] == 2 and d["n_samples"] == ref["n_samples"]
    assert d["rms"] == pytest.approx(ref["rms"], abs=1e-9)
    assert d["zero_cross_rate"] == ref["zero_cross_rate"]


def test_aiff_matches_wav_features():
    # Same samples through AIFF and the audited WAV path: identical rows
    # (shared int16 grid and feature formulas).
    x = _sig(seed=11)
    a = decode_aiff(encode_aiff(16000, 1, x))
    w = _decode_wav(encode_wav(16000, 1, x))
    for k in ("sample_rate", "channels", "n_samples", "duration_s", "rms",
              "zero_cross_rate"):
        assert a[k] == w[k], k


def test_aiff_stereo_features_use_channel0():
    x = _sig(channels=2, seed=7)
    d = decode_aiff(encode_aiff(8000, 2, x))
    ch0 = x[::2].astype(np.float64) / 32768.0
    assert d["rms"] == pytest.approx(float(np.sqrt(np.mean(ch0 * ch0))))


def test_aiff_malformed_rejects():
    x = _sig(64)
    blob = encode_aiff(8000, 1, x)
    with pytest.raises(ValueError):
        decode_aiff(b"FORM" + blob[4:8] + b"WAVE" + blob[12:])
    with pytest.raises(ValueError):
        decode_aiff(blob[:20])  # COMM/SSND missing
    bad = bytearray(blob)
    i = bytes(bad).find(b"COMM")
    bad[i:i + 4] = b"CXMM"
    with pytest.raises(ValueError):
        decode_aiff(bytes(bad))
    with pytest.raises(NotImplementedError):
        decode_aiff(
            encode_aiff(8000, 1, x, compression=b"sowt").replace(
                b"sowt", b"ima4", 1
            )
        )


def test_aiff_audio_dispatch(spark):
    import pandas as pd

    from seoul_big_data_spark.sources.multimodal import decode_audio_features

    blob = encode_aiff(8000, 1, _sig(128))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(blob)]})
    )
    row = decode_audio_features(df).collect()[0]
    assert row["format"] == "aiff" and row["sample_rate"] == 8000
