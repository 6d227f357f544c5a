"""Sun AU codec: PCM/float/G.711 encoding matrix on the shared int16
grid, feature parity with WAV and AIFF, companding roundtrip through
the ITU-T tables, dispatch, and malformed rejection."""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.sources.aiffcodec import encode_aiff, decode_aiff
from seoul_big_data_spark.sources.aucodec import decode_au, encode_au
from seoul_big_data_spark.sources.multimodal import (
    _decode_wav,
    _g711_table,
    encode_wav,
)


def _sig(n=480, channels=1, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=n * channels, dtype=np.int16)


@pytest.mark.parametrize("enc", [2, 3, 4, 5, 6, 7])
def test_au_linear_and_float_encodings(enc):
    x = _sig()
    if enc == 2:  # 8-bit: top-byte grid
        x = (x >> 8) << 8
    d = decode_au(encode_au(8000, 1, x, encoding=enc))
    ref = decode_au(encode_au(8000, 1, x, encoding=3))
    assert d["format"] == "au" and d["n_samples"] == len(x)
    assert d["rms"] == ref["rms"] and d["zero_cross_rate"] == ref["zero_cross_rate"]


def test_au_three_container_parity():
    x = _sig(seed=11)
    a = decode_au(encode_au(16000, 1, x, encoding=3))
    w = _decode_wav(encode_wav(16000, 1, x))
    f = decode_aiff(encode_aiff(16000, 1, x))
    for k in ("sample_rate", "channels", "n_samples", "duration_s", "rms",
              "zero_cross_rate"):
        assert a[k] == w[k] == f[k], k


@pytest.mark.parametrize("enc,law", [(1, "ulaw"), (27, "alaw")])
def test_au_g711_table_values_roundtrip(enc, law):
    # every expanded table value companded back to AU and decoded must
    # recover itself exactly (the code IS the nearest code)
    tbl = _g711_table(law)
    x = tbl.astype(np.int16)
    blob = encode_au(8000, 1, x, encoding=enc)
    got = decode_au(blob)
    ref = decode_au(encode_au(8000, 1, x, encoding=3))
    assert got["rms"] == pytest.approx(ref["rms"], abs=1e-12)
    assert got["n_samples"] == 256


def test_au_size_field_truncates():
    x = _sig(64)
    blob = bytearray(encode_au(8000, 1, x, encoding=3))
    # halve the declared size: decoder must honor it
    import struct
    struct.pack_into(">I", blob, 8, 64)
    assert decode_au(bytes(blob))["n_samples"] == 32


def test_au_malformed_and_boundary():
    x = _sig(32)
    with pytest.raises(ValueError):
        decode_au(b"x" + encode_au(8000, 1, x)[1:])
    bad = bytearray(encode_au(8000, 1, x))
    import struct
    struct.pack_into(">I", bad, 12, 23)  # G.721 ADPCM: documented boundary
    with pytest.raises(NotImplementedError):
        decode_au(bytes(bad))


def test_au_audio_dispatch(spark):
    import pandas as pd

    from seoul_big_data_spark.sources.multimodal import decode_audio_features

    blob = encode_au(8000, 2, _sig(128, channels=2), encoding=1)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(blob)]})
    )
    row = decode_audio_features(df).collect()[0]
    assert row["format"] == "au" and row["channels"] == 2
