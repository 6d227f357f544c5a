"""PCX codec: lossless roundtrip across the 24-bit / palette / mono
matrix, per-scanline RLE, dispatch, cross-container parity, fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.sources.multimodal import (
    _decode_payload,
    _decode_pixels_rgb,
    encode_bmp_array,
)
from seoul_big_data_spark.sources.pcxcodec import (
    decode_pcx,
    decode_pcx_pixels,
    encode_pcx,
    sniff_pcx,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_pcx_24bit_lossless():
    src = _img(13, 9)
    blob = encode_pcx(src)
    assert sniff_pcx(blob)
    assert np.array_equal(decode_pcx_pixels(blob), src)


def test_pcx_24bit_odd_width_padding():
    src = _img(5, 7, seed=2)  # odd width: bytes-per-line pads to even
    assert np.array_equal(decode_pcx_pixels(encode_pcx(src)), src)


def test_pcx_palette_roundtrip():
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, size=(11, 8), dtype=np.uint8)
    got = decode_pcx_pixels(encode_pcx(idx, palette=palette))
    assert np.array_equal(got, palette[idx])


def test_pcx_mono_roundtrip():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, size=(9, 13), dtype=np.uint8)
    got = decode_pcx_pixels(encode_pcx(bits, mono=True))
    assert np.array_equal(got, np.repeat((bits * 255)[:, :, None], 3, axis=2))


def test_pcx_rle_compresses_runs():
    flat = np.full((16, 32, 3), 77, dtype=np.uint8)
    noisy = _img(16, 32, seed=5)
    assert len(encode_pcx(flat)) < len(encode_pcx(noisy))
    assert np.array_equal(decode_pcx_pixels(encode_pcx(flat)), flat)


def test_pcx_dispatch_and_parity():
    src = _img(12, 10, seed=9)
    blob = encode_pcx(src)
    d = _decode_payload(blob)
    assert d["format"] == "pcx" and (d["width"], d["height"]) == (10, 12)
    assert d["mean_b"] == pytest.approx(src[:, :, 2].mean())
    assert np.array_equal(
        _decode_pixels_rgb(blob), _decode_pixels_rgb(encode_bmp_array(src))
    )


def test_pcx_malformed_rejects():
    src = _img(8, 8)
    blob = encode_pcx(src)
    with pytest.raises(ValueError):
        decode_pcx_pixels(blob[:100])  # shorter than the header
    with pytest.raises(ValueError):
        decode_pcx_pixels(blob[:140])  # truncated RLE
    bad = bytearray(blob)
    bad[2] = 0  # uncompressed encoding id: not the RLE signature
    assert not sniff_pcx(bytes(bad))
