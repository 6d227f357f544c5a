"""QOI codec: lossless roundtrip over op-diverse content, dispatch,
cross-container parity, and the malformed-blob contract."""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.sources.multimodal import (
    _decode_payload,
    _decode_pixels_rgb,
    encode_bmp_array,
)
from seoul_big_data_spark.sources.qoicodec import (
    decode_qoi,
    decode_qoi_pixels,
    encode_qoi,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_qoi_roundtrip_random():
    src = _img(23, 17)
    assert np.array_equal(decode_qoi_pixels(encode_qoi(src)), src)


def test_qoi_roundtrip_op_diverse():
    # runs (flat regions), index hits (repeating palette), small diffs,
    # luma diffs, literals — all five op families in one image
    src = np.zeros((16, 32, 3), dtype=np.uint8)
    src[:4] = 200                                  # long runs
    src[4:8, ::2] = (10, 20, 30)                   # index alternation
    ramp = np.arange(32, dtype=np.uint8)
    src[8] = np.stack([ramp, ramp, ramp], axis=1)  # +1 diffs
    src[9] = np.stack([ramp * 5, ramp * 5, ramp * 5], axis=1)  # luma range
    src[10:] = _img(6, 32, seed=3)                 # literals
    blob = encode_qoi(src)
    assert np.array_equal(decode_qoi_pixels(blob), src)
    assert len(blob) < src.size + 22  # ops actually compress vs raw


def test_qoi_rgba_roundtrip():
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, size=(9, 11, 4), dtype=np.uint8)
    got = decode_qoi_pixels(encode_qoi(src))
    assert got.shape == (9, 11, 4)
    assert np.array_equal(got, src)


def test_qoi_wrapping_diffs():
    # channel wraparound (255 -> 0 is diff +1 under wrapping arithmetic)
    src = np.zeros((1, 4, 3), dtype=np.uint8)
    src[0] = [(255, 255, 255), (0, 0, 0), (254, 0, 2), (2, 4, 250)]
    assert np.array_equal(decode_qoi_pixels(encode_qoi(src)), src)


def test_qoi_dispatch_and_stats():
    src = _img(10, 12, seed=9)
    blob = encode_qoi(src)
    d = _decode_payload(blob)
    assert d["format"] == "qoi" and (d["width"], d["height"]) == (12, 10)
    assert d["mean_g"] == pytest.approx(src[:, :, 1].mean())
    assert decode_qoi(blob)["channels"] == 3


def test_qoi_matches_bmp_pixels():
    src = _img(14, 14, seed=21)
    assert np.array_equal(
        _decode_pixels_rgb(encode_qoi(src)),
        _decode_pixels_rgb(encode_bmp_array(src)),
    )


def test_qoi_malformed_rejects():
    src = _img(8, 8)
    blob = encode_qoi(src)
    with pytest.raises(ValueError):
        decode_qoi_pixels(b"qoix" + blob[4:])
    with pytest.raises(ValueError):
        decode_qoi_pixels(blob[:-20])        # truncated stream
    bad = bytearray(blob)
    bad[-1] = 0x02                           # corrupt end marker
    with pytest.raises(ValueError):
        decode_qoi_pixels(bytes(bad))
    run_past = bytearray(encode_qoi(np.zeros((1, 2, 3), dtype=np.uint8)))
    # replace the stream with a 62-run on a 2-pixel image
    run_past[14:-8] = bytes([0xC0 | 61])
    with pytest.raises(ValueError):
        decode_qoi_pixels(bytes(run_past))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        channels=st.sampled_from([3, 4]),
        flavor=st.sampled_from(["noise", "flat", "ramp"]),
        seed=st.integers(0, 2**16),
    )
    def test_qoi_property_lossless(h, w, channels, flavor, seed):
        rng = np.random.default_rng(seed)
        if flavor == "noise":
            src = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
        elif flavor == "flat":
            src = np.full((h, w, channels), rng.integers(0, 256), dtype=np.uint8)
        else:
            ramp = (np.arange(h * w) % 256).astype(np.uint8)
            src = np.stack([ramp] * channels, axis=1).reshape(h, w, channels)
        assert np.array_equal(decode_qoi_pixels(encode_qoi(src)), src)

except ImportError:  # pragma: no cover
    pass
