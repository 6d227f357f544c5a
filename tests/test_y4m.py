"""Y4M (YUV4MPEG2) codec: byte-lossless plane roundtrip across the
colorspace matrix, RGB parity with the in-repo JPEG conversion
conventions, arithmetic frame seeking, the sample_frames dispatch, and
the malformed-blob contract."""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.sources.y4mcodec import (
    decode_y4m_frames,
    decode_y4m_planes,
    encode_y4m,
    encode_y4m_planes,
    y4m_frame_stats,
)


def _planes(n, w, h, ch, cv, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if ch == 0:
            out.append((y,))
        else:
            u = rng.integers(0, 256, size=(h // cv, w // ch), dtype=np.uint8)
            v = rng.integers(0, 256, size=(h // cv, w // ch), dtype=np.uint8)
            out.append((y, u, v))
    return out


@pytest.mark.parametrize(
    "csp,ch,cv",
    [("420jpeg", 2, 2), ("420", 2, 2), ("422", 2, 1), ("444", 1, 1), ("mono", 0, 0)],
)
def test_y4m_planes_lossless(csp, ch, cv):
    frames = _planes(3, 16, 12, ch, cv)
    blob = encode_y4m_planes(frames, 16, 12, csp)
    got = decode_y4m_planes(blob)
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert len(a) == len(b)
        for pa, pb in zip(a, b):
            assert np.array_equal(pa, pb)


def test_y4m_rgb_roundtrip_tolerance():
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    got = decode_y4m_frames(encode_y4m(src, csp="444"))
    # full-range BT.601 forward+inverse with one rounding step each way
    assert np.abs(got.astype(int) - src.astype(int)).max() <= 2


def test_y4m_matches_jpeg_color_convention():
    # A flat-color frame through Y4M C444 and through the JPEG codec at
    # quality 100 must agree closely: same matrix, same rounding family.
    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    src = np.full((1, 16, 16, 3), (200, 64, 120), dtype=np.uint8)
    via_y4m = decode_y4m_frames(encode_y4m(src, csp="444"))[0]
    via_jpeg = decode_jpeg_pixels(encode_jpeg(src[0], quality=100))
    assert np.abs(via_y4m.astype(int) - via_jpeg.astype(int)).max() <= 2


def test_y4m_mono_replicates():
    frames = _planes(1, 10, 6, 0, 0)
    rgb = decode_y4m_frames(encode_y4m_planes(frames, 10, 6, "mono"))
    assert np.array_equal(rgb[0], np.repeat(frames[0][0][:, :, None], 3, axis=2))


def test_y4m_frame_stats_samples_every_k():
    frames = _planes(7, 8, 8, 1, 1)
    blob = encode_y4m_planes(frames, 8, 8, "444")
    stats = y4m_frame_stats(blob, every_k=3)
    assert [s["frame_idx"] for s in stats] == [0, 3, 6]
    assert all(s["n_frames"] == 7 for s in stats)
    assert stats[0]["format"] == "y4m/C444"
    # stats agree with the full decode of the same frame
    full = decode_y4m_frames(blob)
    want = full[3].astype(np.int64).mean(axis=(0, 1))
    assert stats[1]["mean_r"] == pytest.approx(want[0])


def test_y4m_sample_frames_dispatch(spark):
    import pandas as pd

    from seoul_big_data_spark.sources.multimodal import sample_frames

    frames = _planes(4, 8, 8, 2, 2, seed=5)
    blob = encode_y4m_planes(frames, 8, 8, "420jpeg")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(blob)]})
    )
    rows = sample_frames(df, every_k=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2]
    assert rows[0]["format"] == "y4m/C420jpeg"
    assert rows[0]["width"] == 8 and rows[0]["n_frames"] == 4


def test_y4m_malformed_rejects():
    frames = _planes(2, 8, 8, 1, 1)
    blob = encode_y4m_planes(frames, 8, 8, "444")
    with pytest.raises(ValueError):
        decode_y4m_planes(b"NOTAY4M\n" + blob[10:])
    with pytest.raises(ValueError):
        decode_y4m_planes(blob[:-20])  # truncated frame data
    bad = bytearray(blob)
    i = bytes(bad).find(b"FRAME", 10)
    bad[i:i + 5] = b"FRUME"
    with pytest.raises(ValueError):
        decode_y4m_planes(bytes(bad))
    with pytest.raises(NotImplementedError):
        decode_y4m_planes(b"YUV4MPEG2 W8 H8 C410\nFRAME\n" + b"\x00" * 96)
    with pytest.raises(ValueError):
        decode_y4m_planes(b"YUV4MPEG2 W9 H9 C420\nFRAME\n" + b"\x00" * 200)
