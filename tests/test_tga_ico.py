"""TGA + ICO/CUR codec coverage: decode parity against the audited
BMP/PNG paths, RLE losslessness, orientation, the 5-bit grid for 16-bit,
AND-mask transparency, container-invariant perceptual hashing, and the
malformed-blob contract (reject cleanly, never hang)."""

from __future__ import annotations

import numpy as np
import pytest

from seoul_big_data_spark.sources.icocodec import (
    decode_ico,
    decode_ico_pixels,
    encode_ico,
    parse_ico_directory,
)
from seoul_big_data_spark.sources.multimodal import (
    _decode_payload,
    _decode_pixels_rgb,
    encode_bmp_array,
    encode_png,
)
from seoul_big_data_spark.sources.tgacodec import (
    decode_tga,
    decode_tga_pixels,
    encode_tga,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# TGA
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("top_down", [True, False])
@pytest.mark.parametrize("depth", [24, 32])
def test_tga_truecolor_lossless(depth, top_down):
    src = _img(13, 9)
    blob = encode_tga(src, depth=depth, top_down=top_down)
    assert np.array_equal(decode_tga_pixels(blob), src)


@pytest.mark.parametrize("depth", [8, 16, 24, 32])
def test_tga_rle_equals_raw(depth):
    # Runs + noise exercise both packet kinds.
    src = _img(17, 21)
    src[3:7] = 200
    src[:, 4:9] = 10
    if depth == 8:
        gray = src[:, :, 0]
        raw = encode_tga(gray, depth=8, rle=False)
        rle = encode_tga(gray, depth=8, rle=True)
    else:
        raw = encode_tga(src, depth=depth, rle=False)
        rle = encode_tga(src, depth=depth, rle=True)
    assert np.array_equal(decode_tga_pixels(rle), decode_tga_pixels(raw))
    assert len(rle) < len(raw)  # the runs must actually compress


def test_tga_16bit_is_5bit_grid():
    src = _img(6, 8)
    got = decode_tga_pixels(encode_tga(src, depth=16))
    q = (src >> 3).astype(np.uint16)
    want = ((q << 3) | (q >> 2)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_tga_palette_roundtrip():
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, size=(11, 7), dtype=np.uint8)
    for rle in (False, True):
        blob = encode_tga(idx, depth=8, rle=rle, palette=palette)
        assert np.array_equal(decode_tga_pixels(blob), palette[idx])


def test_tga_grayscale_replicates_channels():
    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    px = decode_tga_pixels(encode_tga(gray, depth=8))
    assert np.array_equal(px, np.repeat(gray[:, :, None], 3, axis=2))


def test_tga_matches_bmp_decode():
    # Same pixels through TGA and the audited BMP path must agree exactly.
    src = _img(12, 16, seed=11)
    assert np.array_equal(
        decode_tga_pixels(encode_tga(src)),
        _decode_pixels_rgb(encode_bmp_array(src)),
    )


def test_tga_stats_and_dispatch():
    src = _img(10, 10, seed=5)
    blob = encode_tga(src)
    d = _decode_payload(blob)  # footer-sniffed
    assert d["format"] == "tga" and (d["width"], d["height"]) == (10, 10)
    assert d["mean_r"] == pytest.approx(src[:, :, 0].mean())
    assert decode_tga(blob)["feat_mean"] == pytest.approx(src.mean())


def test_tga_malformed_rejects():
    src = _img(9, 9)
    raw = encode_tga(src, rle=False)
    rle = encode_tga(src, rle=True)
    for blob in (raw[:30], rle[: len(rle) // 2]):
        with pytest.raises(ValueError):
            decode_tga_pixels(blob + b"TRUEVISION-XFILE\x2e\x00")
    bad_type = bytearray(raw)
    bad_type[2] = 7
    with pytest.raises(ValueError):
        decode_tga_pixels(bytes(bad_type))
    # RLE that overruns the pixel array must raise, not write past the end
    hdr = raw[:18]
    overrun = hdr + b"\xff" + b"\x01\x02\x03" * 1  # 128-run x many loops
    with pytest.raises(ValueError):
        decode_tga_pixels(overrun + b"\x00" * 4)


# ---------------------------------------------------------------------------
# ICO / CUR
# ---------------------------------------------------------------------------


def test_ico_wraps_bmp_losslessly():
    src = _img(16, 16, seed=21)
    ico = encode_ico([encode_bmp_array(src)])
    assert np.array_equal(decode_ico_pixels(ico), src)
    d = _decode_payload(ico)
    assert d["format"] == "ico" and d["channels"] == 3  # all-opaque mask
    assert d["mean_g"] == pytest.approx(src[:, :, 1].mean())


def test_ico_wraps_png_losslessly():
    src = _img(24, 18, seed=22)
    ico = encode_ico([encode_png(src)])
    assert np.array_equal(decode_ico_pixels(ico), src)


def test_ico_picks_largest_entry():
    small = _img(8, 8, seed=1)
    big = _img(32, 32, seed=2)
    ico = encode_ico([encode_bmp_array(small), encode_bmp_array(big)])
    assert len(parse_ico_directory(ico)) == 2
    assert np.array_equal(decode_ico_pixels(ico), big)


def test_cur_parses_as_cursor():
    src = _img(16, 16, seed=9)
    cur = encode_ico([encode_bmp_array(src)], cursor=True)
    assert decode_ico(cur)["format"] == "cur"
    assert np.array_equal(decode_ico_pixels(cur), src)


def test_ico_and_mask_transparency_reported():
    src = _img(8, 8, seed=4)
    ico = bytearray(encode_ico([encode_bmp_array(src)]))
    # Set one AND-mask bit (mask is the trailing 32 bytes: 8 rows x 4).
    ico[-32] = 0x80
    d = decode_ico(bytes(ico))
    assert d["channels"] == 4  # transparent pixels present
    assert np.array_equal(decode_ico_pixels(bytes(ico)), src)  # XOR intact


def test_ico_malformed_rejects():
    src = _img(8, 8)
    ico = encode_ico([encode_bmp_array(src)])
    with pytest.raises(ValueError):
        parse_ico_directory(ico[:5])
    bad = bytearray(ico)
    bad[2] = 9  # type word: neither icon nor cursor
    with pytest.raises(ValueError):
        parse_ico_directory(bytes(bad))
    trunc = bytearray(ico[:40])  # directory points past the payload
    with pytest.raises(ValueError):
        parse_ico_directory(bytes(trunc))


def test_phash_container_invariant_bmp_tga_ico():
    from seoul_big_data_spark.sources.multimodal import _ahash_bits

    def phash(blob):
        return _ahash_bits(_decode_pixels_rgb(blob))

    src = _img(32, 32, seed=33)
    h_bmp = phash(encode_bmp_array(src))
    assert phash(encode_tga(src)) == h_bmp
    assert phash(encode_tga(src, rle=True, top_down=False)) == h_bmp
    assert phash(encode_ico([encode_bmp_array(src)])) == h_bmp


# ---------------------------------------------------------------------------
# Property layer (repo convention: hypothesis over the codec parameter space)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        depth=st.sampled_from([8, 24, 32]),
        rle=st.booleans(),
        top_down=st.booleans(),
        seed=st.integers(0, 2**16),
    )
    def test_tga_property_lossless(h, w, depth, rle, top_down, seed):
        rng = np.random.default_rng(seed)
        if depth == 8:
            src = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            want = np.repeat(src[:, :, None], 3, axis=2)
        else:
            src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            want = src
        blob = encode_tga(src, depth=depth, rle=rle, top_down=top_down)
        assert np.array_equal(decode_tga_pixels(blob), want)

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 32),
        w=st.integers(1, 32),
        use_png=st.booleans(),
        seed=st.integers(0, 2**16),
    )
    def test_ico_property_lossless(h, w, use_png, seed):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        wrap = encode_png(src) if use_png else encode_bmp_array(src)
        assert np.array_equal(decode_ico_pixels(encode_ico([wrap])), src)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
