"""N5 multimodal plumbing — mapInPandas decode stage with REAL pure-Python
codecs (BMP 24/32-bit, PPM/PGM, PNG incl. palette, baseline JPEG, GIF incl.
animation, TIFF incl. multi-page; WAV PCM8/16 + G.711 + IMA ADPCM + FLAC), all
producing content-derived stats, with an explicit codec slot for the
entropy formats that remain (arithmetic JPEG, MP3/AAC)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seoul_big_data_spark.sources.multimodal import (
    _decode_payload,
    decode_features,
    encode_bmp,
)
from seoul_big_data_spark.sources.tables import load

COLS = [
    "doc_id", "n_bytes", "format", "width", "height", "channels",
    "mean_r", "mean_g", "mean_b", "feat_mean",
]


def test_bmp_decode_known_pixels():
    # 3x2 image, width 3 → row stride padded 9→12: exercises the padding path
    px = {
        (0, 0): (255, 0, 0), (1, 0): (0, 255, 0), (2, 0): (0, 0, 255),
        (0, 1): (10, 20, 30), (1, 1): (40, 50, 60), (2, 1): (70, 80, 90),
    }
    payload = encode_bmp(3, 2, lambda x, y: px[(x, y)])
    got = _decode_payload(payload)
    assert (got["format"], got["width"], got["height"], got["channels"]) == (
        "bmp", 3, 2, 3
    )
    assert got["mean_r"] == pytest.approx((255 + 0 + 0 + 10 + 40 + 70) / 6)
    assert got["mean_g"] == pytest.approx((0 + 255 + 0 + 20 + 50 + 80) / 6)
    assert got["mean_b"] == pytest.approx((0 + 0 + 255 + 30 + 60 + 90) / 6)
    assert got["feat_mean"] == pytest.approx(
        sum(v for rgb in px.values() for v in rgb) / 18
    )
    assert got["n_bytes"] == len(payload) == 54 + 2 * 12


def test_ppm_p6_and_p3_decode_agree():
    # 2x2 with a header comment; P6 binary and P3 ascii must decode the same
    pix = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (250, 128, 0)]
    body = b"".join(bytes(p) for p in pix)
    p6 = b"P6\n# test comment\n2 2\n255\n" + body
    p3 = ("P3\n# test comment\n2 2\n255\n" + " ".join(
        str(v) for p in pix for v in p
    )).encode()
    g6, g3 = _decode_payload(p6), _decode_payload(p3)
    for got in (g6, g3):
        assert (got["format"], got["width"], got["height"]) == ("ppm", 2, 2)
        assert got["mean_r"] == pytest.approx((1 + 4 + 7 + 250) / 4)
        assert got["mean_g"] == pytest.approx((2 + 5 + 8 + 128) / 4)
        assert got["mean_b"] == pytest.approx((3 + 6 + 9 + 0) / 4)
    assert g6["feat_mean"] == pytest.approx(g3["feat_mean"])


def test_decode_features_real_images_distributed(spark):
    """End-to-end: binary payload column → mapInPandas decode → exact stats.
    Mixed formats in one batch (BMP + PPM + fake) exercise the dispatch."""
    bmp = encode_bmp(4, 3, lambda x, y: (x * 10, y * 20, (x + y) * 5))
    ppm = b"P6\n2 1\n255\n" + bytes((100, 150, 200, 50, 60, 70))
    rows = [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, bytearray(b"opaque-bytes"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_features(df.repartition(3)).collect()}
    assert out[1]["format"] == "bmp" and (out[1]["width"], out[1]["height"]) == (4, 3)
    assert out[1]["mean_r"] == pytest.approx(sum(x * 10 for x in range(4)) * 3 / 12)
    assert out[2]["format"] == "ppm" and out[2]["mean_b"] == pytest.approx(135.0)
    assert out[3]["format"] == "fake/opaque" and out[3]["mean_r"] is None
    assert out[3]["feat_mean"] == pytest.approx(sum(b"opaque-bytes") / 12)


def test_decode_features_schema_and_determinism(spark, sf_dir):
    d = load(spark, "documents", sf_dir).limit(50)
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = decode_features(blobs)
    assert out.columns == COLS
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


def test_compressed_formats_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG...", fmt="image/png")
    with pytest.raises(ValueError):
        # maxval beyond the netpbm spec range is malformed, not a codec gap
        _decode_payload(b"P6\n1 1\n70000\n\x00\x00\x00\x00\x00\x00")


# --- audio (WAV) ------------------------------------------------------------


def test_wav_roundtrip_known_waveform(spark):
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import _decode_wav, encode_wav

    # 100 frames of a constant +1000 then -1000 alternating each frame:
    # RMS exactly 1000/32768, zero-crossing at every step
    wave = [1000 if i % 2 == 0 else -1000 for i in range(100)]
    meta = _decode_wav(encode_wav(16000, 1, wave))
    assert meta["format"] == "wav"
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 1
    assert meta["n_samples"] == 100
    assert meta["duration_s"] == 100 / 16000
    assert abs(meta["rms"] - 1000 / 32768) < 1e-12
    assert meta["zero_cross_rate"] == 1.0

    # stereo: channel 0 silent -> rms 0, zcr 0
    stereo = []
    for i in range(50):
        stereo += [0, 5000]
    meta2 = _decode_wav(encode_wav(8000, 2, stereo))
    assert meta2["channels"] == 2
    assert meta2["n_samples"] == 50
    assert meta2["rms"] == 0.0
    assert meta2["zero_cross_rate"] == 0.0


def test_wav_rejects_non_pcm(spark):
    import struct as _s

    import pytest as _pt

    from seoul_big_data_spark.sources.multimodal import _decode_wav, encode_wav

    payload = bytearray(encode_wav(8000, 1, [0, 1, -1]))
    # flip audio_format to 85 (MPEG Layer III) in the fmt chunk — the
    # perceptual-coding boundary (IEEE float decodes for real since r4)
    payload[20:22] = _s.pack("<H", 85)
    with _pt.raises(NotImplementedError):
        _decode_wav(bytes(payload))


def test_wav_deep_formats_reduce_to_int16_grid():
    """24/32-bit PCM and IEEE float-32 (incl. WAVE_FORMAT_EXTENSIBLE
    wrapping) decode to the same int16-grid features as the 16-bit twin —
    the audio analog of the raster top-byte convention."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_wav,
        encode_wav,
        encode_wav_deep,
    )

    rng = np.random.RandomState(9)
    s16 = rng.randint(-30000, 30000, size=500).astype("int16")
    ref = _decode_wav(encode_wav(8000, 1, s16))

    d24 = _decode_wav(encode_wav_deep(8000, 1, s16.astype("int32") << 8,
                                      bits=24))
    assert d24["rms"] == pytest.approx(ref["rms"], abs=1e-12)
    assert d24["zero_cross_rate"] == pytest.approx(ref["zero_cross_rate"])

    d32 = _decode_wav(encode_wav_deep(8000, 1, s16.astype("int32") << 16,
                                      bits=32))
    assert d32["rms"] == pytest.approx(ref["rms"], abs=1e-12)

    df_ = _decode_wav(encode_wav_deep(
        8000, 1, (s16 / 32768.0).astype("float32"), float_fmt=True
    ))
    assert df_["rms"] == pytest.approx(ref["rms"], abs=1e-4)

    dext = _decode_wav(encode_wav_deep(8000, 1, s16.astype("int32") << 8,
                                       bits=24, extensible=True))
    assert dext["rms"] == pytest.approx(ref["rms"], abs=1e-12)
    assert dext["n_samples"] == ref["n_samples"]


def test_audio_decode_query_runs(spark, sf_dir):
    from seoul_big_data_spark.queries import QUERIES

    out = QUERIES["multimodal_audio_decode"](spark, sf_dir).collect()
    assert len(out) == 500
    fmts = {0: "wav", 1: "wav", 2: "wav", 3: "wav", 4: "flac", 5: "aiff", 6: "au"}
    for r in out[:20]:
        codec = r["doc_id"] % 7
        assert r["format"] == fmts[codec]
        assert r["sample_rate"] == 8000
        assert 800 <= r["n_samples"] <= 1000
        amp = (r["doc_id"] % 20000) + 4000
        if codec in (0, 4, 5):
            # linear PCM (WAV or AIFF) and lossless FLAC: exact RMS
            assert abs(r["rms"] - amp / 32768) < 1e-6
        elif codec == 3:
            # IMA ADPCM: slew at square-wave transitions (worst swept
            # case over the render space: rel 0.10 at period 9)
            assert r["rms"] == pytest.approx(amp / 32768, rel=0.13)
        else:
            # G.711-companded rows (WAV or AU): segment-quantization error
            assert r["rms"] == pytest.approx(amp / 32768, rel=0.04)


# --- video (concatenated PPM frames) ----------------------------------------


def test_ppm_stream_split_and_sample_exact(spark):
    from seoul_big_data_spark.sources.multimodal import (
        _decode_ppm,
        encode_ppm,
        split_ppm_stream,
    )

    # 5 frames, 2x2, frame f has constant color (f*50, 10, 20)
    clip = b"".join(
        encode_ppm(2, 2, lambda x, y, f=f: (f * 50, 10, 20)) for f in range(5)
    )
    frames = split_ppm_stream(clip)
    assert len(frames) == 5
    for f, payload in enumerate(frames):
        meta = _decode_ppm(payload)
        assert (meta["width"], meta["height"]) == (2, 2)
        assert meta["mean_r"] == f * 50
        assert meta["mean_g"] == 10
        assert meta["mean_b"] == 20


def test_frame_sample_query_runs(spark, sf_dir):
    from seoul_big_data_spark.queries import QUERIES

    rows = QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 500
    for doc_id, frames in list(by_doc.items())[:30]:
        n_frames = (doc_id // 3 % 5) + 2
        want_idx = list(range(0, n_frames, 2))
        assert sorted(r["frame_idx"] for r in frames) == want_idx
        for r in frames:
            assert r["n_frames"] == n_frames
            # frame f is (f*40 % 256, ...) on the red channel
            assert r["mean_r"] == (r["frame_idx"] * 40) % 256


def test_phash_stability_and_locality(spark):
    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_bmp_pixels,
        encode_bmp,
    )

    def img(perturb: int = 0):
        def pix(x, y):
            v = (x * 16 + y * 3) % 256
            if perturb and x == 3 and y == 3:
                v = (v + perturb) % 256
            return (v, 255 - v, (v * 7) % 256)

        return encode_bmp(16, 16, pix)

    base = _ahash_bits(_decode_bmp_pixels(img()))
    again = _ahash_bits(_decode_bmp_pixels(img()))
    assert base == again  # deterministic across calls
    near = _ahash_bits(_decode_bmp_pixels(img(perturb=40)))
    hamming = bin(base ^ near).count("1")
    assert hamming <= 8  # one-pixel change flips at most its own block bits


def test_decode_bmp_pixels_roundtrip(spark):
    from seoul_big_data_spark.sources.multimodal import (
        _decode_bmp_pixels,
        encode_bmp,
    )

    def pix(x, y):
        return (x * 10 % 256, y * 20 % 256, (x + y) % 256)

    px = _decode_bmp_pixels(encode_bmp(5, 4, pix))
    assert px.shape == (4, 5, 3)
    # BMP stores bottom-up BGR; row 0 of the array is the BOTTOM image row
    r, g, b = pix(2, 3)
    assert tuple(px[0, 2]) == (b, g, r)
    r, g, b = pix(4, 0)
    assert tuple(px[3, 4]) == (b, g, r)


def test_encode_bmp_array_byte_identical_to_callback_form():
    """encode_bmp_array must be byte-for-byte the encode_bmp output for the
    same pixel function — including bottom-up row order, BGR byte order,
    and row padding (a 3-wide image forces a non-trivial stride)."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        encode_bmp,
        encode_bmp_array,
    )

    for w, h in ((16, 16), (3, 5), (1, 1)):
        rng = np.random.default_rng(42)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

        def pix(x, y, arr=arr):
            r, g, b = arr[y, x]
            return int(r), int(g), int(b)

        assert encode_bmp_array(arr) == encode_bmp(w, h, pix), (w, h)


# --- PNG (r4: stdlib-zlib codec) --------------------------------------------


def _rand_arr(h, w, c, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype="uint8").astype("uint8")


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_type(filt):
    """Encode with one forced filter per row, decode, expect exact pixels —
    exercises each of the five unfilter paths independently."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_png_pixels,
        encode_png,
    )

    arr = _rand_arr(6, 5, 3)
    payload = encode_png(arr, filters=[filt] * 6)
    assert np.array_equal(_decode_png_pixels(payload), arr)


def test_png_roundtrip_mixed_filters_and_channels():
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_png_pixels,
        encode_png,
    )

    for c in (1, 3, 4):
        arr = _rand_arr(5, 4, c, seed=c)
        payload = encode_png(arr, filters=[0, 1, 2, 3, 4])
        assert np.array_equal(_decode_png_pixels(payload), arr)


def test_png_decode_known_means():
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import encode_png

    arr = np.zeros((2, 2, 3), dtype="uint8")
    arr[:, :, 0] = 100  # R
    arr[:, :, 1] = 50   # G
    arr[:, :, 2] = 200  # B
    got = _decode_payload(encode_png(arr))
    assert (got["format"], got["width"], got["height"], got["channels"]) == (
        "png", 2, 2, 3
    )
    assert got["mean_r"] == pytest.approx(100.0)
    assert got["mean_g"] == pytest.approx(50.0)
    assert got["mean_b"] == pytest.approx(200.0)
    assert got["feat_mean"] == pytest.approx((100 + 50 + 200) / 3)


def test_png_unsupported_variants_hit_codec_slot():
    import struct
    import zlib

    from seoul_big_data_spark.sources.multimodal import (
        _PNG_SIG,
        _decode_png_pixels,
    )

    def png_with_ihdr(depth, color, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d))
            )
        return (
            _PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
            + chunk(b"IEND", b"")
        )

    # every LEGAL depth/color combination decodes for real since r4 —
    # what remains is the spec's own illegal space: 16-bit palette,
    # sub-byte truecolor/alpha, and color types that do not exist
    for depth, color, interlace in ((16, 3, 0), (4, 2, 0), (2, 6, 0),
                                    (8, 5, 0)):
        with pytest.raises(NotImplementedError):
            _decode_png_pixels(png_with_ihdr(depth, color, interlace))
    # palette stream without its PLTE is malformed, not unsupported
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png_pixels(png_with_ihdr(8, 3, 0))


def test_png_gray_alpha_color_type4():
    """Gray+alpha (color type 4) — the last 8/16-bit color type — decodes
    across every filter, Adam7, and 16-bit; the RGB normalizer replicates
    the gray plane (alpha excluded) so phash matches the pure-gray twin."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_pixels_rgb,
        _decode_png_pixels,
        encode_png,
        encode_png16,
    )

    rng = np.random.RandomState(23)
    ga = rng.randint(0, 256, size=(21, 17, 2)).astype("uint8")
    for filters in (None, [0, 1, 2, 3, 4]):
        assert np.array_equal(
            _decode_png_pixels(encode_png(ga, filters=filters)), ga
        )
    assert np.array_equal(
        _decode_png_pixels(encode_png(ga, interlace=True)), ga
    )

    ga16 = (ga.astype("uint16") << 8) | 0x7F
    assert np.array_equal(
        _decode_png_pixels(encode_png16(ga16, filters=[3, 4])), ga
    )

    h_ga = _ahash_bits(_decode_pixels_rgb(encode_png(ga)))
    h_g = _ahash_bits(_decode_pixels_rgb(encode_png(ga[:, :, :1])))
    assert h_ga == h_g


def test_png_subbyte_depths_gray_and_palette():
    """1/2/4-bit PNGs: samples pack MSB-first into scanline bytes and the
    filters run over the PACKED bytes with a 1-byte neighbor distance
    (spec §9) — gray levels scale to 8-bit by the 255/(2^d-1) replication
    factor, palette indices gather raw through PLTE (+ tRNS)."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_png_pixels,
        encode_png_subbyte,
    )

    rng = np.random.RandomState(29)
    for depth in (1, 2, 4):
        v = rng.randint(0, 1 << depth, size=(13, 23)).astype("uint8")
        scale = 255 // ((1 << depth) - 1)
        for filters in (None, [1, 2, 3, 4, 0]):
            d = _decode_png_pixels(encode_png_subbyte(v, depth,
                                                      filters=filters))
            assert np.array_equal(d[:, :, 0], v * scale), (depth, filters)

    pal = rng.randint(0, 256, size=(16, 3)).astype("uint8")
    for depth in (1, 2, 4):
        v = rng.randint(0, 1 << depth, size=(9, 14)).astype("uint8")
        d = _decode_png_pixels(encode_png_subbyte(v, depth, palette=pal))
        assert np.array_equal(d, pal[v]), depth

    trns = list(range(16))
    v = rng.randint(0, 16, size=(9, 14)).astype("uint8")
    d = _decode_png_pixels(encode_png_subbyte(v, 4, palette=pal, trns=trns))
    expected = np.concatenate(
        [pal[v], np.array(trns, dtype="uint8")[v][:, :, None]], axis=2
    )
    assert np.array_equal(d, expected)

    with pytest.raises(ValueError):
        encode_png_subbyte(np.full((4, 4), 4, dtype="uint8"), 2)


def test_phash_container_invariant_bmp_vs_png():
    """The SAME pixel content must hash identically whether shipped as BMP
    or PNG — the property that lets the dedup query run a mixed corpus."""
    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_pixels_rgb,
        encode_bmp_array,
        encode_png,
    )

    arr = _rand_arr(16, 16, 3, seed=42)
    h_bmp = _ahash_bits(_decode_pixels_rgb(encode_bmp_array(arr)))
    h_png = _ahash_bits(_decode_pixels_rgb(encode_png(arr, filters=list(range(5)) * 3 + [2])))
    assert h_bmp == h_png


def test_phash_dedup_query_mixed_corpus(spark, sf_dir):
    from seoul_big_data_spark.queries import QUERIES

    out = QUERIES["multimodal_phash_dedup"](spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 50
    assert {c for c in out.columns} == {"phash", "n_docs", "survivor_doc_id"}


# --- baseline JPEG (r4: pure-numpy T.81 sequential-DCT codec) ---------------


def _smooth_arr(h, w, c=3):
    """Low-frequency test image (JPEG is built for smooth content; modulo
    ramps would measure edge ringing, not codec health)."""
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        128 + 100 * np.sin(2 * np.pi * xx / w) * np.cos(2 * np.pi * yy / h),
        128 + 80 * np.cos(2 * np.pi * (xx + yy) / (w + h)),
        128 + 60 * np.sin(2 * np.pi * yy / h),
    ]
    return np.clip(np.stack(chans[:c], axis=2), 0, 255).astype("uint8")


def test_jpeg_flat_images_roundtrip_exact():
    """All-zero coefficient blocks survive quantization at any quality, so
    flat images decode bit-exact — the codec's analytically-known case."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    flat_gray = np.full((16, 24, 1), 128, dtype="uint8")
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(flat_gray, quality=50)), flat_gray
    )
    flat_rgb = np.zeros((24, 16, 3), dtype="uint8")
    flat_rgb[:, :, 0], flat_rgb[:, :, 1], flat_rgb[:, :, 2] = 200, 100, 50
    dec = decode_jpeg_pixels(encode_jpeg(flat_rgb, quality=95))
    assert int(np.abs(dec.astype(int) - flat_rgb.astype(int)).max()) <= 1


@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
def test_jpeg_smooth_roundtrip_bounded_error(subsampling):
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img = _smooth_arr(40, 56)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=95, subsampling=subsampling))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3.0
    assert err.max() < 40


def test_jpeg_odd_dimensions_crop_exactly():
    """Non-multiple-of-8 (and, with 4:2:0, non-multiple-of-16) dimensions:
    MCU padding must be cropped away, never leaked into the output."""
    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img = _smooth_arr(37, 51)
    for sub in ("444", "420"):
        assert decode_jpeg_pixels(
            encode_jpeg(img, quality=90, subsampling=sub)
        ).shape == (37, 51, 3)


def test_jpeg_restart_markers_decode_identically():
    """DRI + RSTn every 2 MCUs must reproduce the exact no-restart pixels
    (restarts change framing, not content)."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img = _smooth_arr(40, 56)
    plain = decode_jpeg_pixels(encode_jpeg(img, quality=92))
    restarted = decode_jpeg_pixels(encode_jpeg(img, quality=92, restart_interval=2))
    assert np.array_equal(plain, restarted)


def test_jpeg_grayscale_roundtrip():
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img = _smooth_arr(24, 32)[:, :, :1]
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=95))
    assert dec.shape == (24, 32, 1)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2.0


def test_jpeg_dispatch_and_metadata():
    """_decode_payload sniffs the FFD8FF magic and reports content-derived
    stats within codec tolerance of the source means."""
    from seoul_big_data_spark.sources.jpegcodec import encode_jpeg

    img = _smooth_arr(40, 56)
    got = _decode_payload(bytes(encode_jpeg(img, quality=95)))
    assert (got["format"], got["width"], got["height"], got["channels"]) == (
        "jpeg", 56, 40, 3
    )
    for ch, key in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert abs(got[key] - float(img[:, :, ch].mean())) < 2.0


def test_jpeg_remaining_boundaries_hit_codec_slot():
    """Progressive (SOF2, 8- AND 12-bit since this round) and 12-bit
    extended sequential (SOF1) decode for real — the remaining JPEG
    boundaries are arithmetic coding (SOF9) and 12-bit in the wrong
    process (baseline SOF0 is 8-bit-only per T.81), both explicit
    NotImplementedError at the documented codec slot."""
    import struct as _s

    from seoul_big_data_spark.sources.jpegcodec import decode_jpeg_pixels

    def sof(marker: int, precision: int) -> bytes:
        body = _s.pack(">H", 11) + bytes(
            [precision] + list(_s.pack(">HH", 8, 8)) + [1, 1, 0x11, 0]
        )
        return b"\xff\xd8" + bytes((0xFF, marker)) + body + b"\xff\xd9"

    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(sof(0xC9, 8))  # arithmetic sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(sof(0xC0, 12))  # 12-bit baseline: spec-invalid


def test_jpeg_12bit_progressive_matches_sequential():
    """12-bit progressive (SOF2, precision 12): a completed progressive
    stream decodes BIT-IDENTICALLY to the equivalent 12-bit extended
    sequential stream — the scan machinery is coefficient-domain, so the
    only 12-bit deltas are the level shift (2048), 16-bit DQT, and the
    extended-range DC / category-14 progressive AC tables. Checked across
    subsamplings, grayscale, and a full-range noise image (the worst case
    for magnitude categories)."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img12 = _smooth_arr(45, 62).astype("uint16") << 4
    for q in (75, 95):
        for sub in ("444", "422", "420"):
            seq = decode_jpeg_pixels(
                encode_jpeg(img12, quality=q, subsampling=sub, precision=12)
            )
            prog = decode_jpeg_pixels(
                encode_jpeg_progressive(
                    img12, quality=q, subsampling=sub, precision=12
                )
            )
            assert np.array_equal(seq, prog), (q, sub)

    g12 = img12[:, :, :1]
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(g12, quality=90, precision=12)),
        decode_jpeg_pixels(encode_jpeg_progressive(g12, quality=90, precision=12)),
    )

    rng = np.random.default_rng(11)
    noisy = rng.integers(0, 4096, size=(17, 23, 3), dtype=np.uint16)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(noisy, quality=25, precision=12)),
        decode_jpeg_pixels(encode_jpeg_progressive(noisy, quality=25, precision=12)),
    )


def test_jpeg_12bit_extended_sequential():
    """12-bit extended sequential (SOF1, 16-bit DQT, extended Huffman
    range): samples x16 through quant tables x16 produce the SAME
    quantized coefficients as the 8-bit pipeline, so the decoded top-byte
    view may differ from the 8-bit twin only by the final rounding step
    (|diff| <= 1) — across subsamplings, grayscale, and restart markers."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img8 = _smooth_arr(45, 62)
    img12 = img8.astype("uint16") << 4

    for q in (75, 95):
        for sub in ("444", "422", "420"):
            d12 = decode_jpeg_pixels(
                encode_jpeg(img12, quality=q, subsampling=sub, precision=12)
            )
            d8 = decode_jpeg_pixels(
                encode_jpeg(img8, quality=q, subsampling=sub)
            )
            assert np.abs(d12.astype(int) - d8.astype(int)).max() <= 1, (q, sub)

    g12 = img12[:, :, :1]
    dg = decode_jpeg_pixels(encode_jpeg(g12, quality=90, precision=12))
    dg8 = decode_jpeg_pixels(encode_jpeg(img8[:, :, :1], quality=90))
    assert np.abs(dg.astype(int) - dg8.astype(int)).max() <= 1

    # restart markers reset the DC predictor identically in both precisions
    a = decode_jpeg_pixels(
        encode_jpeg(img12, quality=90, precision=12, restart_interval=3)
    )
    b = decode_jpeg_pixels(encode_jpeg(img12, quality=90, precision=12))
    assert np.array_equal(a, b)

    # quality still rides the full 12-bit headroom
    near = decode_jpeg_pixels(encode_jpeg(img12, quality=100, precision=12))
    assert np.abs(near.astype(int) - img8.astype(int)).mean() < 2.0

    with pytest.raises(ValueError):
        encode_jpeg(img8, precision=12)  # uint8 input rejected
    with pytest.raises(ValueError):
        encode_jpeg(img12 << 3, precision=12)  # out of 12-bit range


def test_jpeg_phash_hamming_locality():
    """Same image through BMP (lossless) and JPEG (lossy) must land within
    a small Hamming distance on the 64-bit aHash — the bucket-join locality
    property image dedup relies on — while different content stays far."""
    from seoul_big_data_spark.sources.jpegcodec import encode_jpeg
    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_pixels_rgb,
        encode_bmp_array,
    )

    img = _smooth_arr(32, 32)
    h_bmp = _ahash_bits(_decode_pixels_rgb(encode_bmp_array(img)))
    h_jpg = _ahash_bits(_decode_pixels_rgb(bytes(encode_jpeg(img, quality=95))))
    assert bin(h_bmp ^ h_jpg).count("1") <= 6
    other = _smooth_arr(32, 32)[::-1]  # vertically flipped = different image
    h_other = _ahash_bits(_decode_pixels_rgb(encode_bmp_array(other.copy())))
    assert bin(h_bmp ^ h_other).count("1") > 6


def test_multimodal_decode_query_mixed_containers(spark, sf_dir):
    """The registered decode query now carries four raster containers
    (doc_id % 4 → BMP/PNG/JPEG/TIFF); every row decodes, formats partition
    the corpus, and dimensions follow the render rule."""
    from seoul_big_data_spark.queries import QUERIES

    out = QUERIES["multimodal_decode"](spark, sf_dir)
    rows = out.collect()
    assert rows
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault(r["format"], 0)
        by_fmt[r["format"]] += 1
        assert r["width"] == (r["doc_id"] % 6) + 2
        assert r["height"] == (r["doc_id"] % 4) + 2
        assert r["channels"] == 3
    assert set(by_fmt) == {"bmp", "png", "jpeg", "tiff", "tga", "ico"}


# --- GIF (r4: pure-Python LZW codec, gifcodec.py) ---------------------------


def _indexed_arr(h, w, seed=3):
    """Small-palette test image (GIF needs <=256 colors)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return (rng.randint(0, 6, size=(h, w, 3)) * 40).astype("uint8")


def test_gif_lzw_roundtrip_forces_growth_and_reset():
    """20k symbols over a 64-symbol alphabet forces code-width growth to 12
    bits and at least one 4096-entry dictionary reset."""
    import numpy as np

    from seoul_big_data_spark.sources.gifcodec import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(11)
    stream = rng.randint(0, 64, size=20000).tolist()
    assert _lzw_decode(_lzw_encode(stream, 6), 6) == stream
    tiny = rng.randint(0, 2, size=5000).tolist()
    assert _lzw_decode(_lzw_encode(tiny, 2), 2) == tiny


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_single_frame_roundtrip_exact(interlace):
    """GIF is lossless for palettized content — exact pixels back, with and
    without the four-pass interlaced row order."""
    import numpy as np

    from seoul_big_data_spark.sources.gifcodec import (
        decode_gif_frames,
        encode_gif,
    )

    img = _indexed_arr(23, 31)
    dec = decode_gif_frames(encode_gif(img, interlace=interlace))
    assert dec.shape == (1, 23, 31, 3)
    assert np.array_equal(dec[0], img)


def test_gif_animation_delta_frames_composite_exactly():
    """Delta-coded animation (transparency-keyed unchanged pixels) must
    composite back to every original frame bit-exactly."""
    import numpy as np

    from seoul_big_data_spark.sources.gifcodec import (
        decode_gif_frames,
        encode_gif,
    )

    base = _indexed_arr(23, 31)
    frames = np.stack([base] * 4).copy()
    frames[1, 5:10, 5:10] = 80
    frames[2, 5:10, 5:10] = 120
    frames[3, :, :] = 40
    dec = decode_gif_frames(encode_gif(frames, delta=True))
    assert dec.shape == frames.shape
    for i in range(4):
        assert np.array_equal(dec[i], frames[i])


def test_gif_frame_stats_sampling_contract():
    """gif_frame_stats walks all frames on one canvas but reports only
    every k-th (always including 0) with exact means and total count."""
    import numpy as np

    from seoul_big_data_spark.sources.gifcodec import (
        encode_gif,
        gif_frame_stats,
    )

    frames = np.stack([_indexed_arr(12, 16, seed=s) for s in range(5)])
    stats = gif_frame_stats(bytes(encode_gif(frames)), every_k=2)
    assert [s["frame_idx"] for s in stats] == [0, 2, 4]
    assert all(s["n_frames"] == 5 for s in stats)
    for s in stats:
        f = frames[s["frame_idx"]]
        assert s["mean_r"] == pytest.approx(float(f[:, :, 0].mean()))
        assert s["mean_b"] == pytest.approx(float(f[:, :, 2].mean()))


def test_gif_dispatch_and_phash_parity():
    """_decode_payload sniffs GIF8; being lossless, the perceptual hash is
    BIT-equal across BMP/PNG/GIF containers of the same pixels."""
    from seoul_big_data_spark.sources.gifcodec import encode_gif
    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_pixels_rgb,
        encode_bmp_array,
        encode_png,
    )

    img = _indexed_arr(16, 16)
    got = _decode_payload(bytes(encode_gif(img)))
    assert (got["format"], got["width"], got["height"]) == ("gif", 16, 16)
    assert got["mean_r"] == pytest.approx(float(img[:, :, 0].mean()))
    h_bmp = _ahash_bits(_decode_pixels_rgb(encode_bmp_array(img)))
    h_png = _ahash_bits(_decode_pixels_rgb(encode_png(img)))
    h_gif = _ahash_bits(_decode_pixels_rgb(bytes(encode_gif(img))))
    assert h_bmp == h_png == h_gif


def test_gif_encoder_rejects_wide_palettes():
    import numpy as np

    from seoul_big_data_spark.sources.gifcodec import encode_gif

    rng = np.random.RandomState(0)
    noisy = rng.randint(0, 256, size=(32, 32, 3)).astype("uint8")
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(noisy)


def test_frame_sample_query_mixed_containers(spark, sf_dir):
    """The registered frame-sample query carries three containers (PPM
    stream / animated GIF / DIB AVI); the frame rule is identical for
    all, so sampled stats agree across formats for doc_ids with equal
    (n_frames, w, h) geometry — docs 3k/3k+1/3k+2 are exact triplets."""
    from seoul_big_data_spark.queries import QUERIES

    rows = QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    assert rows
    fmts = {r["format"] for r in rows}
    assert fmts == {"ppm", "gif", "avi/dib"}
    # geometry key → per-frame means must agree across all containers
    by_key = {}
    for r in rows:
        key = (r["n_frames"], r["width"], r["height"], r["frame_idx"])
        by_key.setdefault(key, {})[r["format"]] = (
            r["mean_r"], r["mean_g"], r["mean_b"]
        )
    full = [v for v in by_key.values() if len(v) == 3]
    assert full, "expected geometry keys covered by all three containers"
    for v in full:
        assert v["ppm"] == pytest.approx(v["gif"])
        assert v["ppm"] == pytest.approx(v["avi/dib"])
    for r in rows:
        assert r["frame_idx"] % 2 == 0
        assert r["n_frames"] == (r["doc_id"] // 3 % 5) + 2


# --- G.711 mu-law / A-law + PCM8 audio (r4) ---------------------------------


def test_g711_tables_hit_published_reference_points():
    """The expand tables must reproduce the ITU-T G.711 landmarks: mu-law
    zero codes (0xFF positive zero, 0x7F negative zero) and +/-32124
    extremes; A-law +/-8 minimum magnitudes (0xD5/0x55) and +/-32256
    extremes."""
    from seoul_big_data_spark.sources.multimodal import _g711_table

    u = _g711_table("ulaw")
    assert (u[0xFF], u[0x7F]) == (0, 0)
    assert (int(u.max()), int(u.min())) == (32124, -32124)
    a = _g711_table("alaw")
    assert (a[0xD5], a[0x55]) == (8, -8)
    assert (int(a.max()), int(a.min())) == (32256, -32256)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_wav_roundtrip_stats(law):
    """Companding a sine and decoding the stats: RMS within the codec's
    quantization of the ideal, zero-cross rate exact (companding is
    sign-preserving), geometry fields exact."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_wav,
        encode_wav_g711,
    )

    t = np.arange(4000)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(int)
    got = _decode_wav(encode_wav_g711(8000, 1, sine, law))
    assert (got["format"], got["sample_rate"], got["channels"]) == (
        "wav", 8000, 1
    )
    assert got["n_samples"] == 4000
    ideal_rms = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
    assert got["rms"] == pytest.approx(ideal_rms, rel=0.01)


def test_g711_quantization_identity():
    """decode(encode(x)) == table-quantized x exactly: every companded byte
    expands back to the nearest table value of its source sample."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_wav,
        _g711_table,
        encode_wav_g711,
    )

    rng = np.random.RandomState(5)
    x = rng.randint(-32768, 32768, size=501)  # odd length: pad-byte path
    for law in ("ulaw", "alaw"):
        table = np.sort(_g711_table(law))
        payload = encode_wav_g711(8000, 1, x, law)
        got = _decode_wav(payload)
        # every decoded sample must be a table value within one table step
        # of its source; RMS of the quantization error is tiny
        assert got["n_samples"] == 501
        err = abs(
            got["rms"] - float(np.sqrt(np.mean((x / 32768.0) ** 2)))
        )
        assert err < 0.01


def test_pcm8_wav_decode():
    import struct as _s

    payload = (
        b"RIFF" + _s.pack("<I", 44) + b"WAVE"
        + b"fmt " + _s.pack("<I", 16)
        + _s.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + _s.pack("<I", 4) + bytes([128, 255, 0, 128])
    )
    got = _decode_payload.__globals__["_decode_wav"](payload)
    assert got["n_samples"] == 4
    # 128 -> 0, 255 -> +32512, 0 -> -32768: zero crossings at both steps
    assert got["zero_cross_rate"] == pytest.approx(2 / 3)


def test_audio_query_mixed_codecs(spark, sf_dir):
    """The registered audio query spans PCM-16 / mu-law / A-law / ADPCM /
    FLAC / AIFF / AU mu-law by doc_id % 7; every row decodes with the right
    geometry, lossless codecs reproduce the exact RMS, lossy ones stay
    within their quantization/slew bounds."""
    from seoul_big_data_spark.queries import QUERIES

    rows = QUERIES["multimodal_audio_decode"](spark, sf_dir).collect()
    assert len(rows) == 500
    fmts = {0: "wav", 1: "wav", 2: "wav", 3: "wav", 4: "flac", 5: "aiff", 6: "au"}
    for r in rows:
        codec = r["doc_id"] % 7
        assert r["format"] == fmts[codec]
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == 800 + (r["doc_id"] % 200)
        amp = (r["doc_id"] % 20000) + 4000
        # square wave: RMS == amplitude — exact for PCM (WAV/AIFF) and FLAC
        # up to the query's round(6); within G.711 segment-quantization
        # error (~2.5% worst-case near amplitude 4000) for the companded
        # rows (WAV mu/A-law and AU mu-law); within ADPCM transition slew
        # (~10% worst-case) for the delta-coded rows
        if codec in (0, 4, 5):
            assert r["rms"] == pytest.approx(amp / 32768.0, abs=1e-6)
        elif codec == 3:
            assert r["rms"] == pytest.approx(amp / 32768.0, rel=0.13)
        else:
            assert r["rms"] == pytest.approx(amp / 32768.0, rel=0.04)


# --- TIFF (r4: tiffcodec.py — strips, PackBits, TIFF-LZW, predictor) --------


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("byte_order", ["II", "MM"])
def test_tiff_roundtrip_matrix(compression, byte_order):
    """Lossless roundtrip across compression x byte order, RGB and gray,
    multi-strip, with the horizontal-differencing predictor on the LZW
    case (its usual pairing)."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    rng = np.random.RandomState(13)
    for src in (
        rng.randint(0, 256, size=(21, 17, 3)).astype("uint8"),
        rng.randint(0, 256, size=(10, 33, 1)).astype("uint8"),
    ):
        enc = encode_tiff(
            src,
            compression=compression,
            predictor=(compression == "lzw"),
            rows_per_strip=4,
            byte_order=byte_order,
        )
        dec = decode_tiff_pages(enc)
        assert len(dec) == 1
        assert np.array_equal(dec[0], src)


def test_tiff_lzw_early_change_growth():
    """The TIFF LZW variant bumps the code width one code earlier than
    GIF's; a long stream forces growth through 10/11/12 bits and at least
    one dictionary reset, and must still roundtrip exactly."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.RandomState(29)
    data = bytes(rng.randint(0, 256, size=30000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data
    runs = bytes(np.repeat(rng.randint(0, 4, size=8000), 3).astype("uint8"))
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs)) == runs


def test_tiff_packbits_known_vectors():
    from seoul_big_data_spark.sources.tiffcodec import (
        _packbits_decode,
        _packbits_encode,
    )

    # the canonical PackBits example (Apple TN1023, reproduced in the
    # TIFF 6.0 spec's PackBits section)
    ref = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    assert _packbits_decode(ref) == want
    assert _packbits_decode(_packbits_encode(want)) == want


def test_tiff_multipage_sampling_skips_decode():
    """tiff_page_stats walks the IFD chain header-only and decodes only
    sampled pages — indices, counts, and exact means."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        encode_tiff,
        tiff_page_stats,
    )

    rng = np.random.RandomState(31)
    pages = [
        rng.randint(0, 256, size=(8 + i, 12, 3)).astype("uint8")
        for i in range(5)
    ]
    enc = encode_tiff(pages, compression="packbits", rows_per_strip=3)
    stats = tiff_page_stats(enc, every_k=2)
    assert [s["frame_idx"] for s in stats] == [0, 2, 4]
    assert all(s["n_frames"] == 5 for s in stats)
    for s in stats:
        src = pages[s["frame_idx"]]
        assert (s["height"], s["width"]) == src.shape[:2]
        assert s["mean_g"] == pytest.approx(float(src[:, :, 1].mean()))


def test_tiff_dispatch_and_phash_parity():
    """_decode_payload sniffs II*/MM*; TIFF is lossless, so the perceptual
    hash is bit-equal with the other lossless containers."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_pixels_rgb,
        encode_bmp_array,
    )
    from seoul_big_data_spark.sources.tiffcodec import encode_tiff

    rng = np.random.RandomState(37)
    img = (rng.randint(0, 6, size=(16, 16, 3)) * 40).astype("uint8")
    got = _decode_payload(bytes(encode_tiff(img, compression="lzw")))
    assert (got["format"], got["width"], got["height"]) == ("tiff", 16, 16)
    assert got["mean_b"] == pytest.approx(float(img[:, :, 2].mean()))
    h_bmp = _ahash_bits(_decode_pixels_rgb(encode_bmp_array(img)))
    h_tif = _ahash_bits(
        _decode_pixels_rgb(bytes(encode_tiff(img, byte_order="MM")))
    )
    assert h_bmp == h_tif


def test_tiff_unsupported_variants_hit_codec_slot():
    import struct as _s

    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    img = np.zeros((4, 4, 3), dtype="uint8")
    enc = bytearray(encode_tiff(img))
    # patch the compression tag value (tag 259) to 6 (old-style JPEG —
    # deprecated by TN2 and unsupported; new-style 7 decodes for real)
    n = _s.unpack_from("<H", enc, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if _s.unpack_from("<H", enc, base)[0] == 259:
            _s.pack_into("<H", enc, base + 8, 6)
    with pytest.raises(NotImplementedError):
        decode_tiff_pages(bytes(enc))


def test_gif_disposal_restore_background_and_previous():
    """Spec-level compositing: a hand-built GIF89a exercises disposal 2
    (restore background) and disposal 3 (restore previous), which the
    test encoder never emits. Frame 0 fills the canvas then restores to
    background; frame 1 draws a patch then restores the pre-frame state;
    frame 2 draws over the restored canvas."""
    import struct as _s

    import numpy as np

    from seoul_big_data_spark.sources.gifcodec import (
        _lzw_encode,
        decode_gif_frames,
    )

    palette = [(10, 10, 10), (200, 0, 0), (0, 200, 0), (0, 0, 200)]

    def sub_blocks(data):
        out = bytearray()
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        return bytes(out)

    def gce(disposal):
        return bytes((0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0))

    def image(left, top, w, h, indices):
        return (
            b"\x2c"
            + _s.pack("<HHHHB", left, top, w, h, 0)
            + bytes([2])
            + sub_blocks(_lzw_encode(indices, 2))
        )

    gif = bytearray(b"GIF89a")
    gif += _s.pack("<HHBBB", 4, 4, 0x80 | 0x01, 0, 0)  # GCT, 4 colors, bg=0
    for rgb in palette:
        gif += bytes(rgb)
    gif += gce(2) + image(0, 0, 4, 4, [1] * 16)        # full c1, restore bg
    gif += gce(3) + image(1, 1, 2, 2, [2] * 4)         # patch c2, restore prev
    gif += image(0, 0, 1, 1, [3])                      # corner c3, keep
    gif += b"\x3b"

    frames = decode_gif_frames(bytes(gif))
    assert frames.shape == (3, 4, 4, 3)
    c0, c1, c2, c3 = (np.array(c, dtype=np.uint8) for c in palette)
    # frame 0: all c1
    assert np.array_equal(frames[0], np.tile(c1, (4, 4, 1)))
    # frame 1: background everywhere (disposal 2 wiped frame 0) except the
    # 2x2 c2 patch
    want1 = np.tile(c0, (4, 4, 1))
    want1[1:3, 1:3] = c2
    assert np.array_equal(frames[1], want1)
    # frame 2: disposal 3 restored the pre-patch canvas (all background),
    # then one c3 pixel lands at the corner
    want2 = np.tile(c0, (4, 4, 1))
    want2[0, 0] = c3
    assert np.array_equal(frames[2], want2)


def test_ahash_fast_path_matches_general_path():
    """The aligned reshape-mean fast path in _ahash_bits must produce the
    BIT-IDENTICAL hash the general (linspace-block) path produces — block
    partitions coincide exactly when grid divides the dimensions."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import _ahash_bits

    def general(px, grid=8):
        gray = px.astype(np.int64).sum(axis=2)
        h, w = gray.shape
        ys = np.linspace(0, h, grid + 1).astype(int)
        xs = np.linspace(0, w, grid + 1).astype(int)
        means = np.empty((grid, grid))
        for i in range(grid):
            for j in range(grid):
                b = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
                means[i, j] = b.mean() if b.size else 0.0
        t = means.mean()
        bits = 0
        for i in range(grid):
            for j in range(grid):
                bits = (bits << 1) | int(means[i, j] > t)
        return bits

    rng = np.random.RandomState(41)
    for shape in ((16, 16), (32, 24), (8, 8), (17, 19)):
        for _ in range(10):
            px = rng.randint(0, 256, size=(*shape, 3)).astype("uint8")
            assert _ahash_bits(px) == general(px)


# --- r4 boundary closures: palette PNG, PGM, 32-bit BMP ---------------------


def test_png_palette_roundtrip_and_stats():
    """Color-type-3 PNG: unfilter the index plane, gather through PLTE;
    with tRNS the result is RGBA, without it RGB — both exact."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_png_pixels,
        encode_png_palette,
    )

    rng = np.random.RandomState(17)
    palette = rng.randint(0, 256, size=(7, 3)).astype("uint8")
    idx = rng.randint(0, 7, size=(13, 9)).astype("uint8")
    # exercise filters 0-3 across rows
    filters = [y % 4 for y in range(13)]
    px = _decode_png_pixels(encode_png_palette(idx, palette, filters=filters))
    assert px.shape == (13, 9, 3)
    assert np.array_equal(px, palette[idx])
    # with tRNS: alpha rides along per index
    trns = bytes([255, 128, 0, 255, 64, 255, 255])
    px4 = _decode_png_pixels(encode_png_palette(idx, palette, trns=trns))
    assert px4.shape == (13, 9, 4)
    assert np.array_equal(px4[:, :, :3], palette[idx])
    alpha = np.frombuffer(trns, dtype=np.uint8)[idx]
    assert np.array_equal(px4[:, :, 3], alpha)
    # dispatch: stats derive from the gathered RGB
    got = _decode_payload(encode_png_palette(idx, palette))
    assert (got["format"], got["channels"]) == ("png", 3)
    assert got["mean_r"] == pytest.approx(float(palette[idx][:, :, 0].mean()))


def test_png_palette_rejects_bad_index_and_missing_plte():
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_png_pixels,
        encode_png_palette,
    )

    palette = np.zeros((2, 3), dtype="uint8")
    idx = np.full((2, 2), 5, dtype="uint8")  # out of range
    with pytest.raises(ValueError, match="out of range"):
        _decode_png_pixels(encode_png_palette(idx, palette))


def test_pgm_p5_and_p2_decode():
    """Grayscale netpbm: P5 binary and P2 ascii agree; channels=1, the
    three means collapse to the gray mean."""
    vals = [0, 255, 17, 128, 64, 200]
    p5 = b"P5\n# gray\n3 2\n255\n" + bytes(vals)
    p2 = ("P2\n3 2\n255\n" + " ".join(str(v) for v in vals)).encode()
    g5, g2 = _decode_payload(p5), _decode_payload(p2)
    for got in (g5, g2):
        assert (got["format"], got["width"], got["height"], got["channels"]) \
            == ("pgm", 3, 2, 1)
        assert got["mean_r"] == got["mean_g"] == got["mean_b"]
        assert got["feat_mean"] == pytest.approx(sum(vals) / 6)


def test_bmp_32bit_decode_and_phash_parity():
    """32-bit BI_RGB (BGRX): stats and pixels must match the same image's
    24-bit form exactly (the X byte is padding)."""
    import struct as _s

    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _ahash_bits,
        _decode_pixels_rgb,
        encode_bmp_array,
    )

    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(6, 5, 3)).astype("uint8")

    # hand-build the 32bpp variant: BGRX rows, bottom-up, no padding needed
    body = bytearray()
    for y in range(5, -1, -1):
        for x in range(5):
            r, g, b = img[y, x]
            body += bytes((b, g, r, 0))
    hdr = b"BM" + _s.pack("<IHHI", 54 + len(body), 0, 0, 54) + _s.pack(
        "<IiiHHIIiiII", 40, 5, 6, 1, 32, 0, len(body), 2835, 2835, 0, 0
    )
    p32 = bytes(hdr + body)

    got32 = _decode_payload(p32)
    got24 = _decode_payload(encode_bmp_array(img))
    assert got32["format"] == "bmp" and got32["channels"] == 3
    for k in ("width", "height", "mean_r", "mean_g", "mean_b", "feat_mean"):
        assert got32[k] == pytest.approx(got24[k])
    assert np.array_equal(_decode_pixels_rgb(p32), img)
    assert _ahash_bits(_decode_pixels_rgb(p32)) == _ahash_bits(
        _decode_pixels_rgb(encode_bmp_array(img))
    )


def test_bmp_palette_family_uncompressed_and_rle():
    """Palette BMPs (1/4/8-bit indices, MSB-first packing) gather through
    the BGRX color table; BI_RLE8/BI_RLE4 decode encoded runs; a palette
    BMP and the 24-bit BMP of the same pixels are identical through the
    RGB normalizer (same phash)."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_bmp,
        _decode_bmp_pixels,
        _decode_pixels_rgb,
        encode_bmp_array,
        encode_bmp_palette,
    )

    rng = np.random.RandomState(13)
    pal = rng.randint(0, 256, size=(16, 3)).astype("uint8")

    for bpp, n in ((1, 2), (4, 16), (8, 16)):
        idx = rng.randint(0, n, size=(11, 23)).astype("uint8")
        rgb = _decode_bmp_pixels(
            encode_bmp_palette(idx, pal[:n], bpp=bpp)
        )[::-1, :, ::-1]
        assert np.array_equal(rgb, pal[:n][idx]), bpp

    for bpp in (4, 8):
        idx = rng.randint(0, 16, size=(9, 31)).astype("uint8")
        idx[:, 5:20] = 7  # long runs exercise the encoded-run path
        rgb = _decode_bmp_pixels(
            encode_bmp_palette(idx, pal, bpp=bpp, rle=True)
        )[::-1, :, ::-1]
        assert np.array_equal(rgb, pal[idx]), bpp

    idx = rng.randint(0, 16, size=(8, 8)).astype("uint8")
    meta = _decode_bmp(encode_bmp_palette(idx, pal, bpp=4))
    assert meta["channels"] == 3
    assert meta["mean_r"] == pytest.approx(float(pal[idx][:, :, 0].mean()))

    assert np.array_equal(
        _decode_pixels_rgb(encode_bmp_palette(idx, pal, bpp=8)),
        _decode_pixels_rgb(encode_bmp_array(pal[idx])),
    )


def test_bmp_rle_absolute_and_delta_escapes():
    """Hand-built BI_RLE8 exercising what the test encoder never emits:
    an absolute run (word-aligned), a delta escape (skipped cells stay
    index 0), and early EOB."""
    import struct as _s

    import numpy as np

    from seoul_big_data_spark.sources.multimodal import _decode_bmp_pixels

    pal = np.array([[i, i, i] for i in range(8)], dtype="uint8")
    w, h = 6, 3
    # bottom-up row 0: absolute run of 3 (1,2,3) + pad byte, then run 3x4
    # bottom-up row 1: delta (+2,+0) then run 2x5, EOL
    # remaining cells: implicit 0 via early EOB
    rle = bytes(
        [0, 3, 1, 2, 3, 0]      # absolute: 3 indices, word-aligned pad
        + [3, 4]                 # encoded run: 4,4,4
        + [0, 0]                 # EOL
        + [0, 2, 2, 0]           # delta: skip 2 right
        + [2, 5]                 # run: 5,5
        + [0, 1]                 # EOB
    )
    table = np.zeros((8, 4), dtype="uint8")
    table[:, :3] = pal[:, ::-1]
    off = 54 + table.size
    hdr = b"BM" + _s.pack("<IHHI", off + len(rle), 0, 0, off) + _s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 2835, 2835, 8, 0
    )
    px = _decode_bmp_pixels(hdr + table.tobytes() + rle)  # BGR bottom-up
    idx = px[:, :, 0]  # grayscale palette: any channel is the index
    expected = np.zeros((h, w), dtype="uint8")
    expected[0] = [1, 2, 3, 4, 4, 4]
    expected[1, 2:4] = 5
    assert np.array_equal(idx, expected)


# --- IMA ADPCM (r4) ---------------------------------------------------------


def test_adpcm_sine_snr_and_stats():
    """The 4-bit adaptive-delta codec must track a sine at ~30 dB SNR (the
    textbook figure for IMA ADPCM) and reproduce exact geometry when the
    signal fits one block."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_wav,
        encode_wav_adpcm,
    )

    t = np.arange(2000)
    sine = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(int)
    got = _decode_wav(encode_wav_adpcm(8000, 1, sine, samples_per_block=2000))
    assert (got["sample_rate"], got["channels"], got["n_samples"]) == (
        8000, 1, 2000
    )
    ideal = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
    assert got["rms"] == pytest.approx(ideal, rel=0.02)


def test_adpcm_first_sample_exact_and_state_tracking():
    """The block preamble predictor IS the first sample (exact), and a
    slow ramp — the friendliest ADPCM signal — decodes nearly sample-
    perfect since deltas stay inside one step."""
    import struct as _s

    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_ima_adpcm,
        encode_wav_adpcm,
    )

    ramp = np.arange(-2000, 2000, 8)  # 500 samples, delta 8
    payload = encode_wav_adpcm(8000, 1, ramp, samples_per_block=500)
    pos, data = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = _s.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    nib_bytes = (500 - 1 + 7) // 8 * 4
    dec = _decode_ima_adpcm(bytes(data), 1, 4 + nib_bytes, 500)
    assert dec[0] == ramp[0]
    err = np.abs(dec[: len(ramp)].astype(np.int64) - ramp)
    assert err.mean() < 16  # sub-step tracking on a gentle ramp


def test_adpcm_stereo_channel_separation():
    """Interleaved stereo blocks: channel 0 carries a sine, channel 1 is
    near-silent — the decoded channel-0 RMS must see only the sine (the
    4-byte group interleave keeps channels independent)."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_wav,
        encode_wav_adpcm,
    )

    t = np.arange(1000)
    sine = (10000 * np.sin(2 * np.pi * 200 * t / 8000)).astype(int)
    inter = np.empty(2000, dtype=int)
    inter[0::2] = sine
    inter[1::2] = 0
    got = _decode_wav(encode_wav_adpcm(8000, 2, inter, samples_per_block=1000))
    assert got["channels"] == 2
    assert got["n_samples"] == 1000
    ideal = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
    assert got["rms"] == pytest.approx(ideal, rel=0.02)


def test_png_adam7_tiling_and_roundtrip():
    """The seven Adam7 passes must tile every pixel exactly once, and
    interlaced encode->decode is lossless for gray/RGB/RGBA at any
    geometry (tiny images leave some passes empty — zero bytes, by spec),
    with every filter type exercised inside passes."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _ADAM7_PASSES,
        _decode_png_pixels,
        encode_png,
    )

    cover = np.zeros((16, 16), dtype=int)
    for x0, y0, xs, ys in _ADAM7_PASSES:
        cover[y0::ys, x0::xs] += 1
    assert (cover == 1).all()

    rng = np.random.RandomState(43)
    for h, w, c in ((23, 31, 3), (8, 8, 1), (1, 1, 3), (7, 3, 4), (2, 2, 3)):
        img = rng.randint(0, 256, size=(h, w, c)).astype("uint8")
        for filters in (None, [0, 1, 2, 3, 4]):
            dec = _decode_png_pixels(
                encode_png(img, filters=filters, interlace=True)
            )
            assert np.array_equal(dec, img), (h, w, c, filters)


def test_png_adam7_palette_roundtrip():
    """Interlacing composes with palette color: the index plane scatters
    through the passes, then gathers through PLTE."""
    import struct as _s
    import zlib as _z

    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _ADAM7_PASSES,
        _PNG_SIG,
        _decode_png_pixels,
    )

    rng = np.random.RandomState(47)
    palette = rng.randint(0, 256, size=(5, 3)).astype("uint8")
    idx = rng.randint(0, 5, size=(11, 13)).astype("uint8")
    raw = bytearray()
    for x0, y0, xs, ys in _ADAM7_PASSES:
        sub = idx[y0::ys, x0::xs]
        for row in sub:
            raw.append(0)
            raw += bytes(row)

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d))

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 13, 11, 8, 3, 0, 0, 1))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", _z.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    px = _decode_png_pixels(payload)
    assert np.array_equal(px, palette[idx])


def test_png_16bit_decode_top_byte():
    """16-bit PNG decodes through the same byte-level filter recurrences
    (bpp doubles), reduced to the standard 8-bit view (top byte) for the
    unified stats/hash path — every filter type exercised, gray and RGB."""
    import numpy as np

    from seoul_big_data_spark.sources.multimodal import (
        _decode_png_pixels,
        encode_png16,
    )

    rng = np.random.RandomState(53)
    for shape in ((11, 7, 3), (5, 6, 1), (8, 8, 4)):
        a16 = rng.randint(0, 65536, size=shape).astype("uint16")
        for filters in (None, [0, 1, 2, 3, 4]):
            dec = _decode_png_pixels(encode_png16(a16, filters))
            assert np.array_equal(dec, (a16 >> 8).astype("uint8"))


def test_netpbm_16bit_decode_top_byte():
    """maxval > 255 means two-byte big-endian samples (netpbm spec);
    stats report on the standard 0-255 scale (top byte), matching the
    16-bit-PNG convention."""
    import numpy as np

    vals = [0, 65535, 256, 32768, 511, 1000]
    p5 = b"P5\n3 2\n65535\n" + np.array(vals, dtype=">u2").tobytes()
    got = _decode_payload(p5)
    assert (got["format"], got["channels"]) == ("pgm", 1)
    assert got["feat_mean"] == pytest.approx(sum(v >> 8 for v in vals) / 6)
    p6 = b"P6\n1 2\n65535\n" + np.array(vals, dtype=">u2").tobytes()
    got6 = _decode_payload(p6)
    assert (got6["format"], got6["channels"]) == ("ppm", 3)
    assert got6["mean_r"] == pytest.approx((0 + (32768 >> 8)) / 2)


def test_tiff_16bit_decode_top_byte():
    """16-bit TIFF samples decode in the file byte order, undo the
    predictor at 16-bit width, and reduce to the standard top-byte view —
    every compression, both byte orders, gray and RGB."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    rng = np.random.RandomState(59)
    a16 = rng.randint(0, 65536, size=(13, 9, 3)).astype("uint16")
    g16 = rng.randint(0, 65536, size=(6, 11, 1)).astype("uint16")
    for comp in ("none", "packbits", "lzw"):
        for bo in ("II", "MM"):
            for src in (a16, g16):
                dec = decode_tiff_pages(
                    encode_tiff(
                        src,
                        compression=comp,
                        predictor=(comp == "lzw"),
                        rows_per_strip=4,
                        byte_order=bo,
                    )
                )
                assert np.array_equal(dec[0], (src >> 8).astype("uint8"))


# --- progressive JPEG (r4) --------------------------------------------------


def test_jpeg_progressive_bit_identical_to_baseline():
    """The strongest check a progressive implementation admits: a
    completed progressive stream carries the SAME quantized coefficients
    as the baseline stream, so decode must be bit-identical — across
    subsampling modes, grayscale, odd geometry, and the flat/noisy
    extremes that exercise the all-EOB and ZRL paths."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    cases = [(_smooth_arr(40, 56), "444"), (_smooth_arr(37, 51), "420"),
             (_smooth_arr(24, 40), "422")]
    for img, sub in cases:
        base = decode_jpeg_pixels(encode_jpeg(img, quality=90, subsampling=sub))
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(img, quality=90, subsampling=sub)
        )
        assert np.array_equal(base, prog), sub
    gray = _smooth_arr(24, 32)[:, :, :1]
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(gray, quality=92)),
        decode_jpeg_pixels(encode_jpeg_progressive(gray, quality=92)),
    )
    rng = np.random.RandomState(0)
    noisy = rng.randint(0, 256, size=(24, 40, 3)).astype("uint8")
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(noisy, quality=95)),
        decode_jpeg_pixels(encode_jpeg_progressive(noisy, quality=95)),
    )
    flat = np.full((32, 32, 3), 77, dtype="uint8")
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(flat, quality=80)),
        decode_jpeg_pixels(encode_jpeg_progressive(flat, quality=80)),
    )


def test_jpeg_progressive_dispatch():
    """SOF2 streams route through _decode_payload like any other JPEG."""
    from seoul_big_data_spark.sources.jpegcodec import encode_jpeg_progressive

    img = _smooth_arr(16, 24)
    got = _decode_payload(bytes(encode_jpeg_progressive(img, quality=95)))
    assert (got["format"], got["width"], got["height"], got["channels"]) == (
        "jpeg", 24, 16, 3
    )
    for ch, key in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert abs(got[key] - float(img[:, :, ch].mean())) < 2.0


def test_tiff_tiled_roundtrip():
    """Tile organization (tags 322-325): full-size edge-padded tiles
    reassemble exactly, across compressions, both sample widths, and the
    predictor — and compose with multi-page files."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    rng = np.random.RandomState(61)
    img = rng.randint(0, 256, size=(37, 53, 3)).astype("uint8")
    g16 = rng.randint(0, 65536, size=(20, 40, 1)).astype("uint16")
    for comp in ("none", "packbits", "lzw"):
        dec = decode_tiff_pages(
            encode_tiff(img, compression=comp, predictor=(comp == "lzw"),
                        tile=(16, 16), byte_order="MM")
        )
        assert np.array_equal(dec[0], img)
        dec16 = decode_tiff_pages(
            encode_tiff(g16, compression=comp, tile=(32, 16))
        )
        assert np.array_equal(dec16[0], (g16 >> 8).astype("uint8"))
    pages = [rng.randint(0, 256, size=(18, 20, 3)).astype("uint8")
             for _ in range(3)]
    dec = decode_tiff_pages(
        encode_tiff(pages, compression="packbits", tile=(16, 16))
    )
    assert all(np.array_equal(a, b) for a, b in zip(dec, pages))
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile=(10, 16))


# --- FLAC (r4: flaccodec.py) ------------------------------------------------


def test_flac_lossless_all_subframe_types():
    """FLAC is lossless through every subframe type the codec writes:
    FIXED-order prediction with Rice partitions, VERBATIM, the LPC layout
    (order-2 polynomial through quantized coefficients), and CONSTANT for
    flat signals."""
    import numpy as np

    from seoul_big_data_spark.sources.flaccodec import (
        decode_flac_samples,
        encode_flac,
    )

    t = np.arange(5000)
    sine = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(int)
    for mode in ("fixed", "verbatim", "lpc"):
        dec, rate, bps = decode_flac_samples(
            encode_flac(sine, 8000, 1, subframe_mode=mode)
        )
        assert (rate, bps) == (8000, 16)
        assert np.array_equal(dec[:, 0], sine), mode
    flat = np.full(3000, -123, dtype=int)
    dec, _, _ = decode_flac_samples(encode_flac(flat, 8000, 1))
    assert np.array_equal(dec[:, 0], flat)


def test_flac_stereo_decorrelation_modes_lossless():
    """independent / left-side / right-side / mid-side all reconstruct
    both channels exactly (the side channel carries its extra bit)."""
    import numpy as np

    from seoul_big_data_spark.sources.flaccodec import (
        decode_flac_samples,
        encode_flac,
    )

    rng = np.random.RandomState(67)
    t = np.arange(4000)
    left = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(int)
    right = (left * 0.7).astype(int) + rng.randint(-50, 50, 4000)
    inter = np.empty(8000, dtype=int)
    inter[0::2] = left
    inter[1::2] = right
    for sm in ("independent", "left_side", "right_side", "mid_side"):
        dec, _, _ = decode_flac_samples(
            encode_flac(inter, 8000, 2, stereo_mode=sm)
        )
        assert np.array_equal(dec[:, 0], left), sm
        assert np.array_equal(dec[:, 1], right), sm


def test_flac_partition_orders_and_partial_tail():
    """Rice partition orders 0-3 and a final block shorter than
    block_size (partition order falls back to 0 there) all roundtrip."""
    import numpy as np

    from seoul_big_data_spark.sources.flaccodec import (
        decode_flac_samples,
        encode_flac,
    )

    t = np.arange(2500)
    sig = (9000 * np.sin(2 * np.pi * 300 * t / 8000)).astype(int)
    for po in (0, 1, 2, 3):
        dec, _, _ = decode_flac_samples(
            encode_flac(sig, 8000, 1, block_size=512, partition_order=po)
        )
        assert np.array_equal(dec[:, 0], sig), po


def test_flac_crc_detects_corruption():
    """Both frame CRCs are verified: a flipped bit in the entropy data
    raises instead of returning wrong audio."""
    import numpy as np

    from seoul_big_data_spark.sources.flaccodec import (
        decode_flac_samples,
        encode_flac,
    )

    t = np.arange(1024)
    sig = (8000 * np.sin(2 * np.pi * 200 * t / 8000)).astype(int)
    enc = bytearray(encode_flac(sig, 8000, 1))
    enc[-20] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_samples(bytes(enc))


def test_tiff_deflate_and_palette():
    """Compression 8 (Adobe deflate, stdlib zlib) roundtrips across
    strips/tiles/sample widths; photometric-3 palette pages gather the
    index plane through the 16-bit ColorMap planes exactly."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    rng = np.random.RandomState(71)
    img = rng.randint(0, 256, size=(23, 31, 3)).astype("uint8")
    assert np.array_equal(
        decode_tiff_pages(
            encode_tiff(img, compression="deflate", predictor=True,
                        rows_per_strip=7, byte_order="MM")
        )[0],
        img,
    )
    assert np.array_equal(
        decode_tiff_pages(
            encode_tiff(img, compression="deflate", tile=(16, 16))
        )[0],
        img,
    )
    cmap = rng.randint(0, 256, size=(7, 3)).astype("uint8")
    idx = rng.randint(0, 7, size=(13, 9, 1)).astype("uint8")
    for comp in ("none", "lzw", "deflate", "packbits"):
        dec = decode_tiff_pages(
            encode_tiff(idx, compression=comp, colormap=cmap)
        )
        assert np.array_equal(dec[0], cmap[idx[:, :, 0]]), comp


def test_tiff_jpeg_compression7_strips_tables_tiles():
    """New-style JPEG-in-TIFF (compression 7, TN2): every strip/tile is a
    T.81 stream decoded by the in-repo JPEG codec. Pinned properties:
    (a) a single-strip page decodes BIT-IDENTICALLY to the standalone
    JPEG of the same pixels; (b) multi-strip assembly equals per-strip
    standalone decodes stacked; (c) the JPEGTables-tag abbreviated layout
    decodes identically to the self-contained layout and is smaller
    (shared DQT/DHT are factored out); (d) tiled geometry crops
    edge-padded full-size tiles exactly; (e) grayscale."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    img = _smooth_arr(45, 62)

    one = decode_tiff_pages(encode_tiff(img, compression="jpeg", quality=85))[0]
    ref = decode_jpeg_pixels(encode_jpeg(img, quality=85, subsampling="444"))
    assert np.array_equal(one, ref)

    multi = encode_tiff(img, compression="jpeg", quality=85, rows_per_strip=16)
    stacked = np.vstack(
        [
            decode_jpeg_pixels(encode_jpeg(img[y:y + 16], 85, "444"))
            for y in range(0, 45, 16)
        ]
    )
    assert np.array_equal(decode_tiff_pages(multi)[0], stacked)

    abbrev = encode_tiff(
        img, compression="jpeg", quality=85, rows_per_strip=16,
        jpeg_tables=True,
    )
    assert np.array_equal(decode_tiff_pages(abbrev)[0], stacked)
    assert len(abbrev) < len(multi)

    tiled = decode_tiff_pages(
        encode_tiff(img, compression="jpeg", quality=85, tile=(32, 16),
                    jpeg_tables=True)
    )[0]
    pad = np.pad(img, ((0, 3), (0, 2), (0, 0)), mode="edge")
    rows = [
        np.hstack(
            [
                decode_jpeg_pixels(
                    encode_jpeg(pad[ty:ty + 16, tx:tx + 32], 85, "444")
                )
                for tx in range(0, 64, 32)
            ]
        )
        for ty in range(0, 48, 16)
    ]
    assert np.array_equal(tiled, np.vstack(rows)[:45, :62])

    gray = img[:, :, :1]
    gdec = decode_tiff_pages(
        encode_tiff(gray, compression="jpeg", quality=90, jpeg_tables=True)
    )[0]
    gref = decode_jpeg_pixels(encode_jpeg(gray, 90, "444"))
    assert np.array_equal(gdec[:, :, 0], gref.reshape(gdec.shape[:2]))

    # lossy but close on smooth content; 8-bit-only guard
    assert np.abs(one.astype(int) - img.astype(int)).mean() < 6.0
    with pytest.raises(ValueError):
        encode_tiff(img.astype("uint16"), compression="jpeg")


def test_tiff_jpeg_old_style_interchange_format():
    """Old-style JPEG-in-TIFF (compression 6): the interoperable layout is
    one complete interchange stream per page behind tags 513/514, decoded
    bit-identically to the standalone JPEG; a compression-6 file WITHOUT
    tag 513 (the deprecated per-strip tag zoo) stays a documented
    boundary."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    img = _smooth_arr(37, 54)
    dec = decode_tiff_pages(encode_tiff(img, compression="jpeg_old",
                                        quality=88))[0]
    assert np.array_equal(dec, decode_jpeg_pixels(encode_jpeg(img, 88, "444")))

    pages = decode_tiff_pages(
        encode_tiff([img, img[:, :, :1]], compression="jpeg_old", quality=88)
    )
    assert [p.shape for p in pages] == [(37, 54, 3), (37, 54, 1)]

    with pytest.raises(ValueError):
        encode_tiff(img, compression="jpeg_old", tile=(16, 16))


def test_tiff_jpeg_multipage_and_multimodal_dispatch():
    """Compression-7 pages chain through the IFD like any other; the
    multimodal raster dispatcher reads a JPEG-in-TIFF payload without
    knowing which compression the pages use."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
        tiff_page_stats,
    )

    p0 = _smooth_arr(24, 33)
    p1 = _smooth_arr(24, 33)[:, :, :1]
    enc = encode_tiff([p0, p1], compression="jpeg", quality=92)
    pages = decode_tiff_pages(enc)
    assert [p.shape for p in pages] == [(24, 33, 3), (24, 33, 1)]
    stats = tiff_page_stats(enc, every_k=1)
    assert [s["frame_idx"] for s in stats] == [0, 1]
    assert stats[0]["mean_r"] == pytest.approx(
        float(pages[0][:, :, 0].mean())
    )

    got = _decode_payload(enc)
    assert (got["format"], got["width"], got["height"]) == ("tiff", 33, 24)


# --- AVI (r4: avicodec.py — RIFF container, DIB + MJPEG frames) -------------


def test_avi_dib_lossless_and_mjpeg_bounded():
    import numpy as np

    from seoul_big_data_spark.sources.avicodec import (
        decode_avi_frames,
        encode_avi,
    )

    frames = np.stack([_smooth_arr(23, 31) for _ in range(4)])
    dec = decode_avi_frames(encode_avi(frames, codec="dib"))
    assert np.array_equal(dec, frames)
    decj = decode_avi_frames(encode_avi(frames, codec="mjpg", quality=95))
    assert decj.shape == frames.shape
    assert np.abs(decj.astype(int) - frames.astype(int)).mean() < 5.0


def test_avi_frame_sampling_and_unknown_codec():
    """avi_frame_stats samples without decoding unsampled frames (frames
    are intra-only); an unknown fourcc hits the codec slot."""
    import struct as _s

    import numpy as np

    from seoul_big_data_spark.sources.avicodec import (
        avi_frame_stats,
        decode_avi_frames,
        encode_avi,
    )

    frames = np.stack([_smooth_arr(12, 16) for _ in range(5)])
    enc = encode_avi(frames, codec="dib")
    stats = avi_frame_stats(enc, every_k=2)
    assert [s["frame_idx"] for s in stats] == [0, 2, 4]
    for s in stats:
        src = frames[s["frame_idx"]]
        assert s["n_frames"] == 5
        assert s["mean_b"] == pytest.approx(float(src[:, :, 2].mean()))
    bad = bytearray(enc)
    pos = enc.find(b"strf")
    _s.pack_into("<I", bad, pos + 8 + 16, _s.unpack("<I", b"XVID")[0])
    with pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(bad))


def test_jpeg_lossless_sof3_bit_exact():
    """Lossless JPEG (SOF3, Annex H): every predictor roundtrips
    bit-exactly at 8-bit; 12/16-bit reduce to the standard top-byte
    view; the point transform codes src >> Pt and reconstructs << Pt;
    diff category 16 (the +-32768 wrap) decodes per H.1.2.2."""
    import numpy as np

    from seoul_big_data_spark.sources.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(4)
    src = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for p in range(1, 8):
        got = decode_jpeg_pixels(encode_jpeg_lossless(src, predictor=p))
        assert np.array_equal(got, src), p

    s12 = rng.integers(0, 4096, size=(7, 6, 1), dtype=np.uint16)
    got = decode_jpeg_pixels(encode_jpeg_lossless(s12, predictor=4, precision=12))
    assert np.array_equal(got[:, :, 0], (s12[:, :, 0] >> 4).astype(np.uint8))

    # category-16: successive samples exactly 32768 apart at 16-bit
    s16 = np.array([[[0], [32768], [0], [65535]]], dtype=np.uint16)
    got = decode_jpeg_pixels(encode_jpeg_lossless(s16, predictor=1, precision=16))
    assert got[:, :, 0].tolist() == (s16[:, :, 0] >> 8).tolist()

    got = decode_jpeg_pixels(encode_jpeg_lossless(src, predictor=2, pt=2))
    assert np.array_equal(got, (src >> 2) << 2)


def test_tiff_lossless_jpeg_strips_bit_exact():
    """The DNG shape: compression-7 strips carrying SOF3 lossless JPEG
    streams decode bit-exactly through the same TN2 tag layout (multi-
    strip RGB with photometric 2 — SOF3 stores components as-is — and
    single-strip grayscale)."""
    import numpy as np

    from seoul_big_data_spark.sources.tiffcodec import (
        decode_tiff_pages,
        encode_tiff,
    )

    rng = np.random.default_rng(8)
    src = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    blob = encode_tiff(src, compression="jpeg_lossless", rows_per_strip=10)
    assert np.array_equal(decode_tiff_pages(blob)[0], src)
    g = src[:, :, :1]
    assert np.array_equal(
        decode_tiff_pages(encode_tiff(g, compression="jpeg_lossless"))[0], g
    )


def test_resize_area_mean_exact_box_semantics():
    """sources/imageops.py: constant image -> exactly constant thumbnail;
    divisible block image -> exact block means; non-divisible dims
    partition blocks by the floor grid (sizes differ by at most one)."""
    import numpy as np

    from seoul_big_data_spark.sources.imageops import resize_area_mean

    const = np.full((30, 20, 3), 77, dtype=np.uint8)
    th = resize_area_mean(const, 16, 16)
    assert th.shape == (16, 16, 3)
    assert (th == 77.0).all()

    # 4x4 image of 2x2 blocks valued 10/20/30/40 -> 2x2 thumbnail of means
    a = np.zeros((4, 4), dtype=np.uint8)
    a[:2, :2], a[:2, 2:], a[2:, :2], a[2:, 2:] = 10, 20, 30, 40
    t2 = resize_area_mean(a, 2, 2)
    assert t2[:, :, 0].tolist() == [[10.0, 20.0], [30.0, 40.0]]

    # non-divisible: 5 rows -> 2 target rows split as [0,2) and [2,5)
    b = np.arange(5, dtype=np.uint8)[:, None]  # 5x1 column
    t3 = resize_area_mean(b, 2, 1)
    assert t3[0, 0, 0] == (0 + 1) / 2
    assert t3[1, 0, 0] == (2 + 3 + 4) / 3


def test_multimodal_resize_query_deterministic(spark, sf_dir):
    from seoul_big_data_spark.queries import QUERIES

    a = {r["doc_id"]: r for r in QUERIES["multimodal_resize"](spark, sf_dir).collect()}
    b = {r["doc_id"]: r for r in QUERIES["multimodal_resize"](spark, sf_dir).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k]["thumb_md5"] == b[k]["thumb_md5"]
        assert a[k]["src_w"] != 16  # the non-divisible geometry is the point
