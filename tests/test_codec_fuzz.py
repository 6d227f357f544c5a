"""Robustness fuzzing for the pure-Python codecs.

At 100 TB, malformed blobs are a statistical certainty; a decoder that
hangs, crashes the worker, or silently returns wrong data on corrupt
input is an operational hazard. These tests flip bits in the ENTROPY
region of valid payloads (past the fixed header, so dimension fields
stay sane) and truncate at arbitrary points, asserting every decoder
either still returns a well-formed array or raises a clean exception —
never hangs, never loops forever. CRC-protected formats (FLAC) must
reject every corruption outright.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from seoul_big_data_spark.sources.flaccodec import (
    decode_flac_samples,
    encode_flac,
)
from seoul_big_data_spark.sources.gifcodec import (
    decode_gif_frames,
    encode_gif,
)
from seoul_big_data_spark.sources.jpegcodec import (
    decode_jpeg_pixels,
    encode_jpeg,
    encode_jpeg_progressive,
)
from seoul_big_data_spark.sources.multimodal import (
    _decode_bmp_pixels,
    _decode_png_pixels,
    _decode_wav,
    encode_bmp_palette,
    encode_png,
    encode_wav_adpcm,
)
from seoul_big_data_spark.sources.tiffcodec import (
    decode_tiff_pages,
    encode_tiff,
)

_CLEAN = (ValueError, NotImplementedError, IndexError, KeyError, EOFError)


def _img(seed=1):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 6, size=(24, 24, 3)) * 40).astype("uint8")


def _fuzz(decode, payload: bytes, header_len: int, n_mutations: int = 300):
    """Flip one byte per trial in the post-header region; decode must
    return or raise cleanly. Also truncate at a spread of points."""
    rng = np.random.RandomState(17)
    # several independent corruption seeds widen the coverage
    clean = _CLEAN + (zlib.error, struct.error, OverflowError)
    for _ in range(n_mutations):
        b = bytearray(payload)
        pos = rng.randint(header_len, len(b))
        b[pos] ^= 1 << rng.randint(0, 8)
        try:
            decode(bytes(b))
        except clean:
            pass  # clean rejection is a valid outcome
    for frac in (0.3, 0.6, 0.9, 0.99):
        cut = max(header_len + 1, int(len(payload) * frac))
        try:
            decode(payload[:cut])
        except clean:
            pass


def test_fuzz_jpeg_baseline_and_progressive():
    img = _img()
    _fuzz(decode_jpeg_pixels, encode_jpeg(img, quality=90), 0x200)
    _fuzz(decode_jpeg_pixels, encode_jpeg_progressive(img, quality=90), 0x280)


def test_fuzz_png():
    _fuzz(_decode_png_pixels, encode_png(_img(), [0, 1, 2, 3, 4]), 0x30)


def test_fuzz_gif():
    frames = np.stack([_img(s) for s in range(3)])
    _fuzz(decode_gif_frames, encode_gif(frames, delta=True), 0x20)


def test_fuzz_tiff():
    img = _img()
    # header_len past the IFD so width/height tags stay intact
    _fuzz(decode_tiff_pages, encode_tiff(img, compression="lzw",
                                         predictor=True), 0xB0)


def test_fuzz_bmp_palette_rle():
    """Corrupt RLE control bytes must reject via bounds checks, never
    hang (every loop iteration advances the cursor) and never write
    outside the index plane."""
    import numpy as np

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, size=(16, 3)).astype("uint8")
    idx = rng.randint(0, 16, size=(12, 19)).astype("uint8")
    for bpp in (4, 8):
        enc = encode_bmp_palette(idx, pal, bpp=bpp, rle=True)
        _fuzz(_decode_bmp_pixels, enc, 54 + 64)


def test_fuzz_tiff_jpeg_compression7():
    """JPEG-in-TIFF stacks two parsers (IFD walk + per-strip T.81); both
    layers must reject corrupt strip data and corrupt JPEGTables cleanly."""
    img = _img()
    enc = encode_tiff(img, compression="jpeg", quality=90,
                      rows_per_strip=8, jpeg_tables=True)
    _fuzz(decode_tiff_pages, enc, 0xB0)


def test_fuzz_wav_adpcm():
    rng = np.random.RandomState(5)
    wave = rng.randint(-20000, 20000, size=1000)
    _fuzz(_decode_wav, encode_wav_adpcm(8000, 1, wave,
                                        samples_per_block=1000), 0x30)


def test_fuzz_flac_crc_rejects_every_data_corruption():
    """FLAC is CRC-protected end to end: EVERY single-bit corruption of
    the frame region must be rejected, not just tolerated."""
    rng = np.random.RandomState(11)
    sig = (9000 * np.sin(2 * np.pi * 300 * np.arange(2000) / 8000)).astype(int)
    payload = encode_flac(sig, 8000, 1)
    header_len = 4 + 4 + 34  # magic + block header + STREAMINFO
    for _ in range(60):
        b = bytearray(payload)
        pos = rng.randint(header_len, len(b))
        b[pos] ^= 1 << rng.randint(0, 8)
        with pytest.raises(_CLEAN):
            decode_flac_samples(bytes(b))


def test_fuzz_tga_rle():
    from seoul_big_data_spark.sources.tgacodec import (
        decode_tga_pixels,
        encode_tga,
    )

    payload = encode_tga(_img(8), rle=True)
    _fuzz(decode_tga_pixels, payload, header_len=18)


def test_fuzz_ico():
    from seoul_big_data_spark.sources.icocodec import (
        decode_ico_pixels,
        encode_ico,
    )
    from seoul_big_data_spark.sources.multimodal import encode_bmp_array

    payload = encode_ico([encode_bmp_array(_img(9))])
    # header = ICONDIR + one entry (22 bytes): keep the directory sane and
    # corrupt the embedded DIB instead
    _fuzz(decode_ico_pixels, payload, header_len=22)


def test_fuzz_qoi():
    from seoul_big_data_spark.sources.qoicodec import (
        decode_qoi_pixels,
        encode_qoi,
    )

    payload = encode_qoi(_img(7))
    _fuzz(decode_qoi_pixels, payload, header_len=14)


def test_fuzz_pcx():
    from seoul_big_data_spark.sources.pcxcodec import (
        decode_pcx_pixels,
        encode_pcx,
    )

    payload = encode_pcx(_img(9))
    _fuzz(decode_pcx_pixels, payload, header_len=128)
