"""Sun AU (.au / .snd) audio container codec — pure Python/numpy.

The simplest real audio container: a ``.snd`` magic, five big-endian
u32 header fields (data offset, data size — 0xFFFFFFFF means
"until EOF" — encoding id, sample rate, channels), then raw interleaved
samples. Encoding ids per the published header: 1 = G.711 mu-law,
2/3/4/5 = linear PCM 8 (signed)/16/24/32 big-endian, 6/7 = IEEE float
32/64, 27 = G.711 A-law.

Everything reduces to the same int16 grid and feature formulas as the
WAV/AIFF paths (mu-law and A-law expand through the shared
``multimodal._g711_table`` ITU-T tables), so the same samples produce
identical feature rows in all three containers (pinned in tests).
Compressed encodings (G.72x ADPCM ids 23-26) hit the documented
NotImplementedError slot.

North-star extension (SURVEY.md §2.10 N5); reference has no media path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_au", "encode_au"]

_MAGIC = b".snd"


def decode_au(payload: bytes) -> dict:
    """Same stats-dict contract as ``multimodal._decode_wav``."""
    from .multimodal import _g711_table

    if len(payload) < 24 or payload[:4] != _MAGIC:
        raise ValueError("not an AU payload")
    offset, size, enc, rate, channels = struct.unpack_from(">IIIII", payload, 4)
    if offset < 24 or rate == 0 or channels == 0:
        raise ValueError("bad AU header")
    data = payload[offset:]
    if size != 0xFFFFFFFF:
        data = data[:size]

    if enc == 1:  # G.711 mu-law
        x = _g711_table("ulaw")[np.frombuffer(data, dtype=np.uint8)]
    elif enc == 27:  # G.711 A-law
        x = _g711_table("alaw")[np.frombuffer(data, dtype=np.uint8)]
    elif enc == 2:  # 8-bit linear PCM, SIGNED (unlike WAVE)
        x = np.frombuffer(data, dtype=np.int8).astype(np.int16) << 8
    elif enc == 3:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype=">i2").astype(
            np.int16
        )
    elif enc == 4:
        b3 = np.frombuffer(data, dtype=np.uint8)[: len(data) // 3 * 3]
        b3 = b3.reshape(-1, 3).astype(np.int32)
        x32 = (b3[:, 0] << 16) | (b3[:, 1] << 8) | b3[:, 2]
        x = (((x32 ^ 0x800000) - 0x800000) >> 8).astype(np.int16)
    elif enc == 5:
        x = (
            np.frombuffer(data[: len(data) // 4 * 4], dtype=">i4") >> 16
        ).astype(np.int16)
    elif enc in (6, 7):
        f = np.frombuffer(data, dtype=">f4" if enc == 6 else ">f8")
        x = np.clip(np.round(f * 32768.0), -32768, 32767).astype(np.int16)
    else:
        raise NotImplementedError(
            f"AU encoding {enc} needs a real codec; plug ffmpeg here"
        )

    n_samples = len(x) // channels
    ch0 = x[::channels].astype(np.float64) / 32768.0
    zc = (
        float(np.mean(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
        if len(ch0) > 1
        else 0.0
    )
    return {
        "format": "au",
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n_samples,
        "duration_s": n_samples / rate,
        "rms": float(np.sqrt(np.mean(ch0 * ch0))) if n_samples else 0.0,
        "zero_cross_rate": zc,
    }


def encode_au(
    sample_rate: int, channels: int, samples, encoding: int = 3
) -> bytes:
    """Test-vector inverse; ``samples`` is interleaved int16. mu-law /
    A-law forms compand through the inverse of the shared expand table
    (nearest-code search — exact on table values)."""
    from .multimodal import _g711_table

    x = np.asarray(samples, dtype=np.int16)
    if encoding == 3:
        data = x.astype(">i2").tobytes()
    elif encoding == 2:
        data = (x >> 8).astype(np.int8).tobytes()
    elif encoding == 4:
        x32 = (x.astype(np.int32) << 8) & 0xFFFFFF
        b3 = np.empty((len(x), 3), dtype=np.uint8)
        b3[:, 0] = (x32 >> 16) & 0xFF
        b3[:, 1] = (x32 >> 8) & 0xFF
        b3[:, 2] = x32 & 0xFF
        data = b3.tobytes()
    elif encoding == 5:
        data = (x.astype(np.int32) << 16).astype(">i4").tobytes()
    elif encoding in (6, 7):
        f = x.astype(np.float64) / 32768.0
        data = f.astype(">f4" if encoding == 6 else ">f8").tobytes()
    elif encoding in (1, 27):
        tbl = _g711_table("ulaw" if encoding == 1 else "alaw").astype(
            np.int32
        )
        # nearest expanded value per sample = its companded code
        order = np.argsort(tbl, kind="stable")
        sorted_tbl = tbl[order]
        idx = np.searchsorted(sorted_tbl, x.astype(np.int32))
        idx = np.clip(idx, 0, 255)
        lo = np.clip(idx - 1, 0, 255)
        pick = np.where(
            np.abs(sorted_tbl[idx] - x) <= np.abs(sorted_tbl[lo] - x), idx, lo
        )
        data = order[pick].astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported encode encoding {encoding}")
    hdr = _MAGIC + struct.pack(
        ">IIIII", 24, len(data), encoding, sample_rate, channels
    )
    return hdr + data
