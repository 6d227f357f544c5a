"""AIFF / AIFF-C audio container codec — pure Python/numpy.

The IFF-structured big-endian sibling of RIFF/WAVE (the classic Mac
interchange format): ``FORM`` + ``AIFF``/``AIFC``, a ``COMM`` chunk
(channels, sample frames, bit depth, sample rate as an 80-bit IEEE 754
extended-precision float — parsed and written here from the published
bit layout: 15-bit biased exponent, explicit-integer-bit 64-bit
mantissa) and an ``SSND`` chunk (offset/blockSize header, then
interleaved samples).

Decoded variants: big-endian PCM 8 (SIGNED — unlike WAVE's unsigned 8),
16, 24, 32-bit; AIFF-C ``NONE`` (BE PCM), ``sowt`` (byte-swapped, i.e.
little-endian 16-bit — the ubiquitous Mac-OS-X form), and ``fl32``/
``fl64`` IEEE floats. Everything reduces to the same int16 grid and
RMS/zero-crossing features as ``multimodal._decode_wav``, so a WAV and
an AIFF of the same samples produce identical rows (pinned in tests).
Perceptual AIFF-C codecs (ima4, alac, ...) hit the documented
NotImplementedError slot.

North-star extension (SURVEY.md §2.10 N5); reference has no media path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_aiff", "encode_aiff"]


def _read_extended(b: bytes) -> float:
    """80-bit IEEE 754 extended-precision BE → float (the COMM sample
    rate field)."""
    if len(b) < 10:
        raise ValueError("truncated 80-bit float")
    se = struct.unpack_from(">H", b, 0)[0]
    mant = struct.unpack_from(">Q", b, 2)[0]
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended(v: float) -> bytes:
    """float → 80-bit IEEE 754 extended BE (explicit integer bit)."""
    if v == 0:
        return b"\x00" * 10
    sign = 0x8000 if v < 0 else 0
    v = abs(v)
    exp = 16383 + 63
    mant = int(v)
    frac = v - mant
    # normalize the integer part into the top bit of the 64-bit mantissa
    while mant >= 1 << 64:
        mant >>= 1
        exp += 1
    while mant < 1 << 63:
        mant = (mant << 1) | (1 if (frac := frac * 2) >= 1 else 0)
        frac -= int(frac)
        exp -= 1
    return struct.pack(">HQ", sign | exp, mant)


def _chunks(payload: bytes):
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        yield cid, payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # IFF chunks are word-aligned


def decode_aiff(payload: bytes) -> dict:
    """Same stats-dict contract as ``multimodal._decode_wav``."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    comm = ssnd = None
    for cid, body in _chunks(payload):
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise ValueError("AIFF missing COMM/SSND chunk")
    channels, n_frames, bits = struct.unpack_from(">HIH", comm, 0)
    rate = _read_extended(comm[8:18])
    if channels < 1 or rate <= 0:
        raise ValueError("bad AIFF COMM parameters")
    comp = b"NONE"
    if is_aifc:
        if len(comm) < 22:
            raise ValueError("AIFC COMM missing compression type")
        comp = comm[18:22]
    offset = struct.unpack_from(">I", ssnd, 0)[0]
    data = ssnd[8 + offset:]

    if comp == b"NONE":
        if bits == 16:
            x = np.frombuffer(data[: len(data) // 2 * 2], dtype=">i2").astype(
                np.int16
            )
        elif bits == 8:
            # AIFF 8-bit PCM is SIGNED (RIFF's is unsigned)
            x = np.frombuffer(data, dtype=np.int8).astype(np.int16) << 8
        elif bits == 24:
            b3 = np.frombuffer(data, dtype=np.uint8)[: len(data) // 3 * 3]
            b3 = b3.reshape(-1, 3).astype(np.int32)
            x32 = (b3[:, 0] << 16) | (b3[:, 1] << 8) | b3[:, 2]  # big-endian
            x = (((x32 ^ 0x800000) - 0x800000) >> 8).astype(np.int16)
        elif bits == 32:
            x = (
                np.frombuffer(data[: len(data) // 4 * 4], dtype=">i4") >> 16
            ).astype(np.int16)
        else:
            raise NotImplementedError(f"AIFF PCM bit depth {bits}")
    elif comp == b"sowt" and bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
            np.int16
        )
    elif comp in (b"fl32", b"FL32", b"fl64", b"FL64"):
        f = np.frombuffer(
            data, dtype=">f4" if comp.lower() == b"fl32" else ">f8"
        )
        x = np.clip(np.round(f * 32768.0), -32768, 32767).astype(np.int16)
    else:
        raise NotImplementedError(
            f"AIFF-C compression {comp!r} needs a real codec; plug "
            "ffmpeg/soundfile here"
        )

    n_samples = len(x) // channels
    ch0 = x[::channels].astype(np.float64) / 32768.0
    zc = (
        float(np.mean(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
        if len(ch0) > 1
        else 0.0
    )
    return {
        "format": "aiff",
        "sample_rate": int(round(rate)),
        "channels": channels,
        "n_samples": n_samples,
        "duration_s": n_samples / rate,
        "rms": float(np.sqrt(np.mean(ch0 * ch0))) if n_samples else 0.0,
        "zero_cross_rate": zc,
    }


def encode_aiff(
    sample_rate: int,
    channels: int,
    samples,
    bits: int = 16,
    compression: bytes | None = None,
) -> bytes:
    """Test-vector inverse. ``samples`` is interleaved int16; deep/float
    forms widen from the int16 grid (<< 8 / << 16 / ÷32768), so decode
    recovers the input exactly."""
    x = np.asarray(samples, dtype=np.int16)
    if compression is None and bits == 16:
        data = x.astype(">i2").tobytes()
        comm_tail = b""
        form = b"AIFF"
    elif compression is None and bits == 8:
        data = (x >> 8).astype(np.int8).tobytes()
        comm_tail = b""
        form = b"AIFF"
    elif compression is None and bits == 24:
        x32 = (x.astype(np.int32) << 8) & 0xFFFFFF
        b3 = np.empty((len(x), 3), dtype=np.uint8)
        b3[:, 0] = (x32 >> 16) & 0xFF
        b3[:, 1] = (x32 >> 8) & 0xFF
        b3[:, 2] = x32 & 0xFF
        data = b3.tobytes()
        comm_tail = b""
        form = b"AIFF"
    elif compression is None and bits == 32:
        data = (x.astype(np.int32) << 16).astype(">i4").tobytes()
        comm_tail = b""
        form = b"AIFF"
    elif compression == b"sowt":
        bits = 16
        data = x.astype("<i2").tobytes()
        comm_tail = b"sowt" + b"\x04sowt\x00"  # pstring, padded to even
        form = b"AIFC"
    elif compression in (b"fl32", b"fl64"):
        bits = 32 if compression == b"fl32" else 64
        f = x.astype(np.float64) / 32768.0
        data = f.astype(">f4" if compression == b"fl32" else ">f8").tobytes()
        comm_tail = compression + b"\x03" + compression[:3] + b""
        form = b"AIFC"
    else:
        raise ValueError(f"unsupported encode form bits={bits} comp={compression!r}")

    n_frames = len(x) // channels
    comm = (
        struct.pack(">HIH", channels, n_frames, bits)
        + _write_extended(float(sample_rate))
        + comm_tail
    )
    ssnd = struct.pack(">II", 0, 0) + data

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack(">I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    body = form
    if form == b"AIFC":
        body += chunk(b"FVER", struct.pack(">I", 0xA2805140))
    body += chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body
