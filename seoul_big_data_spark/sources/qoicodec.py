"""QOI ("Quite OK Image") codec — pure Python/numpy, no external deps.

Implements the complete public QOI specification (qoiformat.org, one
page): 14-byte header (``qoif`` magic, big-endian width/height, channel
count 3/4, colorspace byte), then a byte-stream of eight ops over a
running previous-pixel + 64-entry index state —

- ``QOI_OP_RGB`` (0xFE) / ``QOI_OP_RGBA`` (0xFF): literal pixel;
- ``QOI_OP_INDEX`` (0b00xxxxxx): the index slot
  ``(3r + 5g + 7b + 11a) % 64``;
- ``QOI_OP_DIFF`` (0b01rrggbb): per-channel wrapping diff in [-2, 1];
- ``QOI_OP_LUMA`` (0b10gggggg + drdg|dbdg byte): green diff in
  [-32, 31], red/blue diffs relative to it in [-8, 7], wrapping;
- ``QOI_OP_RUN`` (0b11rrrrrr): run of 1..62 repeats (63/64 are the
  literal tags);

terminated by seven 0x00 bytes and one 0x01. Lossless by construction.
The encoder is the test-vector inverse and applies the ops greedily in
the spec's canonical priority (run, index, diff, luma, literal).

North-star extension (SURVEY.md §2.10 N5); decode runs executor-side in
Arrow-batched ``mapInPandas`` like every other codec here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_qoi_pixels", "decode_qoi", "encode_qoi"]

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi_pixels(payload: bytes):
    """(h, w, channels) uint8, top-down (3 → RGB, 4 → RGBA)."""
    if len(payload) < 22 or payload[:4] != _MAGIC:
        raise ValueError("not a QOI payload")
    w, h = struct.unpack_from(">II", payload, 4)
    channels, _colorspace = payload[12], payload[13]
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad QOI dimensions")
    n_px = w * h
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    end = len(data) - 8
    while i < n_px:
        if pos >= end:
            raise ValueError("truncated QOI stream")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0b00:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 0b01:  # QOI_OP_DIFF
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 0b10:  # QOI_OP_LUMA
                dg = (byte & 0x3F) - 32
                rb = data[pos]
                pos += 1
                r = (r + dg + ((rb >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (rb & 0xF) - 8) & 0xFF
            else:  # QOI_OP_RUN
                run = (byte & 0x3F) + 1
                if i + run > n_px:
                    raise ValueError("QOI run past image end")
                out[i:i + run] = (r, g, b, a)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[end:end + 8] != _END:
        raise ValueError("bad QOI end marker")
    px = out.reshape(h, w, 4)
    return px[:, :, :3].copy() if channels == 3 else px


def decode_qoi(payload: bytes) -> dict:
    """Stats-dict form (the ``_decode_payload`` contract)."""
    px = decode_qoi_pixels(payload)
    h, w, channels = px.shape
    rgb = px[:, :, :3]
    sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    n_px = h * w
    return {
        "format": "qoi",
        "width": w,
        "height": h,
        "channels": int(channels),
        "mean_r": int(sums[0]) / n_px,
        "mean_g": int(sums[1]) / n_px,
        "mean_b": int(sums[2]) / n_px,
        "feat_mean": int(sums.sum()) / (3 * n_px),
    }


def encode_qoi(arr, colorspace: int = 0) -> bytes:
    """Greedy spec-priority encoder (run > index > diff > luma >
    literal); ``arr`` is (h, w, 3|4) uint8, top-down."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, channels = arr.shape
    if channels not in (3, 4):
        raise ValueError("QOI encodes 3- or 4-channel images")
    out = bytearray(
        _MAGIC + struct.pack(">II", w, h) + bytes((channels, colorspace))
    )
    if channels == 3:
        px = np.concatenate(
            [arr, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
        ).reshape(-1, 4)
    else:
        px = arr.reshape(-1, 4)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b, a in map(tuple, px.tolist()):
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = _hash(r, g, b, a)
        if index[ih] == (r, g, b, a):
            out.append(ih)
        else:
            index[ih] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)
