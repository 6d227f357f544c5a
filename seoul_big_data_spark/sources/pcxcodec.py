"""ZSoft PCX codec — pure Python/numpy, no external deps.

The classic DOS paint format, fully specified publicly: a 128-byte
header (0x0A manufacturer byte, version, encoding 1 = byte RLE, bits
per pixel per plane, window xmin/ymin/xmax/ymax, plane count, bytes per
scan line), RLE-compressed scanlines stored plane-by-plane within each
row, and for 8-bit images a 256-entry VGA palette appended at EOF
behind a 0x0C marker. RLE: a byte with its top two bits set carries a
run count (low 6 bits) of the following byte; anything else is a
literal.

Decoded variants: 8-bit single-plane palette (VGA palette or grayscale
fallback), 24-bit as three 8-bit planes (R, G, B per scan line), and
1-bit monochrome. The encoder is the test-vector inverse.

North-star extension (SURVEY.md §2.10 N5); reference has no media path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_pcx_pixels", "decode_pcx", "encode_pcx", "sniff_pcx"]


def sniff_pcx(payload: bytes) -> bool:
    """PCX has no strong magic; require the full header signature."""
    return (
        len(payload) > 128
        and payload[0] == 0x0A
        and payload[1] in (0, 2, 3, 4, 5)
        and payload[2] == 1
        and payload[3] in (1, 2, 4, 8)
    )


def _rle_decode(data: bytes, need: int) -> np.ndarray:
    out = np.empty(need, dtype=np.uint8)
    filled = pos = 0
    n = len(data)
    while filled < need:
        if pos >= n:
            raise ValueError("truncated PCX RLE stream")
        b = data[pos]
        pos += 1
        if b >= 0xC0:
            run = b & 0x3F
            if pos >= n:
                raise ValueError("truncated PCX RLE run")
            val = data[pos]
            pos += 1
            if filled + run > need:
                raise ValueError("PCX RLE overruns image")
            out[filled:filled + run] = val
            filled += run
        else:
            out[filled] = b
            filled += 1
    return out


def decode_pcx_pixels(payload: bytes):
    """(h, w, 3) uint8 RGB, top-down."""
    if not sniff_pcx(payload):
        raise ValueError("not a PCX payload")
    bpp = payload[3]
    xmin, ymin, xmax, ymax = struct.unpack_from("<HHHH", payload, 4)
    n_planes = payload[65]
    bpl = struct.unpack_from("<H", payload, 66)[0]
    w, h = xmax - xmin + 1, ymax - ymin + 1
    if w <= 0 or h <= 0 or bpl == 0:
        raise ValueError("bad PCX geometry")

    body = payload[128:]
    has_vga = len(body) >= 769 and body[-769] == 0x0C
    if has_vga:
        vga = np.frombuffer(body[-768:], dtype=np.uint8).reshape(256, 3)
        body = body[:-769]
    rows = _rle_decode(body, h * n_planes * bpl).reshape(h, n_planes, bpl)

    if bpp == 8 and n_planes == 3:
        return np.ascontiguousarray(
            rows[:, :, :w].transpose(0, 2, 1)
        )  # planes are R, G, B
    if bpp == 8 and n_planes == 1:
        idx = rows[:, 0, :w]
        if has_vga:
            return vga[idx]
        return np.repeat(idx[:, :, None], 3, axis=2)  # grayscale fallback
    if bpp == 1 and n_planes == 1:
        bits = np.unpackbits(rows[:, 0, :], axis=1)[:, :w]
        return np.repeat((bits * 255).astype(np.uint8)[:, :, None], 3, axis=2)
    raise NotImplementedError(
        f"PCX variant (bpp={bpp}, planes={n_planes}) needs a real codec"
    )


def decode_pcx(payload: bytes) -> dict:
    """Stats-dict form (the ``_decode_payload`` contract)."""
    px = decode_pcx_pixels(payload)
    sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    n_px = px.shape[0] * px.shape[1]
    return {
        "format": "pcx",
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": 3,
        "mean_r": int(sums[0]) / n_px,
        "mean_g": int(sums[1]) / n_px,
        "mean_b": int(sums[2]) / n_px,
        "feat_mean": int(sums.sum()) / (3 * n_px),
    }


def _rle_encode(row: np.ndarray) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    vals = row.tolist()
    while i < n:
        v = vals[i]
        j = i + 1
        while j < n and vals[j] == v and j - i < 63:
            j += 1
        run = j - i
        if run > 1 or v >= 0xC0:
            out.append(0xC0 | run)
            out.append(v)
        else:
            out.append(v)
        i = j
    return bytes(out)


def encode_pcx(arr, palette=None, mono: bool = False) -> bytes:
    """Test-vector inverse of :func:`decode_pcx_pixels`.

    ``arr`` is (h, w, 3) uint8 RGB for 24-bit; (h, w) uint8 indices with
    ``palette`` (256, 3) for 8-bit; (h, w) bool/0-1 with ``mono=True``
    for 1-bit. Scanlines are RLE'd independently, as classic writers do.
    """
    arr = np.asarray(arr)
    if mono:
        h, w = arr.shape
        bpp, n_planes = 1, 1
        bpl = (w + 7) // 8
        if bpl % 2:
            bpl += 1  # even bytes-per-line, the common convention
        planes_rows = [
            [
                np.packbits(
                    np.pad(arr[y].astype(np.uint8), (0, bpl * 8 - w))
                )
            ]
            for y in range(h)
        ]
    elif palette is not None:
        h, w = arr.shape
        bpp, n_planes = 8, 1
        bpl = w + (w % 2)
        planes_rows = [
            [np.pad(arr[y].astype(np.uint8), (0, bpl - w))] for y in range(h)
        ]
    else:
        h, w, _c = arr.shape
        bpp, n_planes = 8, 3
        bpl = w + (w % 2)
        planes_rows = [
            [
                np.pad(arr[y, :, c].astype(np.uint8), (0, bpl - w))
                for c in range(3)
            ]
            for y in range(h)
        ]
    hdr = bytearray(128)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0x0A, 5, 1, bpp
    struct.pack_into("<HHHH", hdr, 4, 0, 0, w - 1, h - 1)
    struct.pack_into("<HH", hdr, 12, 72, 72)  # dpi
    hdr[65] = n_planes
    struct.pack_into("<H", hdr, 66, bpl)
    struct.pack_into("<H", hdr, 68, 1)  # palette info: color
    out = bytearray(hdr)
    for row_planes in planes_rows:
        for p in row_planes:
            out += _rle_encode(p)
    if palette is not None:
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[: len(palette)] = np.asarray(palette, dtype=np.uint8)
        out += b"\x0c" + pal.tobytes()
    return bytes(out)
