"""Truevision TGA codec — pure numpy/stdlib, no external dependencies.

Decodes the format's full raster matrix: types 1/2/3 (color-mapped,
truecolor, grayscale) and their RLE twins 9/10/11, at 8/15/16/24/32-bit
pixel depths, both row origins (descriptor bit 5). The encoder is the
test-vector inverse (always writes the TGA 2.0 footer, which is also how
`multimodal._decode_payload` sniffs the otherwise magic-less format).

Layout per the public TGA 2.0 specification: an 18-byte little-endian
header (id length, color-map type, image type, color-map spec, origin,
width/height, pixel depth, descriptor), then the id field, color map,
and pixel data; the optional v2 footer is the trailing 26 bytes ending
in ``TRUEVISION-XFILE.\\0``. RLE packets carry a count byte (bit 7 set =
run of one repeated pixel, clear = literal run), counts 1-128, packets
never wrap rows' total but may cross row boundaries.

Reference scope note: the reference ETL (441 LoC, CSV/JDBC only —
data_seoul_2_csv_noopenapi.py) has no media path at all; this codec
serves the north-star multimodal surface (SURVEY.md §2 N5).
"""

from __future__ import annotations

import struct

FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


def _expand5(v):
    """5-bit channel to 8-bit: (v << 3) | (v >> 2) — the standard mapping
    that sends 0→0 and 31→255 exactly."""
    return (v << 3) | (v >> 2)


def _rle_expand(data: bytes, n_px: int, bypp: int):
    """Expand TGA RLE packets to exactly ``n_px`` pixels of ``bypp`` bytes.
    Corrupt streams (overlong, truncated) raise — never hang or return
    silent garbage (the fuzz-layer contract every codec here honors)."""
    import numpy as np

    out = np.empty(n_px * bypp, dtype=np.uint8)
    filled = 0
    pos = 0
    total = n_px * bypp
    while filled < total:
        if pos >= len(data):
            raise ValueError("truncated TGA RLE stream")
        hdr = data[pos]
        pos += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:  # run packet: one pixel value repeated
            px = data[pos:pos + bypp]
            if len(px) < bypp:
                raise ValueError("truncated TGA RLE run pixel")
            pos += bypp
            chunk = np.tile(np.frombuffer(px, dtype=np.uint8), count)
        else:  # literal packet: count raw pixels
            nbytes = count * bypp
            raw = data[pos:pos + nbytes]
            if len(raw) < nbytes:
                raise ValueError("truncated TGA RLE literal packet")
            pos += nbytes
            chunk = np.frombuffer(raw, dtype=np.uint8)
        if filled + len(chunk) > total:
            raise ValueError("TGA RLE overruns pixel array")
        out[filled:filled + len(chunk)] = chunk
        filled += len(chunk)
    return out


def _pixels_to_rgb(px, depth: int, palette=None):
    """(n, bypp) raw pixel bytes → (n, 3) uint8 RGB. ``palette`` is the
    decoded (n_entries, 3) RGB color map for type-1 images."""
    import numpy as np

    if depth == 8:
        if palette is not None:
            idx = px[:, 0]
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("TGA palette index out of range")
            return palette[idx]
        return np.repeat(px, 3, axis=1)  # grayscale
    if depth in (15, 16):
        v = px[:, 0].astype(np.uint16) | (px[:, 1].astype(np.uint16) << 8)
        b = _expand5(v & 31)
        g = _expand5((v >> 5) & 31)
        r = _expand5((v >> 10) & 31)
        return np.stack([r, g, b], axis=1).astype(np.uint8)
    # 24/32-bit: stored BGR(A)
    return px[:, [2, 1, 0]]


def _parse_color_map(payload, pos: int, length: int, entry_bits: int):
    """Color map entries → (length, 3) uint8 RGB."""
    import numpy as np

    nbytes = length * ((entry_bits + 7) // 8)
    raw = payload[pos:pos + nbytes]
    if len(raw) < nbytes:
        raise ValueError("truncated TGA color map")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(length, -1)
    return _pixels_to_rgb(arr, 16 if entry_bits in (15, 16) else entry_bits)


def decode_tga_pixels(payload: bytes):
    """(h, w, 3) uint8 RGB, y=0 at top, for any supported TGA variant."""
    import numpy as np

    if len(payload) < 18:
        raise ValueError("not a TGA payload")
    (id_len, cmap_type, img_type) = struct.unpack_from("<BBB", payload, 0)
    cmap_first, cmap_len, cmap_bits = struct.unpack_from("<HHB", payload, 3)
    width, height = struct.unpack_from("<HH", payload, 12)
    depth, desc = struct.unpack_from("<BB", payload, 16)
    if desc & 0x10:
        raise NotImplementedError("right-to-left TGA not supported")
    base_type = img_type & ~8
    if base_type not in (1, 2, 3):
        raise ValueError(f"unsupported TGA image type {img_type}")
    if base_type == 1 and cmap_type != 1:
        raise ValueError("color-mapped TGA without color map")
    allowed = {1: (8,), 2: (15, 16, 24, 32), 3: (8,)}[base_type]
    if depth not in allowed:
        raise ValueError(f"TGA depth {depth} invalid for type {img_type}")
    if width == 0 or height == 0:
        raise ValueError("empty TGA image")

    pos = 18 + id_len
    palette = None
    if cmap_type == 1:
        palette = _parse_color_map(payload, pos, cmap_len, cmap_bits)
        pos += cmap_len * ((cmap_bits + 7) // 8)
        if base_type == 1 and cmap_first:
            # first-entry offset shifts every index
            pal = np.zeros((cmap_first + cmap_len, 3), dtype=np.uint8)
            pal[cmap_first:] = palette
            palette = pal
    bypp = (depth + 7) // 8
    n_px = width * height
    if img_type & 8:
        flat = _rle_expand(payload[pos:], n_px, bypp)
    else:
        need = n_px * bypp
        raw = payload[pos:pos + need]
        if len(raw) < need:
            raise ValueError("truncated TGA pixel array")
        flat = np.frombuffer(raw, dtype=np.uint8)
    rgb = _pixels_to_rgb(
        flat.reshape(n_px, bypp),
        depth,
        palette if base_type == 1 else None,
    ).reshape(height, width, 3)
    if not desc & 0x20:  # origin bottom-left: flip to top-down
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_tga(payload: bytes) -> dict:
    """Stats-dict form (the ``_decode_payload`` contract): dimensions plus
    exact channel means computed from the decoded RGB array."""
    px = decode_tga_pixels(payload)
    import numpy as np

    sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    n_px = px.shape[0] * px.shape[1]
    return {
        "format": "tga",
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": 3,
        "mean_r": int(sums[0]) / n_px,
        "mean_g": int(sums[1]) / n_px,
        "mean_b": int(sums[2]) / n_px,
        "feat_mean": int(sums.sum()) / (3 * n_px),
    }


def _rle_pack(flat, bypp: int) -> bytes:
    """Greedy TGA RLE: maximal runs of identical pixels as run packets,
    everything between as literal packets, both capped at 128."""
    import numpy as np

    px = flat.reshape(-1, bypp)
    n = len(px)
    out = bytearray()
    same = np.concatenate([[False], (px[1:] == px[:-1]).all(axis=1)])
    i = 0
    while i < n:
        j = i + 1
        while j < n and same[j]:
            j += 1
        run = j - i
        if run >= 2:
            while run > 0:
                take = min(run, 128)
                out.append(0x80 | (take - 1))
                out += px[i].tobytes()
                run -= take
            i = j
        else:
            k = j
            while k < n:  # literal until the next run of >= 2 starts
                if k + 1 < n and same[k + 1]:
                    break
                k += 1
            lit = k - i
            while lit > 0:
                take = min(lit, 128)
                out.append(take - 1)
                out += px[i:i + take].tobytes()
                i += take
                lit -= take
    return bytes(out)


def encode_tga(
    arr,
    depth: int = 24,
    rle: bool = False,
    top_down: bool = True,
    palette=None,
) -> bytes:
    """Test-vector inverse of :func:`decode_tga_pixels`.

    ``arr`` is (h, w, 3) uint8 RGB with y=0 at top for truecolor depths
    (16/24/32); (h, w) uint8 for depth 8 — grayscale, or palette indices
    when ``palette`` (n, 3) is given (type 1). 16-bit quantizes to 5-bit
    channels, so encode→decode equals the 5-bit grid, not the source.
    Always appends the TGA 2.0 footer (the format's only sniffable magic).
    """
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if depth == 8:
        h, w = arr.shape
        base_type = 1 if palette is not None else 3
        flat = arr.reshape(-1, 1)
    else:
        h, w = arr.shape[:2]
        base_type = 2
        if depth in (15, 16):
            r = arr[:, :, 0].astype(np.uint16) >> 3
            g = arr[:, :, 1].astype(np.uint16) >> 3
            b = arr[:, :, 2].astype(np.uint16) >> 3
            v = (r << 10) | (g << 5) | b
            flat = np.stack(
                [(v & 0xFF).astype(np.uint8), (v >> 8).astype(np.uint8)],
                axis=2,
            ).reshape(-1, 2)
            depth = 16
        elif depth == 24:
            flat = arr[:, :, ::-1].reshape(-1, 3)  # BGR
        elif depth == 32:
            bgra = np.concatenate(
                [arr[:, :, ::-1], np.full((h, w, 1), 255, dtype=np.uint8)],
                axis=2,
            )
            flat = bgra.reshape(-1, 4)
        else:
            raise ValueError(f"unsupported encode depth {depth}")
    if not top_down:
        flat = flat.reshape(h, w, -1)[::-1].reshape(flat.shape)
    img_type = base_type | (8 if rle else 0)
    desc = 0x20 if top_down else 0
    cmap_type = 1 if palette is not None else 0
    cmap_len = len(palette) if palette is not None else 0
    hdr = struct.pack(
        "<BBBHHBHHHHBB",
        0, cmap_type, img_type, 0, cmap_len, 24 if cmap_type else 0,
        0, 0, w, h, depth, desc,
    )
    body = bytearray(hdr)
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        body += pal[:, ::-1].tobytes()  # stored BGR
    bypp = (depth + 7) // 8
    body += _rle_pack(flat, bypp) if rle else flat.tobytes()
    body += struct.pack("<II", 0, 0) + FOOTER_SIG  # v2 footer
    return bytes(body)
