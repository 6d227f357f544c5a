"""Windows ICO/CUR container codec — pure stdlib/numpy.

An ICO is a directory of images; each entry is either a PNG stream
(Vista+ icons) or a headerless BMP DIB whose ``biHeight`` covers BOTH the
XOR (color) plane and the trailing 1-bit AND (transparency) mask. The
decoder routes PNG entries through the in-repo PNG codec and DIB entries
through the in-repo BMP decoder by reconstructing the 14-byte
BITMAPFILEHEADER the ICO format strips (and halving the doubled height)
— i.e. the container work is real and the pixel work reuses the audited
raster paths. CUR files differ only in the directory type word and the
meaning of two entry fields (hotspot instead of planes/bpp); both parse.

Layout per the public ICONDIR/ICONDIRENTRY spec: u16 reserved=0,
u16 type (1=icon, 2=cursor), u16 count; then 16-byte entries
(width/height bytes where 0 means 256, color count, reserved,
planes/hotspot-x, bpp/hotspot-y, payload size, payload offset).

Reference scope note: no media in the reference ETL; north-star
multimodal surface (SURVEY.md §2 N5).
"""

from __future__ import annotations

import struct

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_ico_directory(payload: bytes) -> list[dict]:
    """Directory entries as dicts (``width``/``height`` already 256-fixed,
    ``offset``/``size`` bounds-checked against the payload)."""
    if len(payload) < 6:
        raise ValueError("not an ICO payload")
    reserved, ftype, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or ftype not in (1, 2) or count == 0:
        raise ValueError("not an ICO payload")
    entries = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(payload):
            raise ValueError("truncated ICO directory")
        w, h, _colors, _rsv, planes, bpp, size, data_off = struct.unpack_from(
            "<BBBBHHII", payload, off
        )
        if data_off + size > len(payload):
            raise ValueError("ICO entry outside payload")
        entries.append(
            {
                "width": w or 256,
                "height": h or 256,
                "planes": planes,
                "bpp": bpp,
                "size": size,
                "offset": data_off,
                "is_cursor": ftype == 2,
            }
        )
    return entries


def _dib_to_bmp(dib: bytes) -> bytes:
    """Wrap an ICO DIB as a standalone BMP file: restore the file header
    and halve ``biHeight`` (the ICO convention doubles it to cover the AND
    mask, which trails the XOR plane and is not part of the BMP body)."""
    if len(dib) < 40:
        raise ValueError("truncated ICO DIB")
    hdr_size = struct.unpack_from("<I", dib, 0)[0]
    if hdr_size != 40:
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    height = struct.unpack_from("<i", dib, 8)[0]
    bpp = struct.unpack_from("<H", dib, 14)[0]
    clr_used = struct.unpack_from("<I", dib, 32)[0]
    n_pal = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    patched = bytearray(dib)
    struct.pack_into("<i", patched, 8, height // 2)
    data_offset = 14 + hdr_size + 4 * n_pal
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, data_offset)
    return file_hdr + bytes(patched)


def _and_mask_transparent_frac(dib: bytes, width: int, height: int) -> float:
    """Fraction of pixels the AND mask marks transparent (bit=1). Mask rows
    are 1-bit, padded to 32-bit words, stored after the XOR plane."""
    import numpy as np

    hdr_size = struct.unpack_from("<I", dib, 0)[0]
    bpp = struct.unpack_from("<H", dib, 14)[0]
    compression = struct.unpack_from("<I", dib, 16)[0]
    if compression != 0:
        return 0.0  # RLE XOR plane: mask offset not statically known
    clr_used = struct.unpack_from("<I", dib, 32)[0]
    n_pal = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    xor_stride = ((width * bpp + 31) // 32) * 4
    mask_off = hdr_size + 4 * n_pal + xor_stride * height
    mask_stride = ((width + 31) // 32) * 4
    need = mask_stride * height
    raw = dib[mask_off:mask_off + need]
    if len(raw) < need:
        return 0.0  # mask omitted by the writer
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, mask_stride)
    bits = np.unpackbits(rows, axis=1)[:, :width]
    return float(bits.sum()) / float(width * height)


def _best_entry(payload: bytes) -> dict:
    """Largest area, then highest bpp — the convention icon consumers use."""
    entries = parse_ico_directory(payload)
    return max(entries, key=lambda e: (e["width"] * e["height"], e["bpp"]))


def decode_ico_pixels(payload: bytes):
    """(h, w, 3) uint8 RGB, y=0 at top, of the best (largest) image."""
    from .multimodal import _decode_bmp_pixels, _decode_png_pixels

    e = _best_entry(payload)
    blob = payload[e["offset"]:e["offset"] + e["size"]]
    if blob[:8] == _PNG_SIG:
        import numpy as np

        px = _decode_png_pixels(blob)
        if px.shape[2] <= 2:
            return np.repeat(px[:, :, :1], 3, axis=2)
        return px[:, :, :3]
    px = _decode_bmp_pixels(_dib_to_bmp(blob))  # bottom-up BGR
    return px[::-1, :, ::-1]


def decode_ico(payload: bytes) -> dict:
    """Stats-dict form: best image's dimensions + exact channel means; the
    ``channels`` field reports 4 when the AND mask marks any pixel
    transparent (the container's alpha convention), else 3."""
    import numpy as np

    e = _best_entry(payload)
    blob = payload[e["offset"]:e["offset"] + e["size"]]
    px = decode_ico_pixels(payload)
    transparent = 0.0
    if blob[:8] != _PNG_SIG:
        transparent = _and_mask_transparent_frac(
            blob, px.shape[1], px.shape[0]
        )
    sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    n_px = px.shape[0] * px.shape[1]
    return {
        "format": "cur" if e["is_cursor"] else "ico",
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": 4 if transparent > 0 else 3,
        "mean_r": int(sums[0]) / n_px,
        "mean_g": int(sums[1]) / n_px,
        "mean_b": int(sums[2]) / n_px,
        "feat_mean": int(sums.sum()) / (3 * n_px),
    }


def encode_ico(bmp_or_png_files: list[bytes], cursor: bool = False) -> bytes:
    """Test-vector inverse: wrap standalone BMP or PNG files as one ICO.

    BMP inputs are converted to the DIB convention (file header stripped,
    height doubled, all-opaque AND mask appended); PNG inputs embed
    whole. Entry width/height bytes follow the 0-means-256 rule.
    """
    entries = []
    payloads = []
    for blob in bmp_or_png_files:
        if blob[:8] == _PNG_SIG:
            w = int.from_bytes(blob[16:20], "big")
            h = int.from_bytes(blob[20:24], "big")
            bpp = 32
            payloads.append(blob)
        elif blob[:2] == b"BM":
            data_offset = struct.unpack_from("<I", blob, 10)[0]
            hdr_size = struct.unpack_from("<I", blob, 14)[0]
            if hdr_size != 40:
                raise ValueError("encode_ico needs BITMAPINFOHEADER BMPs")
            w, h = struct.unpack_from("<ii", blob, 18)
            bpp = struct.unpack_from("<H", blob, 28)[0]
            dib = bytearray(blob[14:])
            struct.pack_into("<i", dib, 8, h * 2)  # ICO doubled height
            mask_stride = ((w + 31) // 32) * 4
            dib += b"\x00" * (mask_stride * h)  # all-opaque AND mask
            # palette copied implicitly: it sits between header and pixels,
            # and data_offset-14 bytes of header+palette precede the body
            del data_offset
            payloads.append(bytes(dib))
        else:
            raise ValueError("encode_ico takes BMP or PNG payloads")
        if not (0 < w <= 256 and 0 < h <= 256):
            raise ValueError("ICO images are at most 256x256")
        entries.append((w % 256, h % 256, bpp))
    out = bytearray(struct.pack("<HHH", 0, 2 if cursor else 1, len(entries)))
    offset = 6 + 16 * len(entries)
    for (w8, h8, bpp), blob in zip(entries, payloads):
        out += struct.pack(
            "<BBBBHHII", w8, h8, 0, 0, 1, bpp, len(blob), offset
        )
        offset += len(blob)
    for blob in payloads:
        out += blob
    return bytes(out)
