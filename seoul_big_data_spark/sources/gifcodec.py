"""GIF codec — pure Python/numpy, no external deps.

Implements the public GIF87a/GIF89a specification: variable-width LZW
decompression (dictionary growth to 12 bits, clear/EOI codes, the KwKwK
case), global and local color tables, interlacing (the four-pass row
order), and GIF89a animation — graphic-control extensions with per-frame
transparency and disposal methods 0-3 (unspecified / keep / restore-
background / restore-previous), composited onto one canvas.

The encoder is the test-vector generator: palettizes frames whose color
count fits a single table, writes real LZW (same variable-width growth and
4096-entry reset the decoder implements, with the standard one-step-later
width change on the encode side), optional interlacing and per-frame
transparency-keyed deltas.

Scale shape mirrors the other codecs (`multimodal.py`): decode runs
executor-side inside Arrow-batched ``mapInPandas``. GIF animation is
delta-coded, so frame sampling cannot skip the LZW pass of unsampled
frames (each frame composites over the last) — but it CAN skip their
statistics/snapshot cost: ``gif_frame_stats`` walks all frames over one
canvas and only materializes work at sampled indices. This is a real
property of the format, documented rather than hidden (contrast the
PPM-stream container, where sampling skips decode entirely).

North-star extension (SURVEY.md §2.10 N5); the reference has no multimodal
surface at all.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_gif_frames",
    "decode_gif",
    "encode_gif",
    "gif_frame_stats",
]


# --- LZW (GIF variant: little-endian bit packing, per-image code size) ------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Decode a GIF LZW stream into palette indices. Codes are packed
    LSB-first; the dictionary resets on CLEAR, grows to 4096 entries, and
    the width bumps when the next free code would not fit."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    next_code = eoi + 1

    out: list[int] = []
    acc = 0
    acc_bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << acc_bits
        acc_bits += 8
        while acc_bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            acc_bits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError("corrupt LZW stream (code beyond table)")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + [entry[0]])
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF LZW encoder matched to ``_lzw_decode``: emits CLEAR up front,
    resets at 4096 entries, and changes width one code later than the
    decoder's growth point (the classic encode-side off-by-one)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    def fresh() -> tuple[dict, int, int]:
        return (
            {(i,): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, code_size = fresh()
    emit(clear, code_size)
    prefix: tuple = ()
    for sym in indices:
        sym = int(sym)
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code > 4095:
            emit(clear, code_size)
            table, next_code, code_size = fresh()
        prefix = (sym,)
    if prefix:
        emit(table[prefix], code_size)
    emit(eoi, code_size)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container parsing ------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) per pass


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced row data (h, w) into display order."""
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _iter_frames(payload: bytes):
    """Yield (frame_index, canvas) for every frame, composited in display
    order over one shared canvas; the caller snapshots what it samples.
    The final StopIteration value is the frame count."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        gct = gct.reshape(n, 3)
        pos += 3 * n

    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(
        3, dtype=np.uint8
    )
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb

    transparent = None  # transparency index for the NEXT image
    disposal = 0
    frame_idx = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                packed = payload[pos + 1]
                disposal = (packed >> 2) & 0x07
                transparent = payload[pos + 4] if packed & 1 else None
                pos += 1 + size
            while payload[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        else:
            lct = gct
        if lct is None:
            raise ValueError("GIF image with no color table")
        interlaced = bool(iflags & 0x40)
        min_code = payload[pos]
        pos += 1
        chunks = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            chunks += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        idx = np.array(_lzw_decode(bytes(chunks), min_code), dtype=np.int64)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF image data")
        idx = idx[: iw * ih].reshape(ih, iw)
        if interlaced:
            idx = _deinterlace(idx)

        if disposal == 3:
            saved = canvas[top:top + ih, left:left + iw].copy()
        region = canvas[top:top + ih, left:left + iw]
        if transparent is None:
            region[:, :] = lct[idx]
        else:
            opaque = idx != transparent
            region[opaque] = lct[idx[opaque]]
        yield frame_idx, canvas
        if disposal == 2:  # restore background
            canvas[top:top + ih, left:left + iw] = bg_rgb
        elif disposal == 3:  # restore previous
            canvas[top:top + ih, left:left + iw] = saved
        transparent = None
        disposal = 0
        frame_idx += 1
    return


def decode_gif_frames(payload: bytes) -> np.ndarray:
    """All frames of a GIF, composited, as (n_frames, h, w, 3) uint8."""
    frames = [canvas.copy() for _, canvas in _iter_frames(payload)]
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)


def gif_frame_stats(payload: bytes, every_k: int = 1) -> list[dict]:
    """Per-frame content statistics for every k-th frame (always including
    frame 0) — one pass, one canvas, stats only at sampled indices. The
    LZW pass runs for every frame (GIF is delta-coded; skipping it would
    corrupt later frames), but the per-frame numpy reductions — the wide
    part at scale — are sampled."""
    sampled: list[dict] = []
    n = 0
    for i, canvas in _iter_frames(payload):
        n = i + 1
        if i % every_k:
            continue
        s = canvas.astype(np.int64).sum(axis=(0, 1))
        n_px = canvas.shape[0] * canvas.shape[1]
        sampled.append(
            {
                "frame_idx": i,
                "format": "gif",
                "width": canvas.shape[1],
                "height": canvas.shape[0],
                "mean_r": int(s[0]) / n_px,
                "mean_g": int(s[1]) / n_px,
                "mean_b": int(s[2]) / n_px,
            }
        )
    for row in sampled:
        row["n_frames"] = n
    return sampled


def decode_gif(payload: bytes) -> dict:
    """First frame → the typed-metadata dict shape the other raster
    decoders produce."""
    for _, canvas in _iter_frames(payload):
        h, w, _ = canvas.shape
        n_px = h * w
        s = canvas.astype(np.int64).sum(axis=(0, 1))
        return {
            "format": "gif",
            "width": w,
            "height": h,
            "channels": 3,
            "mean_r": int(s[0]) / n_px,
            "mean_g": int(s[1]) / n_px,
            "mean_b": int(s[2]) / n_px,
            "feat_mean": int(s.sum()) / (3 * n_px),
        }
    raise ValueError("GIF contains no image data")


# --- encoder (test-vector generator) ----------------------------------------


def _palettize(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3), per-frame index arrays) for frames whose combined
    color count fits one 256-entry table; raises otherwise (the encoder is
    a test generator, not a quantizer)."""
    flat = frames.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors exceed one GIF color table; "
            "quantize first"
        )
    return palette, inverse.reshape(frames.shape[:3])


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray,
    interlace: bool = False,
    delta: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """GIF89a writer for (n, h, w, 3) or (h, w, 3) uint8 frames with ≤256
    distinct colors total. ``delta=True`` encodes frames 1.. as
    transparency-keyed deltas against the previous frame (unchanged pixels
    become the transparent index — exercises the decoder's GCE/compositing
    path); ``interlace`` writes the four-pass row order."""
    if frames.ndim == 3:
        frames = frames[None]
    n_frames, h, w, _ = frames.shape
    palette, idx = _palettize(frames)
    # transparency needs one spare slot
    trans_idx = len(palette) if delta and n_frames > 1 else None
    n_slots = len(palette) + (1 if trans_idx is not None else 0)
    depth = max(1, (max(n_slots, 2) - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, depth)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    if n_frames > 1:
        # Netscape looping application extension (public de-facto standard)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    prev = None
    for f in range(n_frames):
        plane = idx[f]
        if trans_idx is not None:
            out += b"\x21\xf9\x04" + bytes(
                ((1 if (delta and f > 0) else 0),)
            ) + struct.pack("<H", delay_cs) + bytes(
                (trans_idx if (delta and f > 0) else 0, 0)
            )
            if delta and f > 0:
                plane = np.where(plane == prev, trans_idx, plane)
        elif n_frames > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        rows = plane
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            rows = plane[order]
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), min_code))
        prev = idx[f]
    out += b"\x3b"
    return bytes(out)
