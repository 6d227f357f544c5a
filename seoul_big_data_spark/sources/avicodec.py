"""AVI container codec — pure Python/numpy, no external deps.

Parses the public RIFF/AVI layout (hdrl LIST with the avih main header
and the video stream's strh/strf, movi LIST with per-frame chunks) for
the two payload codecs the repo can decode end-to-end:

- DIB ('00db'): uncompressed bottom-up BGR rows, 4-byte-padded — the
  BMP pixel array without its file header. Lossless.
- MJPEG ('00dc', biCompression 'MJPG'): one complete JPEG per frame,
  decoded by the in-repo T.81 codec (`jpegcodec.py`) — the classic
  motion-JPEG form where every frame is independent.

Both forms are intra-only: frames don't reference each other, so frame
sampling is TRUE sample-before-decode (the movi walk is header-only;
unsampled frames never pay pixel cost) — same scale property as
multi-page TIFF, versus delta-coded GIF. The encoder is the test-vector
generator for both codecs.

North-star extension (SURVEY.md §2.10 N5); decode runs executor-side in
Arrow-batched ``mapInPandas`` like every other codec here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_avi_frames", "avi_frame_stats", "encode_avi"]


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size, list_type) over a RIFF chunk
    range; LIST chunks report their list type, others ''."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, body + 4, size - 4, data[body:body + 4]
        else:
            yield fourcc, body, size, b""
        pos = body + size + (size & 1)  # chunks are word-aligned


def _parse_avi(payload: bytes):
    """-> (width, height, fps, codec ('dib'|'mjpg'), [frame bytes...])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = 0
    us_per_frame = 0
    compression = 0
    frames: list[bytes] = []

    def visit(pos: int, end: int) -> None:
        nonlocal width, height, us_per_frame, compression
        for fourcc, body, size, ltype in _walk_chunks(payload, pos, end):
            if fourcc in (b"LIST", b"RIFF"):
                if ltype in (b"hdrl", b"strl", b"movi", b"AVI "):
                    visit(body, body + size)
            elif fourcc == b"avih":
                us_per_frame = struct.unpack_from("<I", payload, body)[0]
                width, height = struct.unpack_from(
                    "<II", payload, body + 32
                )
            elif fourcc == b"strf" and size >= 40:
                compression = struct.unpack_from("<I", payload, body + 16)[0]
            elif fourcc[2:] in (b"db", b"dc") and fourcc[:2].isdigit():
                frames.append(payload[body:body + size])

    visit(12, len(payload))
    if not width or not height:
        raise ValueError("AVI missing avih header")
    if compression == 0:
        codec = "dib"
    elif compression == struct.unpack("<I", b"MJPG")[0]:
        codec = "mjpg"
    else:
        raise NotImplementedError(
            f"AVI codec 0x{compression:08X} needs a real codec; "
            "plug ffmpeg here"
        )
    fps = 1_000_000 / us_per_frame if us_per_frame else 0.0
    return width, height, fps, codec, frames


def _decode_frame(frame: bytes, w: int, h: int, codec: str) -> np.ndarray:
    if codec == "mjpg":
        from .jpegcodec import decode_jpeg_pixels

        px = decode_jpeg_pixels(frame)
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        return px
    # DIB: bottom-up BGR, rows padded to 4 bytes
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    need = h * stride
    if len(frame) < need:
        raise ValueError("truncated AVI DIB frame")
    a = (
        np.frombuffer(frame, dtype=np.uint8, count=need)
        .reshape(h, stride)[:, :row_bytes]
        .reshape(h, w, 3)
    )
    return a[::-1, :, ::-1]  # top-down RGB


def decode_avi_frames(payload: bytes) -> np.ndarray:
    """All frames as (n, h, w, 3) uint8, top-down RGB."""
    w, h, _fps, codec, frames = _parse_avi(payload)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack([_decode_frame(f, w, h, codec) for f in frames])


def avi_frame_stats(payload: bytes, every_k: int = 1) -> list[dict]:
    """Per-frame content statistics for every k-th frame (always
    including frame 0). AVI frames are intra-coded (DIB and MJPEG alike),
    so unsampled frames are NEVER decoded — the movi walk is header-only
    and only sampled frames pay pixel cost."""
    w, h, _fps, codec, frames = _parse_avi(payload)
    out = []
    for i in range(0, len(frames), every_k):
        px = _decode_frame(frames[i], w, h, codec)
        n_px = px.shape[0] * px.shape[1]
        s = px.astype(np.int64).sum(axis=(0, 1))
        out.append(
            {
                "frame_idx": i,
                "n_frames": len(frames),
                "format": "avi/" + codec,
                "width": px.shape[1],
                "height": px.shape[0],
                "mean_r": int(s[0]) / n_px,
                "mean_g": int(s[1]) / n_px,
                "mean_b": int(s[2]) / n_px,
            }
        )
    return out


# --- encoder (test-vector generator) ----------------------------------------


def encode_avi(
    frames: np.ndarray, fps: int = 10, codec: str = "dib", quality: int = 92
) -> bytes:
    """AVI writer for (n, h, w, 3) uint8 frames. ``codec``: 'dib'
    (uncompressed, lossless) or 'mjpg' (each frame through the in-repo
    JPEG encoder at ``quality``)."""
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    if codec == "dib":
        fcc_handler = b"DIB "
        compression = 0
        payloads = []
        row_bytes = w * 3
        stride = (row_bytes + 3) & ~3
        for f in frames:
            bgr = f[::-1, :, ::-1].reshape(h, row_bytes)
            if stride != row_bytes:
                padded = np.zeros((h, stride), dtype=np.uint8)
                padded[:, :row_bytes] = bgr
                payloads.append(padded.tobytes())
            else:
                payloads.append(np.ascontiguousarray(bgr).tobytes())
        frame_id = b"00db"
    elif codec == "mjpg":
        from .jpegcodec import encode_jpeg

        fcc_handler = b"MJPG"
        compression = struct.unpack("<I", b"MJPG")[0]
        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        frame_id = b"00dc"
    else:
        raise ValueError("codec must be 'dib' or 'mjpg'")

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # flags, priority, language, initial, scale, rate, start, length,
    # suggested buffer, quality (-1 = default), sample size, rcFrame
    strh = (
        b"vids" + fcc_handler
        + struct.pack(
            "<IHHIIIIIIiI4h",
            0, 0, 0, 0, 1, fps, 0, n, 0, -1, 0, 0, 0, 0, 0,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, compression,
        sum(len(p) for p in payloads) // max(n, 1), 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(frame_id, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
