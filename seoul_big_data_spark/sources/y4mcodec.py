"""YUV4MPEG2 (.y4m) video codec — pure Python/numpy, no external deps.

Y4M is the raw-video interchange container the ffmpeg/mjpegtools
ecosystem uses: a self-describing ASCII stream header
(``YUV4MPEG2 W<w> H<h> F<n>:<d> [Ip] [A1:1] [C<space>]``) followed by
``FRAME``-delimited uncompressed planar YCbCr frames. Everything needed
to decode is IN the header — no tabulated entropy state — which is what
makes the format fully closable here, unlike MP3/arithmetic-JPEG.

Supported colorspaces: C420 (+jpeg/paldv tags — identical plane
geometry), C422, C444, Cmono. Frames are intra-only and FIXED-SIZE per
stream, so frame sampling is the strongest form of sample-before-decode
in the repo: after the first frame header the k-th frame's byte offset
is arithmetic — unsampled frames are never even sliced, let alone
decoded (cf. AVI's header-only movi walk, TIFF's page directory).

Plane-level decode is LOSSLESS (raw bytes reshaped). RGB conversion
uses the same full-range BT.601 matrix as the in-repo JPEG codec, so a
Y4M frame and a JFIF image of the same YCbCr content agree bit-for-bit
before rounding; chroma upsampling is sample replication, also matching
the JPEG path. The encoder is the test-vector inverse (RGB or native
YUV planes in, stream out).

North-star extension (SURVEY.md §2.10 N5); decode runs executor-side in
Arrow-batched ``mapInPandas`` like every other codec here.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "decode_y4m_planes",
    "decode_y4m_frames",
    "y4m_frame_stats",
    "encode_y4m",
    "encode_y4m_planes",
]

_MAGIC = b"YUV4MPEG2"

# colorspace tag -> (chroma horizontal divisor, vertical divisor, n_planes)
_CSP = {
    "420": (2, 2, 3),
    "420jpeg": (2, 2, 3),
    "420paldv": (2, 2, 3),
    "420mpeg2": (2, 2, 3),
    "422": (2, 1, 3),
    "444": (1, 1, 3),
    "mono": (0, 0, 1),
}


def _parse_header(payload: bytes):
    """(width, height, csp_tag, first_frame_pos). Unknown parameter tags
    are ignored per the format's extension rule; W and H are mandatory."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    csp = "420jpeg"  # the format's documented default
    for tok in payload[len(_MAGIC):nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "C":
            if val not in _CSP:
                raise NotImplementedError(f"Y4M colorspace C{val}")
            csp = val
    if not w or not h or w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    ch, cv, _n = _CSP[csp]
    if ch and (w % ch or h % cv):
        raise ValueError(f"Y4M C{csp} needs dimensions divisible by {ch}x{cv}")
    return w, h, csp, nl + 1


def _frame_size(w: int, h: int, csp: str) -> int:
    ch, cv, n_planes = _CSP[csp]
    if n_planes == 1:
        return w * h
    return w * h + 2 * (w // ch) * (h // cv)


def _iter_frame_offsets(payload: bytes, pos: int, fsize: int):
    """Yield (data_start, data_end) per frame. Each frame header is one
    ASCII line starting with FRAME (optional parameters follow); the
    payload after the newline is exactly ``fsize`` bytes."""
    n = len(payload)
    while pos < n:
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        nl = payload.find(b"\n", pos)
        if nl < 0:
            raise ValueError("truncated Y4M frame header")
        start = nl + 1
        end = start + fsize
        if end > n:
            raise ValueError("truncated Y4M frame data")
        yield start, end
        pos = end


def decode_y4m_planes(payload: bytes):
    """[(Y, U, V) or (Y,) per frame] — byte-lossless plane arrays."""
    w, h, csp, pos = _parse_header(payload)
    ch, cv, n_planes = _CSP[csp]
    fsize = _frame_size(w, h, csp)
    out = []
    for start, _end in _iter_frame_offsets(payload, pos, fsize):
        y = np.frombuffer(payload, np.uint8, w * h, start).reshape(h, w)
        if n_planes == 1:
            out.append((y,))
            continue
        cw, chh = w // ch, h // cv
        usz = cw * chh
        u = np.frombuffer(payload, np.uint8, usz, start + w * h).reshape(chh, cw)
        v = np.frombuffer(
            payload, np.uint8, usz, start + w * h + usz
        ).reshape(chh, cw)
        out.append((y, u, v))
    if not out:
        raise ValueError("Y4M contains no frames")
    return out


def _planes_to_rgb(planes, w: int, h: int) -> np.ndarray:
    """Full-range BT.601 (the JFIF matrix, same as jpegcodec) with
    replication chroma upsampling."""
    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    y, u, v = (p.astype(np.float64) for p in planes)
    u = np.repeat(np.repeat(u, h // u.shape[0], axis=0), w // u.shape[1], axis=1)
    v = np.repeat(np.repeat(v, h // v.shape[0], axis=0), w // v.shape[1], axis=1)
    r = y + 1.402 * (v - 128.0)
    g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
    b = y + 1.772 * (u - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def decode_y4m_frames(payload: bytes) -> np.ndarray:
    """All frames as (n, h, w, 3) uint8 RGB, top-down."""
    w, h, _csp, _pos = _parse_header(payload)
    return np.stack(
        [_planes_to_rgb(p, w, h) for p in decode_y4m_planes(payload)]
    )


def y4m_frame_stats(payload: bytes, every_k: int = 1) -> list[dict]:
    """Per-frame stats for every k-th frame. Fixed frame size makes the
    stream arithmetic-seekable: unsampled frames are never touched."""
    w, h, csp, pos = _parse_header(payload)
    fsize = _frame_size(w, h, csp)
    offsets = list(_iter_frame_offsets(payload, pos, fsize))
    out = []
    for i in range(0, len(offsets), every_k):
        start, _end = offsets[i]
        # decode just this frame: planes sliced at the known offset
        y = np.frombuffer(payload, np.uint8, w * h, start).reshape(h, w)
        ch, cv, n_planes = _CSP[csp]
        if n_planes == 1:
            planes = (y,)
        else:
            cw, chh = w // ch, h // cv
            usz = cw * chh
            planes = (
                y,
                np.frombuffer(payload, np.uint8, usz, start + w * h).reshape(
                    chh, cw
                ),
                np.frombuffer(
                    payload, np.uint8, usz, start + w * h + usz
                ).reshape(chh, cw),
            )
        px = _planes_to_rgb(planes, w, h)
        n_px = w * h
        s = px.astype(np.int64).sum(axis=(0, 1))
        out.append(
            {
                "frame_idx": i,
                "n_frames": len(offsets),
                "format": f"y4m/C{csp}",
                "width": w,
                "height": h,
                "mean_r": int(s[0]) / n_px,
                "mean_g": int(s[1]) / n_px,
                "mean_b": int(s[2]) / n_px,
            }
        )
    return out


def encode_y4m_planes(frames_planes, w: int, h: int, csp: str = "420jpeg") -> bytes:
    """Native-YUV writer (byte-lossless inverse of
    :func:`decode_y4m_planes`)."""
    if csp not in _CSP:
        raise ValueError(f"unsupported colorspace C{csp}")
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{csp}\n".encode("ascii")
    )
    for planes in frames_planes:
        out += b"FRAME\n"
        for p in planes:
            out += np.ascontiguousarray(p, dtype=np.uint8).tobytes()
    return bytes(out)


def encode_y4m(frames_rgb, csp: str = "444") -> bytes:
    """RGB writer (test-vector generator): full-range BT.601 forward
    matrix (the JFIF one), box-mean chroma downsampling for 420/422 —
    both matching the in-repo JPEG encoder's conventions."""
    frames_rgb = np.asarray(frames_rgb, dtype=np.uint8)
    n, h, w, _c = frames_rgb.shape
    ch, cv, n_planes = _CSP[csp]
    planes_per_frame = []
    for f in range(n):
        a = frames_rgb[f].astype(np.float64)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        if n_planes == 1:
            planes_per_frame.append(
                (np.clip(np.round(y), 0, 255).astype(np.uint8),)
            )
            continue
        u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if ch > 1 or cv > 1:
            u = u.reshape(h // cv, cv, w // ch, ch).mean(axis=(1, 3))
            v = v.reshape(h // cv, cv, w // ch, ch).mean(axis=(1, 3))
        planes_per_frame.append(
            tuple(
                np.clip(np.round(p), 0, 255).astype(np.uint8)
                for p in (y, u, v)
            )
        )
    return encode_y4m_planes(planes_per_frame, w, h, csp)
