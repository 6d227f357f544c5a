"""Pixel-array operations for the multimodal column family — NOT a codec.

The codec layer (sources/*codec.py, sources/multimodal.py) is frozen; this
module holds the pure-numpy array transforms that run BETWEEN decode and
feature extraction (the brief's decode / feature-extract / RESIZE /
frame-sample stage list). Everything is deterministic float64 — no
interpolation-library dependence, so thumbnails are bit-stable across runs
and hosts.
"""

from __future__ import annotations


def resize_area_mean(arr, th: int, tw: int):
    """Area-averaging (box-mean) resize of an (h, w, c) uint8/float array to
    (th, tw, c) float64.

    Each target cell (ty, tx) averages the source block
    rows [floor(ty*h/th), floor((ty+1)*h/th)) x cols likewise — the exact
    integral partition, correct for non-divisible sizes (blocks differ by
    at most one row/col) and equal to the classic box filter when they
    divide. Deterministic: int64 accumulation, one float64 division per
    cell; constant images stay exactly constant.
    """
    import numpy as np

    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if h == 0 or w == 0 or th <= 0 or tw <= 0:
        raise ValueError(f"resize_area_mean: bad shape {(h, w)} -> {(th, tw)}")
    ys = [(ty * h) // th for ty in range(th + 1)]
    xs = [(tx * w) // tw for tx in range(tw + 1)]
    a64 = a.astype(np.int64) if a.dtype.kind in "iu" else a.astype(np.float64)
    out = np.empty((th, tw, c), dtype=np.float64)
    for ty in range(th):
        y0, y1 = ys[ty], max(ys[ty + 1], ys[ty] + 1)
        row = a64[y0:y1]
        for tx in range(tw):
            x0, x1 = xs[tx], max(xs[tx + 1], xs[tx] + 1)
            block = row[:, x0:x1]
            out[ty, tx] = block.sum(axis=(0, 1)) / float(
                block.shape[0] * block.shape[1]
            )
    return out
