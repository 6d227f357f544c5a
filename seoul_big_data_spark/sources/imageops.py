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
    ys = np.array([(ty * h) // th for ty in range(th + 1)], dtype=np.int64)
    xs = np.array([(tx * w) // tw for tx in range(tw + 1)], dtype=np.int64)
    a64 = a.astype(np.int64) if a.dtype.kind in "iu" else a.astype(np.float64)
    # Vectorized block sums via add.reduceat (the per-cell python loop was
    # ~2.5 ms/image — a weak-scaling straggler at x32). reduceat's
    # duplicate-edge semantics (equal consecutive indices -> the single
    # element at that index) are EXACTLY the floor-grid guard "blocks have
    # at least one row/col, overlapping when target > source": integer
    # inputs sum exactly, so values are bit-identical to the loop form.
    rows = np.add.reduceat(a64, ys[:-1], axis=0)
    sums = np.add.reduceat(rows, xs[:-1], axis=1)
    ry = np.maximum(np.diff(ys), 1).astype(np.float64)
    rx = np.maximum(np.diff(xs), 1).astype(np.float64)
    counts = ry[:, None] * rx[None, :]
    return sums / counts[:, :, None]
