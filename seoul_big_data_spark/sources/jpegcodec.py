"""Baseline JPEG codec — pure stdlib + numpy, no PIL.

Implements the baseline sequential DCT process of the public JPEG
specification (ITU-T T.81 / ISO 10918-1): 8x8 block DCT, uniform scalar
quantization, zigzag run-length + Huffman entropy coding, JFIF YCbCr color.
The decoder handles grayscale and 3-component YCbCr with any 1-2 sampling
factors (4:4:4, 4:2:2, 4:2:0), restart intervals, and multi-table DQT/DHT
segments; progressive (SOF2), arithmetic-coded, and 12-bit streams raise
``NotImplementedError`` at the same documented codec slot the other
compressed formats use (`multimodal.py`).

The encoder is the test-vector generator (the inverse direction), writing
baseline 4:4:4 or 4:2:0 streams with the spec's Annex K example tables
scaled by the usual 5000/q | 200-2q quality formula. Quant and Huffman
tables travel inside the file (DQT/DHT), so decode correctness never
depends on both sides sharing hard-coded constants.

This is a north-star extension (SURVEY.md §2.10 N5); the reference has no
multimodal surface at all. Scale shape: decode runs executor-side inside
Arrow-batched ``mapInPandas`` (see ``multimodal.decode_features``), so
codec cost scales with executors and payload bytes never hit the driver.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg_pixels", "decode_jpeg", "encode_jpeg"]


def _zigzag() -> np.ndarray:
    """Zigzag scan order: position i in the scan -> raster index (T.81 fig 5).
    Generated, not transcribed, so it cannot be mistyped."""
    order = np.empty(64, dtype=np.int64)
    x = y = 0
    for i in range(64):
        order[i] = y * 8 + x
        if (x + y) % 2 == 0:  # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:  # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return order


_ZZ = _zigzag()


def _dct_matrix() -> np.ndarray:
    """8-point DCT-II basis: C[u, x] = a(u) cos((2x+1) u pi / 16). Forward
    2-D DCT of block B is C @ B @ C.T; inverse is C.T @ K @ C."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()

# Annex K example quantization tables (the de-facto default of every
# baseline encoder; public spec tables K.1/K.2), zigzag-ordered on write.
_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K example Huffman specs: (BITS[1..16], HUFFVAL). The encoder writes
# these into DHT; the decoder always rebuilds from the file's own DHT, so
# the exact value ordering only affects compression ratio, never decode
# correctness.
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the spec's canonical code assignment
    (T.81 Annex C): codes of each length are consecutive, lengths ascending."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, the inverse mapping for bit-serial decode."""
    table: dict[tuple[int, int], int] = {}
    for v, (code, length) in _build_huffman_codes(bits, vals).items():
        table[(length, code)] = v
    return table


# --- bit I/O over the entropy-coded segment ---------------------------------


class _BitReader:
    """Bit-serial reader over entropy-coded data with 0xFF00 byte-unstuffing.
    Restart markers (FFD0-FFD7) are consumed only via ``restart()`` at MCU
    boundaries; any other marker ends the scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.bitcnt += 8

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            self._fill()
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in scan")

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.bitcnt = 0
        self.bitbuf = 0
        if not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartHit(Exception):
    """Raised when the reader runs into an RSTn mid-fill (padding bits before
    a restart are discarded by the aligner, so this only fires if the encoder
    under-padded; surfacing it keeps truncation detectable)."""


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per T.81 F.2.2.1: values below the
    midpoint encode negatives."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ----------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """(h, w, channels) uint8, y=0 at top — grayscale (1) or RGB (3).

    Baseline/extended sequential Huffman only (SOF0/SOF1). Progressive,
    arithmetic, hierarchical, and 12-bit streams raise NotImplementedError
    (the documented codec slot)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, [(cid, ch, cv, tq)])
    restart_interval = 0
    scan = None  # ([(comp_idx, dc_id, ac_id)], data_pos)

    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes collapse into the marker
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                p += 17 + nv
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman_decoder(
                    bits, vals
                )
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("12-bit JPEG precision")
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * i]))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) needs a real codec; plug PIL here"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td_ta = seg[2 + 2 * i]
                sel.append((cs, td_ta >> 4, td_ta & 15))
            scan = (sel, pos)
            break  # baseline: single scan; decode below
        # APPn/COM/other: ignored

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    sel, data_pos = scan
    if len(sel) != len(comps):
        raise NotImplementedError("non-interleaved multi-scan JPEG")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component plane (subsampled, MCU-padded) + table bindings
    planes = []
    bindings = []
    for cid, ch, cv, tq in comps:
        pw, ph = 8 * ch * mcus_x, 8 * cv * mcus_y
        planes.append(np.zeros((ph, pw), dtype=np.float64))
        dc_id = ac_id = None
        for cs, td, ta in sel:
            if cs == cid:
                dc_id, ac_id = td, ta
        if dc_id is None:
            raise ValueError("scan does not cover every frame component")
        bindings.append((huff_dc[dc_id], huff_ac[ac_id], quant[tq], ch, cv))

    reader = _BitReader(payload, data_pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            for ci, (dc_tbl, ac_tbl, qtbl, ch, cv) in enumerate(bindings):
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros(64, dtype=np.int64)
                        t = reader.decode_huffman(dc_tbl)
                        preds[ci] += _extend(reader.receive(t), t)
                        coef[0] = preds[ci]
                        k = 0
                        while k < 63:
                            rs = reader.decode_huffman(ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL: sixteen zeros
                                    continue
                                break  # EOB
                            k += r + 1
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[_ZZ[k]] = _extend(reader.receive(s), s)
                        block = (coef.reshape(8, 8) * qtbl).astype(np.float64)
                        px = _C.T @ block @ _C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    # upsample to full grid (sample replication), crop, color-convert
    full = []
    for (cid, ch, cv, _tq), plane in zip(comps, planes):
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out.reshape(h, w, 1)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (CMYK?)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> dict:
    """JPEG -> the typed-metadata dict shape shared by the other raster
    decoders in ``multimodal.py`` (content-derived channel means)."""
    px = decode_jpeg_pixels(payload)
    h, w, channels = px.shape
    n_px = h * w
    sums = px.astype(np.int64).sum(axis=(0, 1))
    if channels == 1:
        r = g = b = int(sums[0]) / n_px
        feat = r
    else:
        r, g, b = (int(sums[i]) / n_px for i in range(3))
        feat = int(sums.sum()) / (3 * n_px)
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "channels": channels,
        "mean_r": r,
        "mean_g": g,
        "mean_b": b,
        "feat_mean": feat,
    }


# --- encoder (test-vector generator) ----------------------------------------


class _BitWriter:
    """Bit accumulator with JPEG 0xFF byte stuffing; pads the tail with 1s
    (the spec's fill-bit convention)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.cnt += length
        while self.cnt >= 8:
            b = (self.acc >> (self.cnt - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.cnt -= 8
            self.acc &= (1 << self.cnt) - 1

    def align(self) -> None:
        if self.cnt:
            pad = 8 - self.cnt
            self.write((1 << pad) - 1, pad)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """The ubiquitous quality mapping: scale = 5000/q below 50, 200-2q
    above; entries clamped to [1, 255]."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_coefficients(
    writer: _BitWriter,
    coef_zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one quantized, zigzag-ordered block; returns the new
    DC predictor."""
    diff = int(coef_zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(coef_zz[0])


def _plane_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization of a (H, W) plane already padded to
    multiples of 8; returns (H//8, W//8, 64) zigzag-ordered int coefficients.
    Fully vectorized: one einsum for every block's 2-D DCT."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coef = np.einsum("ux,ijxy,vy->ijuv", _C, blocks, _C)
    q = np.round(coef / qtbl).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZZ].reshape(ph // 8, pw // 8, 64)


def _pad_to_multiple(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    """Edge-replicate a plane to multiples of (my, mx) — the spec's
    recommended extension, keeps block DCTs free of wrap-around ringing."""
    h, w = plane.shape
    ph = -(-h // my) * my
    pw = -(-w // mx) * mx
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF writer. ``arr`` is (h, w, 1) grayscale or (h, w, 3)
    RGB uint8; ``subsampling`` is '444', '422' (horizontal-only), or
    '420' (color only); ``restart_interval`` > 0 emits DRI + RSTn every N
    MCUs (exercises the decoder's restart path). Tables used are written
    into the stream."""
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("expected (h, w, 1|3) array")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422', or '420'")
    gray = nc == 1
    # luma sampling factors (chroma is always 1x1)
    if gray or subsampling == "444":
        sh = sv = 1
    elif subsampling == "422":
        sh, sv = 2, 1
    else:
        sh = sv = 2

    qy = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)

    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sh > 1 or sv > 1:  # box-mean chroma downsample by (sv, sh)
            def ds(p):
                pp = _pad_to_multiple(p, sv, sh)
                return pp.reshape(
                    pp.shape[0] // sv, sv, pp.shape[1] // sh, sh
                ).mean(axis=(1, 3))

            cb, cr = ds(cb), ds(cr)
        planes = [y, cb, cr]

    # per-component (plane, quant, sampling h, v)
    if gray:
        spec = [(planes[0], qy, 1, 1)]
    else:
        spec = [
            (planes[0], qy, sh, sv),
            (planes[1], qc, 1, 1),
            (planes[2], qc, 1, 1),
        ]
    hmax = max(s[2] for s in spec)
    vmax = max(s[3] for s in spec)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    coefs = []
    for plane, qtbl, ch, cv in spec:
        # edge-replicate exactly to this component's MCU grid
        padded = np.pad(
            plane,
            (
                (0, 8 * cv * mcus_y - plane.shape[0]),
                (0, 8 * ch * mcus_x - plane.shape[1]),
            ),
            mode="edge",
        )
        coefs.append(_plane_blocks(padded, qtbl))

    dc_codes = [_build_huffman_codes(*_DC_LUMA_SPEC)]
    ac_codes = [_build_huffman_codes(*_AC_LUMA_SPEC)]
    if not gray:
        dc_codes.append(_build_huffman_codes(*_DC_CHROMA_SPEC))
        ac_codes.append(_build_huffman_codes(*_AC_CHROMA_SPEC))

    writer = _BitWriter()
    preds = [0] * len(spec)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.align()
                writer.out += bytes((0xFF, 0xD0 + rst_idx))
                rst_idx = (rst_idx + 1) % 8
                preds = [0] * len(spec)
            for ci, (_, _, ch, cv) in enumerate(spec):
                tb = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        zz = coefs[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_coefficients(
                            writer, zz, preds[ci], dc_codes[tb], ac_codes[tb]
                        )
            mcu_count += 1
    writer.align()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qy.reshape(-1)[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc.reshape(-1)[_ZZ].astype(np.uint8)))
    comp_spec = b""
    for ci, (_, _, ch, cv) in enumerate(spec):
        comp_spec += bytes((ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1))
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([len(spec)]) + comp_spec,
    )

    def dht(tc: int, th: int, spec_pair: tuple) -> bytes:
        bits, vals = spec_pair
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(spec)])
    for ci in range(len(spec)):
        tb = 0 if ci == 0 else 1
        sos += bytes((ci + 1, (tb << 4) | tb))
    sos += bytes((0, 63, 0))
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
