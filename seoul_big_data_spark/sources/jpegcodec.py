"""JPEG codec (baseline + progressive) — pure stdlib + numpy, no PIL.

Implements the baseline sequential DCT process of the public JPEG
specification (ITU-T T.81 / ISO 10918-1): 8x8 block DCT, uniform scalar
quantization, zigzag run-length + Huffman entropy coding, JFIF YCbCr color.
The decoder handles grayscale and 3-component YCbCr with any 1-2 sampling
factors (4:4:4, 4:2:2, 4:2:0), restart intervals, multi-table DQT/DHT
segments, and — r4 — the PROGRESSIVE process (SOF2): spectral selection,
successive approximation, EOBn end-of-band runs, and the refinement
correction-bit algorithm, accumulated across scans into a coefficient
store and reconstructed once at EOI. A completed progressive stream
decodes BIT-IDENTICALLY to the equivalent baseline stream (pinned in
tests). The EXTENDED SEQUENTIAL process (SOF1) with 12-bit precision
decodes and encodes too: 16-bit DQT entries (Pq=1), extended-range
Huffman tables, 2048 level shift, output reduced to the standard
top-byte 8-bit view — and composes with the progressive process:
12-bit SOF2 streams decode bit-identically to their 12-bit sequential
twins (the scans are coefficient-domain; only the level shift, DQT
width, and the extended DC / category-14 progressive AC tables change).
The LOSSLESS process (SOF3, Annex H) decodes and
encodes too: all seven predictors, point transform, precisions 2-16,
the category-16 diff special case — bit-exact roundtrip by
construction (the DNG/medical-imaging JPEG process). Arithmetic-coded
streams raise ``NotImplementedError`` at the same documented codec slot
the other compressed formats use (`multimodal.py`).

The encoders are the test-vector generators (the inverse direction):
baseline 4:4:4/4:2:2/4:2:0 with the spec's Annex K example tables scaled
by the usual 5000/q | 200-2q quality formula, and a progressive writer
whose scan script exercises both spectral bands and both successive-
approximation passes. Quant and Huffman tables travel inside the file
(DQT/DHT — the progressive AC table ships its EOBn symbols mid-stream),
so decode correctness never depends on both sides sharing hard-coded
constants.

This is a north-star extension (SURVEY.md §2.10 N5); the reference has no
multimodal surface at all. Scale shape: decode runs executor-side inside
Arrow-batched ``mapInPandas`` (see ``multimodal.decode_features``), so
codec cost scales with executors and payload bytes never hit the driver.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_jpeg_pixels",
    "decode_jpeg",
    "encode_jpeg",
    "encode_jpeg_progressive",
    "encode_jpeg_lossless",
]


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


# --- progressive scan primitives (T.81 G.2; bit order matches IJG) ----------


def _prog_dc_first(reader, dc_tbl, pred: int, Al: int):
    """First DC scan: normal diff decode, value scaled by the point
    transform. Returns (new predictor, coefficient value)."""
    t = reader.decode_huffman(dc_tbl)
    pred += _extend(reader.receive(t), t)
    return pred, pred << Al


def _prog_ac_first(reader, ac_tbl, coef, Ss, Se, Al, eobrun):
    """First AC scan for one block (single-component scans only, per
    spec): run-length symbols with EOBn end-of-band runs; values carry
    the point transform. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = reader.decode_huffman(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > Se:
            raise ValueError("AC run past band end")
        coef[_ZZ[k]] = _extend(reader.receive(s), s) << Al
        k += 1
    return eobrun


def _prog_ac_refine(reader, ac_tbl, coef, Ss, Se, Al, eobrun):
    """AC refinement scan for one block: one correction bit per
    already-nonzero coefficient crossed, new coefficients appear as
    +/-(1<<Al). Signed & p1 is a valid history test because every
    magnitude entering this scan is a multiple of 1<<(Al+1). Returns the
    remaining EOB run."""
    p1 = 1 << Al
    m1 = -p1
    k = Ss

    def correct(kk: int) -> None:
        c = coef[_ZZ[kk]]
        if c != 0 and reader.read_bit() and (c & p1) == 0:
            coef[_ZZ[kk]] = c + (p1 if c >= 0 else m1)

    if eobrun == 0:
        while k <= Se:
            rs = reader.decode_huffman(ac_tbl)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break  # current block joins the EOB run below
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement symbol with s > 1")
                val = p1 if reader.read_bit() else m1
            while k <= Se:
                c = coef[_ZZ[k]]
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coef[_ZZ[k]] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                coef[_ZZ[k]] = val
            k += 1
    if eobrun > 0:
        while k <= Se:
            correct(k)
            k += 1
        eobrun -= 1
    return eobrun


# --- decoder ----------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """(h, w, channels) uint8, y=0 at top — grayscale (1) or RGB (3).

    Sequential Huffman (SOF0/SOF1, 8-bit; SOF1 also 12-bit, reduced to
    the top-byte 8-bit view) and progressive (SOF2, r4: spectral
    selection + successive approximation, multi-scan). Arithmetic,
    hierarchical, and 12-bit progressive streams raise
    NotImplementedError (the documented codec slot)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, [(cid, ch, cv, tq)])
    restart_interval = 0
    scan = None  # ([(comp_idx, dc_id, ac_id)], data_pos)
    progressive = False
    lossless = False
    coef_store = None  # per-component (rows, cols, 64) accumulated coefs

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
                tbl = np.zeros(64, dtype=np.int64)
                if pq == 0:
                    tbl[_ZZ] = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                elif pq == 1:  # 16-bit entries (12-bit precision streams)
                    tbl[_ZZ] = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    raise ValueError(f"bad DQT element precision {pq}")
                quant[tq] = tbl.reshape(8, 8)
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # Huffman SOF family
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            precision = seg[0]
            # T.81: baseline (SOF0) is 8-bit only; extended sequential
            # (SOF1) and progressive (SOF2) also allow 12; the LOSSLESS
            # process (SOF3, Annex H) allows 2-16.
            if lossless:
                if not 2 <= precision <= 16:
                    raise ValueError(f"bad lossless precision {precision}")
            elif not (
                precision == 8 or (precision == 12 and marker in (0xC1, 0xC2))
            ):
                raise NotImplementedError(
                    f"JPEG precision {precision} with SOF{marker - 0xC0}"
                )
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * i]))
            frame = (w, h, comps, precision)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (arithmetic/"
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
            if lossless:
                ss = seg[1 + 2 * ns]  # predictor selector 1-7
                al = seg[3 + 2 * ns] & 15  # point transform Pt
                return _decode_lossless_scan(
                    payload, pos, sel, ss, al, frame, huff_dc,
                    restart_interval,
                )
            if not progressive:
                scan = (sel, pos)
                break  # sequential: single scan; decode below
            # progressive: decode this scan in place, then keep parsing
            if frame is None:
                raise ValueError("SOS before SOF")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            w, h, comps, _prec = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            if coef_store is None:
                coef_store = [
                    np.zeros((cv * mcus_y, ch * mcus_x, 64), dtype=np.int64)
                    for _cid, ch, cv, _tq in comps
                ]
            pos = _decode_prog_scan(
                payload, pos, sel, ss, se, ah_al >> 4, ah_al & 15,
                comps, coef_store, huff_dc, huff_ac,
                hmax, vmax, w, h, mcus_x, mcus_y, restart_interval,
            )
        # APPn/COM/other: ignored

    if progressive:
        if frame is None or coef_store is None:
            raise ValueError("progressive JPEG missing SOF/SOS")
        w, h, comps, _prec = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mid = float(1 << (_prec - 1))  # 128 at 8-bit, 2048 at 12-bit
        planes = []
        for (cid, ch, cv, tq), blocks in zip(comps, coef_store):
            qtbl = quant[tq].astype(np.float64)
            rows, cols = blocks.shape[:2]
            deq = blocks.reshape(rows, cols, 8, 8).astype(np.float64) * qtbl
            px = np.einsum("ux,ijuv,vy->ijxy", _C, deq, _C) + mid
            planes.append(px.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8))
        return _assemble_output(comps, planes, hmax, vmax, w, h, _prec)

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps, precision = frame
    mid = float(1 << (precision - 1))
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
                        px = _C.T @ block @ _C + mid
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    return _assemble_output(comps, planes, hmax, vmax, w, h, precision)


def _assemble_output(comps, planes, hmax, vmax, w, h, precision=8) -> np.ndarray:
    """Upsample component planes to the full grid (sample replication),
    crop, and color-convert — shared by the sequential and progressive
    decode paths. 12-bit samples clamp to [0, 4095] and reduce to the
    standard top-byte 8-bit view (same convention as 16-bit TIFF/PNG)."""
    mid = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    shift = precision - 8

    def finish(vals: np.ndarray) -> np.ndarray:
        out = np.clip(np.round(vals), 0, maxv).astype(np.int64)
        return (out >> shift).astype(np.uint8) if shift else out.astype(np.uint8)

    full = []
    for (cid, ch, cv, _tq), plane in zip(comps, planes):
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return finish(full[0]).reshape(h, w, 1)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (CMYK?)")
    y, cb, cr = full
    r = y + 1.402 * (cr - mid)
    g = y - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b = y + 1.772 * (cb - mid)
    return finish(np.stack([r, g, b], axis=2))


def _decode_prog_scan(
    payload, pos, sel, ss, se, ah, al, comps, coef_store, huff_dc, huff_ac,
    hmax, vmax, w, h, mcus_x, mcus_y, restart_interval,
) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    store; returns the byte offset of the next marker. DC scans may be
    interleaved; AC scans cover exactly one component (per spec) and
    iterate its own block raster (ceil dims, not the MCU-padded grid)."""
    reader = _BitReader(payload, pos)
    idxs = []
    for cs, td, ta in sel:
        matches = [i for i, c in enumerate(comps) if c[0] == cs]
        if not matches:
            raise ValueError(f"scan references unknown component {cs}")
        idxs.append((matches[0], td, ta))
    eobrun = 0
    unit = 0

    def restart_due() -> bool:
        return bool(restart_interval) and unit > 0 and unit % restart_interval == 0

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        preds = [0] * len(idxs)
        if len(idxs) > 1:  # interleaved over MCUs
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_due():
                        reader.restart()
                        preds = [0] * len(idxs)
                    for si, (ci, td, _ta) in enumerate(idxs):
                        _cid, ch, cv, _tq = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                coef = coef_store[ci][my * cv + by, mx * ch + bx]
                                if ah == 0:
                                    preds[si], coef[0] = _prog_dc_first(
                                        reader, huff_dc[td], preds[si], al
                                    )
                                elif reader.read_bit():
                                    coef[0] |= 1 << al
                    unit += 1
        else:  # single component: raster over its own block grid
            ci, td, _ta = idxs[0]
            _cid, ch, cv, _tq = comps[ci]
            comp_w = -(-(w * ch) // hmax)
            comp_h = -(-(h * cv) // vmax)
            cols = -(-comp_w // 8)
            rows = -(-comp_h // 8)
            for r_ in range(rows):
                for c_ in range(cols):
                    if restart_due():
                        reader.restart()
                        preds = [0]
                    coef = coef_store[ci][r_, c_]
                    if ah == 0:
                        preds[0], coef[0] = _prog_dc_first(
                            reader, huff_dc[td], preds[0], al
                        )
                    elif reader.read_bit():
                        coef[0] |= 1 << al
                    unit += 1
    else:  # AC scan: exactly one component
        if len(idxs) != 1:
            raise ValueError("interleaved AC scan is not allowed")
        ci, _td, ta = idxs[0]
        _cid, ch, cv, _tq = comps[ci]
        comp_w = -(-(w * ch) // hmax)
        comp_h = -(-(h * cv) // vmax)
        cols = -(-comp_w // 8)
        rows = -(-comp_h // 8)
        for r_ in range(rows):
            for c_ in range(cols):
                if restart_due():
                    reader.restart()
                    eobrun = 0
                coef = coef_store[ci][r_, c_]
                if ah == 0:
                    eobrun = _prog_ac_first(
                        reader, huff_ac[ta], coef, ss, se, al, eobrun
                    )
                else:
                    eobrun = _prog_ac_refine(
                        reader, huff_ac[ta], coef, ss, se, al, eobrun
                    )
                unit += 1

    # advance past padding bits to the next marker
    p = reader.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            break
        p += 1
    return p


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


def _scale_quant(base: np.ndarray, quality: int, precision: int = 8) -> np.ndarray:
    """The ubiquitous quality mapping: scale = 5000/q below 50, 200-2q
    above; entries clamped to [1, 255]. For 12-bit samples the scaled
    table shifts up by the precision delta (entries x16, 16-bit DQT) so
    the quantized coefficients land in the same range as the 8-bit
    pipeline — the standard way libjpeg-style encoders extend Annex K."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
    return tbl << (precision - 8) if precision > 8 else tbl


# 12-bit Huffman table specs (tables always travel in-stream, so any valid
# prefix code works): DC categories 0..15 as a flat 5-bit code (16/32
# Kraft, all-ones unused), AC symbols (run<<4)|size for size 1..14 plus
# EOB and ZRL = 226 symbols as a flat 8-bit code (226/256 Kraft, all-ones
# unused) — same construction as the progressive writer's table.
_DC_12BIT_SPEC = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
_AC_12BIT_SPEC = (
    [0] * 7 + [226] + [0] * 8,
    sorted(
        [(r << 4) | s for r in range(16) for s in range(1, 15)]
        + [0x00, 0xF0]
    ),
)


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


def _plane_blocks(plane: np.ndarray, qtbl: np.ndarray, mid: float = 128.0) -> np.ndarray:
    """Forward DCT + quantization of a (H, W) plane already padded to
    multiples of 8; returns (H//8, W//8, 64) zigzag-ordered int coefficients.
    Fully vectorized: one einsum for every block's 2-D DCT."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - mid
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


def _prepare_components(arr: np.ndarray, quality: int, subsampling: str,
                        precision: int = 8):
    """Shared encoder front half: color transform, chroma downsample,
    MCU-grid padding, per-block DCT + quantization. Returns
    (gray, spec [(qtbl, ch, cv)], coefs [per-component (by, bx, 64)
    zigzag ints], mcus_x, mcus_y, qy, qc). ``precision`` 12 expects
    uint16 samples in [0, 4095]; the chroma offset and DCT level shift
    move to 2048 and the quant tables shift up with them."""
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("expected (h, w, 1|3) array")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422', or '420'")
    if precision == 12 and (arr.dtype != np.uint16 or arr.max(initial=0) > 4095):
        raise ValueError("12-bit JPEG expects uint16 samples in [0, 4095]")
    mid = float(1 << (precision - 1))
    gray = nc == 1
    # luma sampling factors (chroma is always 1x1)
    if gray or subsampling == "444":
        sh = sv = 1
    elif subsampling == "422":
        sh, sv = 2, 1
    else:
        sh = sv = 2

    qy = _scale_quant(_QUANT_LUMA, quality, precision)
    qc = _scale_quant(_QUANT_CHROMA, quality, precision)

    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + mid
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + mid
        if sh > 1 or sv > 1:  # box-mean chroma downsample by (sv, sh)
            def ds(p):
                pp = _pad_to_multiple(p, sv, sh)
                return pp.reshape(
                    pp.shape[0] // sv, sv, pp.shape[1] // sh, sh
                ).mean(axis=(1, 3))

            cb, cr = ds(cb), ds(cr)
        planes = [y, cb, cr]

    if gray:
        plane_spec = [(planes[0], qy, 1, 1)]
    else:
        plane_spec = [
            (planes[0], qy, sh, sv),
            (planes[1], qc, 1, 1),
            (planes[2], qc, 1, 1),
        ]
    hmax = max(s[2] for s in plane_spec)
    vmax = max(s[3] for s in plane_spec)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    coefs = []
    for plane, qtbl, ch, cv in plane_spec:
        # edge-replicate exactly to this component's MCU grid
        padded = np.pad(
            plane,
            (
                (0, 8 * cv * mcus_y - plane.shape[0]),
                (0, 8 * ch * mcus_x - plane.shape[1]),
            ),
            mode="edge",
        )
        coefs.append(_plane_blocks(padded, qtbl, mid))
    spec = [(qtbl, ch, cv) for _, qtbl, ch, cv in plane_spec]
    return gray, spec, coefs, mcus_x, mcus_y, qy, qc


def _header_segments(
    h: int,
    w: int,
    gray: bool,
    spec,
    qy,
    qc,
    sof_marker: int,
    precision: int = 8,
) -> bytes:
    """SOI + APP0 + DQT + SOFn + DHT segments (shared by the baseline and
    progressive writers; tables always travel in-stream). 12-bit streams
    write 16-bit DQT entries (Pq=1) and the extended-range DHT specs."""

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, tbl) -> bytes:
        zz = tbl.reshape(-1)[_ZZ]
        if precision > 8:
            return seg(0xDB, bytes([(1 << 4) | tq]) + zz.astype(">u2").tobytes())
        return seg(0xDB, bytes([tq]) + bytes(zz.astype(np.uint8)))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    comp_spec = b""
    for ci, (_, ch, cv) in enumerate(spec):
        comp_spec += bytes((ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1))
    out += seg(
        sof_marker,
        bytes([precision]) + struct.pack(">HH", h, w)
        + bytes([len(spec)]) + comp_spec,
    )

    def dht(tc: int, th: int, spec_pair: tuple) -> bytes:
        bits, vals = spec_pair
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    if precision > 8:
        out += dht(0, 0, _DC_12BIT_SPEC) + dht(1, 0, _AC_12BIT_SPEC)
        if not gray:
            out += dht(0, 1, _DC_12BIT_SPEC) + dht(1, 1, _AC_12BIT_SPEC)
    else:
        out += dht(0, 0, _DC_LUMA_SPEC) + dht(1, 0, _AC_LUMA_SPEC)
        if not gray:
            out += dht(0, 1, _DC_CHROMA_SPEC) + dht(1, 1, _AC_CHROMA_SPEC)
    return bytes(out)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Baseline JFIF writer. ``arr`` is (h, w, 1) grayscale or (h, w, 3)
    RGB uint8; ``subsampling`` is '444', '422' (horizontal-only), or
    '420' (color only); ``restart_interval`` > 0 emits DRI + RSTn every N
    MCUs (exercises the decoder's restart path). Tables used are written
    into the stream. ``precision=12`` takes uint16 samples in [0, 4095]
    and writes the T.81 extended sequential process (SOF1, 16-bit DQT,
    extended-range Huffman tables)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    h, w, _nc = arr.shape
    gray, spec, coefs, mcus_x, mcus_y, qy, qc = _prepare_components(
        arr, quality, subsampling, precision
    )

    if precision == 12:
        dc_codes = [_build_huffman_codes(*_DC_12BIT_SPEC)] * 2
        ac_codes = [_build_huffman_codes(*_AC_12BIT_SPEC)] * 2
    else:
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
            for ci, (_, ch, cv) in enumerate(spec):
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

    out = bytearray(
        _header_segments(
            h, w, gray, spec, qy, qc,
            0xC1 if precision == 12 else 0xC0, precision,
        )
    )
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


# --- progressive encoder (test-vector generator) ----------------------------


# Progressive AC scans need EOBn symbols (r<<4, r=1..14) that the Annex K
# sequential tables do not contain. Tables travel in-stream, so the writer
# ships a flat 8-bit table carrying every legal progressive AC symbol
# (16x10 magnitude symbols + EOB0..EOB14 + ZRL = 176; Kraft 176/256 < 1,
# and the all-ones 8-bit code stays unused as the spec requires).
_AC_PROG_SPEC = (
    [0] * 7 + [176] + [0] * 8,
    sorted(
        [(r << 4) | s for r in range(16) for s in range(1, 11)]
        + [r << 4 for r in range(15)]
        + [0xF0]
    ),
)

# 12-bit progressive AC: magnitude categories reach 14 (T.81 table F.4's
# extended range), plus the same EOBn/ZRL symbols — 240 flat 8-bit codes.
_AC_PROG_12BIT_SPEC = (
    [0] * 7 + [240] + [0] * 8,
    sorted(
        [(r << 4) | s for r in range(16) for s in range(1, 15)]
        + [r << 4 for r in range(15)]
        + [0xF0]
    ),
)


class _ProgACState:
    """Per-scan AC state: the pending end-of-band run and the correction
    bits buffered behind it (emitted after the next symbol, per G.2)."""

    def __init__(self, writer: _BitWriter, ac_codes: dict):
        self.writer = writer
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac_codes[r << 4]
            self.writer.write(code, length)
            if r:
                self.writer.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        self.flush_pending()

    def flush_pending(self) -> None:
        for b in self.pending:
            self.writer.write(b, 1)
        self.pending = []


def _emit_ac_first_block(state: _ProgACState, zz, Ss, Se, Al) -> None:
    """First AC scan for one block: point-transformed run-length coding
    with lazy EOB runs."""
    w = state.writer
    vals = []
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        a = abs(v) >> Al
        vals.append(-a if v < 0 else a)
    if not any(vals):
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()
        return
    state.flush_eobrun()
    r = 0
    last_nz = max(i for i, v in enumerate(vals) if v)
    for i, v in enumerate(vals):
        if i > last_nz:
            break
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, length = state.ac_codes[0xF0]  # ZRL
            w.write(code, length)
            r -= 16
        s = abs(v).bit_length()
        code, length = state.ac_codes[(r << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if last_nz < Se - Ss:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def _emit_ac_refine_block(state: _ProgACState, zz, Ss, Se, Al) -> None:
    """AC refinement scan for one block (the G.2 correction-bit algorithm,
    same symbol/bit order the decoder's _prog_ac_refine consumes)."""
    w = state.writer
    absv = []
    eob = -1
    for i, k in enumerate(range(Ss, Se + 1)):
        a = abs(int(zz[k])) >> Al
        absv.append(a)
        if a == 1:
            eob = i
    r = 0
    local: list[int] = []
    for i, k in enumerate(range(Ss, Se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            state.flush_eobrun()
            code, length = state.ac_codes[0xF0]
            w.write(code, length)
            r -= 16
            for b in local:
                w.write(b, 1)
            local = []
        if t > 1:
            local.append(t & 1)
            continue
        # newly significant (magnitude exactly 1 at this precision)
        state.flush_eobrun()
        code, length = state.ac_codes[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(zz[k]) > 0 else 0, 1)
        r = 0
        for b in local:
            w.write(b, 1)
        local = []
    if r > 0 or local:
        state.eobrun += 1
        state.pending.extend(local)
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    precision: int = 8,
) -> bytes:
    """Progressive (SOF2) JFIF writer — the test-vector inverse of the
    progressive decode path. Scan script: interleaved first DC (Al=1),
    per-component first AC in two bands (1-5, 6-63, Al=1), DC refinement,
    then per-component AC refinements (Al=0) — exercising spectral
    selection, successive approximation, EOB runs, and the correction-bit
    algorithm on both sides. Same tables and quality mapping as the
    baseline writer; tables travel in-stream. ``precision=12`` takes
    uint16 samples in [0, 4095] (16-bit DQT, extended-range DC table, the
    category-14 progressive AC table) — the scan machinery itself is
    coefficient-domain and precision-free."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    h, w, _nc = arr.shape
    gray, spec, coefs, mcus_x, mcus_y, qy, qc = _prepare_components(
        arr, quality, subsampling, precision
    )
    if precision == 12:
        dc_codes = [_build_huffman_codes(*_DC_12BIT_SPEC)] * 2
        prog_ac = _build_huffman_codes(*_AC_PROG_12BIT_SPEC)
    else:
        dc_codes = [_build_huffman_codes(*_DC_LUMA_SPEC)]
        if not gray:
            dc_codes.append(_build_huffman_codes(*_DC_CHROMA_SPEC))
        prog_ac = _build_huffman_codes(*_AC_PROG_SPEC)
    ac_codes = [prog_ac, prog_ac]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_ids: list[int], Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            tb = 0 if ci == 0 else 1
            body += bytes((ci + 1, (tb << 4) | tb))
        body += bytes((Ss, Se, (Ah << 4) | Al))
        return seg(0xDA, body)

    hmax = max(s[1] for s in spec)
    vmax = max(s[2] for s in spec)

    def comp_grid(ci: int):
        _qtbl, ch, cv = spec[ci]
        cols = -(-(-(-(w * ch) // hmax)) // 8)
        rows = -(-(-(-(h * cv) // vmax)) // 8)
        return rows, cols

    out = bytearray(_header_segments(h, w, gray, spec, qy, qc, 0xC2, precision))

    # scan 1: first DC, all components interleaved, Al=1
    wtr = _BitWriter()
    preds = [0] * len(spec)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_qtbl, ch, cv) in enumerate(spec):
                tb = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        v = int(coefs[ci][my * cv + by, mx * ch + bx][0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = abs(diff).bit_length()
                        code, length = dc_codes[tb][t]
                        wtr.write(code, length)
                        if t:
                            wtr.write(
                                diff if diff > 0 else diff + (1 << t) - 1, t
                            )
    wtr.align()
    out += sos(list(range(len(spec))), 0, 0, 0, 1) + wtr.out

    # mid-stream DHT: override the AC tables with the progressive set
    # (EOBn symbols) before any AC scan — decoders rebuild on every DHT
    bits, vals = _AC_PROG_12BIT_SPEC if precision == 12 else _AC_PROG_SPEC
    out += seg(0xC4, bytes([(1 << 4) | 0] + bits + vals))
    if not gray:
        out += seg(0xC4, bytes([(1 << 4) | 1] + bits + vals))

    # scans 2..: first AC per component, two spectral bands, Al=1
    for ci in range(len(spec)):
        tb = 0 if ci == 0 else 1
        rows, cols = comp_grid(ci)
        for Ss, Se in ((1, 5), (6, 63)):
            wtr = _BitWriter()
            state = _ProgACState(wtr, ac_codes[tb])
            for r_ in range(rows):
                for c_ in range(cols):
                    _emit_ac_first_block(
                        state, coefs[ci][r_, c_], Ss, Se, 1
                    )
            state.flush_eobrun()
            wtr.align()
            out += sos([ci], Ss, Se, 0, 1) + wtr.out

    # DC refinement (raw bits), interleaved, Ah=1 Al=0
    wtr = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_qtbl, ch, cv) in enumerate(spec):
                for by in range(cv):
                    for bx in range(ch):
                        wtr.write(
                            int(coefs[ci][my * cv + by, mx * ch + bx][0]) & 1,
                            1,
                        )
    wtr.align()
    out += sos(list(range(len(spec))), 0, 0, 1, 0) + wtr.out

    # AC refinement per component, full band, Ah=1 Al=0
    for ci in range(len(spec)):
        tb = 0 if ci == 0 else 1
        rows, cols = comp_grid(ci)
        wtr = _BitWriter()
        state = _ProgACState(wtr, ac_codes[tb])
        for r_ in range(rows):
            for c_ in range(cols):
                _emit_ac_refine_block(state, coefs[ci][r_, c_], 1, 63, 0)
        state.flush_eobrun()
        wtr.align()
        out += sos([ci], 1, 63, 1, 0) + wtr.out

    out += b"\xff\xd9"
    return bytes(out)


# --- lossless process (SOF3, T.81 Annex H) ----------------------------------

# DC-style Huffman spec covering the lossless difference categories 0-16
# (category 16 is the no-extra-bits diff = 32768 special case).
_DC_LOSSLESS_SPEC = ([0, 0, 0, 0, 17] + [0] * 11, list(range(17)))


def _lossless_predict(
    plane, x: int, y: int, predictor: int, default: int
) -> int:
    """T.81 table H.1. a = left, b = above, c = above-left; first sample
    (and the first of each restart interval) uses the mid-range default,
    the rest of row 0 uses a, column 0 uses b."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[y, x - 1])
    if x == 0:
        return int(plane[y - 1, x])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    if predictor == 3:
        return c
    if predictor == 4:
        return a + b - c
    if predictor == 5:
        return a + ((b - c) >> 1)
    if predictor == 6:
        return b + ((a - c) >> 1)
    if predictor == 7:
        return (a + b) >> 1
    raise ValueError(f"bad lossless predictor {predictor}")


def _decode_lossless_scan(
    payload, pos, sel, predictor, pt, frame, huff_dc, restart_interval
):
    """Decode a complete SOF3 scan → (h, w, n_comp) array in the standard
    top-byte view (samples are reconstructed at full precision, then the
    point transform shifts back and >8-bit reduces to the top byte)."""
    w, h, comps, precision = frame
    if any(ch != 1 or cv != 1 for _cid, ch, cv, _tq in comps):
        raise NotImplementedError("subsampled lossless JPEG")
    if len(sel) != len(comps):
        raise ValueError("lossless scan must cover every component")
    tables = []
    for (cs, td, _ta), (cid, _ch, _cv, _tq) in zip(sel, comps):
        if cs != cid:
            raise ValueError("scan/frame component mismatch")
        tables.append(huff_dc[td])
    default = 1 << (precision - pt - 1)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    reader = _BitReader(payload, pos)
    count = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                reader.restart()
            restarted = (
                restart_interval and count and count % restart_interval == 0
            )
            for plane, tbl in zip(planes, tables):
                t = reader.decode_huffman(tbl)
                if t == 16:
                    diff = 32768  # H.1.2.2: no additional bits
                elif t:
                    diff = _extend(reader.receive(t), t)
                else:
                    diff = 0
                pred = (
                    default
                    if restarted
                    else _lossless_predict(plane, x, y, predictor, default)
                )
                plane[y, x] = (pred + diff) & 0xFFFF
            count += 1
    # Reconstruct at full scale (coded samples << Pt; P is the ORIGINAL
    # sample precision per Annex H, so Pt lives inside it), then the
    # standard top-byte view for >8-bit grids.
    shift = max(0, precision - 8)
    out = [
        np.clip((plane << pt) >> shift, 0, 255).astype(np.uint8)
        for plane in planes
    ]
    return np.stack(out, axis=2)


def encode_jpeg_lossless(
    arr: np.ndarray, predictor: int = 4, precision: int = 8, pt: int = 0
) -> bytes:
    """SOF3 writer — the test-vector inverse of the lossless decode path.

    ``arr`` is (h, w, 1|3) with 1x1 sampling; uint8 for precision 8,
    uint16 in [0, 2^precision - 1] for deeper grids. ``pt`` (point
    transform) drops low bits before coding, per Annex H. Decode of an
    encode is BIT-EXACT on the coded samples by construction (pinned in
    tests) — this is the DNG/medical-imaging JPEG process.
    """
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7")
    arr = np.asarray(arr)
    h, w, nc = arr.shape
    samples = (arr.astype(np.int64) >> pt)
    codes = _build_huffman_codes(*_DC_LOSSLESS_SPEC)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    comp_spec = b""
    for ci in range(nc):
        comp_spec += bytes((ci + 1, 0x11, 0))
    out += seg(
        0xC3,
        bytes([precision]) + struct.pack(">HH", h, w)
        + bytes([nc]) + comp_spec,
    )
    bits, vals = _DC_LOSSLESS_SPEC
    out += seg(0xC4, bytes([0x00] + bits + vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes((ci + 1, 0x00))
    sos += bytes((predictor, 0, pt))
    out += seg(0xDA, sos)

    wtr = _BitWriter()
    default = 1 << (precision - pt - 1)
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                plane = samples[:, :, ci]
                pred = _lossless_predict(plane, x, y, predictor, default)
                diff = (int(plane[y, x]) - pred) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536  # representative in [-32768, 32767]
                if diff == -32768 or diff == 32768:
                    code, length = codes[16]
                    wtr.write(code, length)
                    continue
                t = abs(diff).bit_length()
                code, length = codes[t]
                wtr.write(code, length)
                if t:
                    wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    wtr.align()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)
