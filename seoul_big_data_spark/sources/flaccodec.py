"""FLAC codec subset — pure Python/numpy, no external deps.

Implements the public FLAC format specification's core decode path:
STREAMINFO metadata, frame headers (UTF-8-coded frame numbers, CRC-8),
all four subframe types — CONSTANT, VERBATIM, FIXED (orders 0-4), and
LPC (quantized coefficients + shift) — Rice-coded residual partitions
(both 4- and 5-bit parameter methods, escape-to-verbatim partitions),
inter-channel decorrelation (left/side, right/side, mid/side), wasted
bits, and the frame CRC-16. Frames verify both CRCs; a corrupt stream
raises instead of returning wrong audio.

The encoder is the test-vector generator: FIXED-order-2 prediction with
Rice partitions by default, plus CONSTANT for flat blocks, an optional
VERBATIM mode, an optional LPC mode (the order-2 polynomial expressed
through the LPC subframe layout, exercising that decode path with a
known-exact reconstruction), and the three stereo decorrelation modes.

This completes the audio ladder (PCM -> G.711 companding -> IMA ADPCM ->
FLAC lossless compression) the same way baseline+progressive JPEG
completed the image ladder. North-star extension (SURVEY.md §2.10 N5);
decode runs executor-side in Arrow-batched ``mapInPandas`` like every
other codec here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "decode_flac_samples", "encode_flac"]


# --- CRCs (FLAC spec: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0) ----------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# --- MSB-first bit I/O ------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC stream")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitsW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.cnt += n
        while self.cnt >= 8:
            self.out.append((self.acc >> (self.cnt - 8)) & 0xFF)
            self.cnt -= 8
        self.acc &= (1 << self.cnt) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.cnt:
            self.write(0, 8 - self.cnt)


# --- frame-number UTF-8-style coding ----------------------------------------


def _utf8_encode_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # find the number of continuation bytes needed
    for extra in range(1, 7):
        if n < (1 << (extra * 6 + (6 - extra))):
            out = [(0xFF << (7 - extra)) & 0xFF | (n >> (6 * extra))]
            for i in range(extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    extra = 0
    mask = 0x40
    while b0 & mask:
        extra += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(extra):
        cont = bits.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded frame number")
        n = (n << 6) | (cont & 0x3F)
    return n


# --- fixed predictors (spec §"FIXED") ---------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _predict_fixed(hist: list[int], order: int) -> int:
    return sum(c * hist[-i - 1] for i, c in enumerate(_FIXED_COEFS[order]))


# --- residual coding --------------------------------------------------------


def _read_residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    nparts = 1 << po
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    if nparts > 1 and block_size // nparts <= order:
        # first partition holds (blocksize >> po) - order samples; a
        # non-positive count means the stream is malformed
        raise ValueError("partition order leaves no room for warmup")
    out: list[int] = []
    for p in range(nparts):
        count = block_size // nparts - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:  # verbatim partition
            bps = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(bps) if bps else 0)
        else:
            for _ in range(count):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                z = (q << param) | r
                out.append((z >> 1) ^ -(z & 1))  # un-zigzag
    return out


def _write_residual(w: _BitsW, res: list[int], order: int, po: int = 0) -> None:
    """Rice-code a residual with 2^po partitions (method 0, 4-bit params);
    per-partition parameter from the mean magnitude."""
    w.write(0, 2)
    w.write(po, 4)
    nparts = 1 << po
    block_size = len(res) + order
    start = 0
    for p in range(nparts):
        count = block_size // nparts - (order if p == 0 else 0)
        part = res[start:start + count]
        start += count
        mean = sum(abs(v) for v in part) / max(len(part), 1)
        param = 0
        while (1 << param) < mean + 1 and param < 14:
            param += 1
        w.write(param, 4)
        for v in part:
            z = ((-v) << 1) - 1 if v < 0 else (v << 1)  # zigzag
            q, r = z >> param, z & ((1 << param) - 1)
            w.write_unary(q)
            if param:
                w.write(r, param)


# --- decoder ----------------------------------------------------------------


def decode_flac_samples(payload: bytes):
    """-> (samples int32 array shape (n, channels), sample_rate, bits)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if btype == 0:  # STREAMINFO
            bi = _Bits(body)
            bi.read(16)  # min blocksize
            bi.read(16)  # max blocksize
            bi.read(24)
            bi.read(24)
            rate = bi.read(20)
            channels = bi.read(3) + 1
            bits_ps = bi.read(5) + 1
            total = bi.read(36)
            streaminfo = (rate, channels, bits_ps, total)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bits_ps, total = streaminfo

    chans_out: list[list[int]] = [[] for _ in range(channels)]
    n = len(payload)
    while pos < n and total and len(chans_out[0]) < total:
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _utf8_decode_number(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        bps = {
            0: bits_ps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32
        }.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        bits.align()
        hdr_end = bits.byte
        crc8 = bits.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            modes = [0] * nch
        elif ch_code == 8:  # left/side
            nch, modes = 2, [0, 1]
        elif ch_code == 9:  # right/side
            nch, modes = 2, [1, 0]
        elif ch_code == 10:  # mid/side
            nch, modes = 2, [0, 1]
        else:
            raise ValueError("reserved channel assignment")
        if nch != channels:
            raise ValueError("frame channel count != STREAMINFO")

        sub: list[list[int]] = []
        for c in range(nch):
            cbps = bps + modes[c]  # side channel carries one extra bit
            if bits.read(1):
                raise ValueError("bad subframe padding bit")
            stype = bits.read(6)
            wasted = 0
            if bits.read(1):
                wasted = bits.read_unary() + 1
                cbps -= wasted
            if stype == 0:  # CONSTANT
                v = bits.read_signed(cbps)
                s = [v] * block_size
            elif stype == 1:  # VERBATIM
                s = [bits.read_signed(cbps) for _ in range(block_size)]
            elif 8 <= stype <= 12:  # FIXED
                order = stype - 8
                s = [bits.read_signed(cbps) for _ in range(order)]
                res = _read_residual(bits, block_size, order)
                for r in res:
                    s.append(_predict_fixed(s, order) + r)
            elif stype >= 32:  # LPC
                order = stype - 31
                s = [bits.read_signed(cbps) for _ in range(order)]
                precision = bits.read(4) + 1
                if precision == 16:
                    raise ValueError("invalid LPC precision")
                shift = bits.read_signed(5)
                coefs = [bits.read_signed(precision) for _ in range(order)]
                res = _read_residual(bits, block_size, order)
                for r in res:
                    pred = sum(
                        coefs[i] * s[-i - 1] for i in range(order)
                    ) >> shift
                    s.append(pred + r)
            else:
                raise ValueError(f"reserved subframe type {stype}")
            if wasted:
                s = [v << wasted for v in s]
            sub.append(s)

        # undo stereo decorrelation
        if ch_code == 8:  # left/side: side = left - right
            left, side = sub
            sub = [left, [left[i] - side[i] for i in range(block_size)]]
        elif ch_code == 9:  # right/side: side = left - right
            side, right = sub
            sub = [[side[i] + right[i] for i in range(block_size)], right]
        elif ch_code == 10:  # mid/side
            mid, side = sub
            left = []
            right = []
            for i in range(block_size):
                m = (mid[i] << 1) | (side[i] & 1)
                left.append((m + side[i]) >> 1)
                right.append((m - side[i]) >> 1)
            sub = [left, right]

        bits.align()
        crc = struct.unpack_from(">H", payload, bits.byte)[0]
        if _crc16(payload[frame_start:bits.byte]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.byte + 2
        for c in range(channels):
            chans_out[c].extend(sub[c])

    m = min(total, len(chans_out[0])) if total else len(chans_out[0])
    out = np.empty((m, channels), dtype=np.int32)
    for c in range(channels):
        out[:, c] = chans_out[c][:m]
    return out, rate, bits_ps


def decode_flac(payload: bytes) -> dict:
    """FLAC -> the audio metadata dict shape of ``_decode_wav``."""
    samples, rate, bits_ps = decode_flac_samples(payload)
    n, channels = samples.shape
    full = float(1 << (bits_ps - 1))
    ch0 = samples[:, 0].astype(np.float64) / full
    zc = (
        float(np.mean(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
        if n > 1
        else 0.0
    )
    return {
        "format": "flac",
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n,
        "duration_s": n / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(ch0 * ch0))) if n else 0.0,
        "zero_cross_rate": zc,
    }


# --- encoder (test-vector generator) ----------------------------------------


def _encode_subframe(
    w: _BitsW, s: list[int], cbps: int, mode: str, partition_order: int
) -> None:
    w.write(0, 1)  # padding bit
    if mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write_signed(v, cbps)
        return
    if len(set(s)) == 1:
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(s[0], cbps)
        return
    order = min(2, len(s) - 1)
    res = [
        s[i] - _predict_fixed(s[:i], order) for i in range(order, len(s))
    ]
    if mode == "lpc":
        # the order-2 polynomial through the LPC layout: coefs [2, -1],
        # shift 0, precision 5 — reconstruction identical to FIXED-2
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write_signed(v, cbps)
        w.write(5 - 1, 4)
        w.write_signed(0, 5)
        for c in _FIXED_COEFS[order]:
            w.write_signed(c, 5)
    else:
        w.write(8 + order, 6)  # FIXED
        w.write(0, 1)
        for v in s[:order]:
            w.write_signed(v, cbps)
    # a partition order is legal only if it divides the block size AND the
    # first partition ((blocksize >> po) - order samples) is non-empty —
    # a short final frame with po=2 and order 2 would otherwise go negative
    # and desync the whole stream (caught by the round-4 codec soak)
    po = partition_order
    if (len(s) % (1 << po)) != 0 or (len(s) >> po) <= order:
        po = 0
    _write_residual(w, res, order, po)


def encode_flac(
    samples,
    sample_rate: int,
    channels: int = 1,
    bits_per_sample: int = 16,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    subframe_mode: str = "fixed",
    partition_order: int = 2,
) -> bytes:
    """FLAC writer (test-vector generator). ``samples``: int iterable,
    interleaved when channels > 1. ``stereo_mode``: 'independent' |
    'left_side' | 'right_side' | 'mid_side'; ``subframe_mode``: 'fixed' |
    'verbatim' | 'lpc' (constant blocks always use CONSTANT)."""
    x = np.asarray(list(samples), dtype=np.int64)
    n_frames_total = len(x) // channels
    x = x[: n_frames_total * channels].reshape(n_frames_total, channels)

    out = bytearray(b"fLaC")
    si = _BitsW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n_frames_total, 36)
    si.align()
    body = bytes(si.out) + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n_frames_total, block_size):
        blk = x[start:start + block_size]
        bs = blk.shape[0]
        w = _BitsW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit block size follows
        w.write(0, 4)  # sample rate from STREAMINFO
        if channels == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[
                stereo_mode
            ]
        else:
            ch_code = channels - 1
        w.write(ch_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits_per_sample], 3)
        w.write(0, 1)
        for b in _utf8_encode_number(frame_no):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)

        if ch_code == 8:  # left/side
            chans = [
                blk[:, 0].tolist(),
                (blk[:, 0] - blk[:, 1]).tolist(),
            ]
            extra = [0, 1]
        elif ch_code == 9:  # right/side
            chans = [
                (blk[:, 0] - blk[:, 1]).tolist(),
                blk[:, 1].tolist(),
            ]
            extra = [1, 0]
        elif ch_code == 10:  # mid/side
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            chans = [mid.tolist(), side.tolist()]
            extra = [0, 1]
        else:
            chans = [blk[:, c].tolist() for c in range(channels)]
            extra = [0] * channels
        for c, s in enumerate(chans):
            _encode_subframe(
                w, s, bits_per_sample + extra[c], subframe_mode,
                partition_order,
            )
        w.align()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)
