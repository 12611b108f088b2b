"""Minimal spec-correct FLAC *encoder* — test fixture for the native decoder.

No FLAC tooling (flac/ffmpeg/soundfile) exists in this environment, so the
decoder (native/flac_codec.cc) is validated by round-trip through the FLAC
format itself: this encoder emits real FLAC streams (RFC 9639 bit layout,
correct CRC-8/CRC-16, UTF-8 coded frame numbers) with selectable subframe
types (constant / verbatim / fixed 1-4 / LPC) and channel decorrelation
modes (independent / left-side / right-side / mid-side), and the tests
assert the decode reproduces the original PCM exactly.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, width: int) -> None:
        value &= (1 << width) - 1
        self.acc = (self.acc << width) | value
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.bytes.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def sbits(self, value: int, width: int) -> None:
        self.bits(value & ((1 << width) - 1), width)

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)


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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.bits(v, 8)
    elif v < 0x800:
        bw.bits(0xC0 | (v >> 6), 8)
        bw.bits(0x80 | (v & 0x3F), 8)
    else:
        bw.bits(0xE0 | (v >> 12), 8)
        bw.bits(0x80 | ((v >> 6) & 0x3F), 8)
        bw.bits(0x80 | (v & 0x3F), 8)


def _zigzag(e: np.ndarray) -> np.ndarray:
    e = e.astype(object)  # unbounded ints — residuals can exceed int64 midway
    return np.where(e >= 0, 2 * e, -2 * e - 1)


def _write_rice_residual(bw: _BitWriter, resid: np.ndarray) -> None:
    """Single-partition (order 0) 4-bit Rice code."""
    u = _zigzag(np.asarray(resid))
    mean = float(np.mean(u)) if len(u) else 0.0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < 14:
        param += 1
    bw.bits(0, 2)  # coding method: 4-bit rice
    bw.bits(0, 4)  # partition order 0
    bw.bits(param, 4)
    for val in u:
        q = int(val) >> param
        assert q < 1 << 20, "rice quotient blew up — pick a better subframe"
        for _ in range(q):
            bw.bits(0, 1)
        bw.bits(1, 1)
        if param:
            bw.bits(int(val) & ((1 << param) - 1), param)


_FIXED_COEFS = {
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int, kind: str) -> None:
    x = np.asarray(x, dtype=np.int64)
    bw.bits(0, 1)  # pad
    if kind == "constant":
        assert (x == x[0]).all()
        bw.bits(0, 6)
        bw.bits(0, 1)  # no wasted bits
        bw.sbits(int(x[0]), bps)
    elif kind == "verbatim":
        bw.bits(1, 6)
        bw.bits(0, 1)
        for v in x:
            bw.sbits(int(v), bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.bits(0b001000 | order, 6)
        bw.bits(0, 1)
        for v in x[:order]:
            bw.sbits(int(v), bps)
        coefs = _FIXED_COEFS[order]
        pred = sum(c * x[order - 1 - j : len(x) - 1 - j] for j, c in enumerate(coefs))
        _write_rice_residual(bw, x[order:] - pred)
    elif kind == "lpc":
        # order-2, explicit quantised coefficients: a second-difference
        # predictor expressed through the LPC path (coef [2, -1] << shift)
        order, precision, shift = 2, 12, 5
        bw.bits(0b100000 | (order - 1), 6)
        bw.bits(0, 1)
        for v in x[:order]:
            bw.sbits(int(v), bps)
        bw.bits(precision - 1, 4)
        bw.sbits(shift, 5)
        coefs = [2 << shift, -(1 << shift)]
        for c in coefs:
            bw.sbits(c, precision)
        acc = coefs[0] * x[1:-1] + coefs[1] * x[:-2]
        pred = acc >> shift
        _write_rice_residual(bw, x[order:] - pred)
    else:
        raise ValueError(kind)


def write_flac(
    path: str,
    pcm: np.ndarray,  # [n] or [n, ch] integers at `bits`
    rate: int,
    bits: int = 16,
    blocksize: int = 1024,
    mode: str = "independent",  # independent | left-side | right-side | mid-side
    subframe: str = "fixed2",  # constant | verbatim | fixed1..4 | lpc
) -> None:
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    assert ch in (1, 2)
    if mode != "independent":
        assert ch == 2

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    last_block = n % blocksize or blocksize
    si.bits(min(blocksize, max(16, last_block)), 16)  # min blocksize
    si.bits(blocksize, 16)
    si.bits(0, 24)  # min frame size unknown
    si.bits(0, 24)
    si.bits(rate, 20)
    si.bits(ch - 1, 3)
    si.bits(bits - 1, 5)
    si.bits(n, 36)
    for _ in range(16):
        si.bits(0, 8)  # md5 unknown
    out += bytes([0x80, 0, 0, 34]) + bytes(si.bytes)

    for fi, start in enumerate(range(0, n, blocksize)):
        block = pcm[start : start + blocksize]
        bs = len(block)
        bw = _BitWriter()
        bw.bits(0x3FFE, 14)
        bw.bits(0, 1)  # reserved
        bw.bits(0, 1)  # fixed blocksize stream
        bw.bits(0b0111, 4)  # blocksize: 16-bit at end
        bw.bits(0, 4)  # sample rate: from STREAMINFO
        assign = {"independent": ch - 1, "left-side": 8, "right-side": 9, "mid-side": 10}[mode]
        bw.bits(assign, 4)
        sscode = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}[bits]
        bw.bits(sscode, 3)
        bw.bits(0, 1)  # reserved
        _utf8_coded(bw, fi)
        bw.bits(bs - 1, 16)
        bw.bits(_crc8(bytes(bw.bytes)), 8)

        if mode == "independent":
            chans = [(block[:, c], bits) for c in range(ch)]
        elif mode == "left-side":
            chans = [(block[:, 0], bits), (block[:, 0] - block[:, 1], bits + 1)]
        elif mode == "right-side":
            chans = [(block[:, 0] - block[:, 1], bits + 1), (block[:, 1], bits)]
        else:  # mid-side
            mid = (block[:, 0] + block[:, 1]) >> 1
            side = block[:, 0] - block[:, 1]
            chans = [(mid, bits), (side, bits + 1)]
        for data, bps in chans:
            kind = subframe
            if kind == "constant" and not (data == data[0]).all():
                kind = "verbatim"
            _write_subframe(bw, data, bps, kind)
        bw.align()
        frame = bytes(bw.bytes)
        out += frame + _crc16(frame).to_bytes(2, "big")

    with open(path, "wb") as f:
        f.write(bytes(out))
