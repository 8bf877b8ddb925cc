"""From-scratch FLAC codec (lossless audio) — no external library.

Implements the public xiph.org FLAC format for 16-bit mono streams:

- **Container**: ``fLaC`` magic + STREAMINFO metadata block (block sizes,
  sample rate, channel/bit-depth, total samples, MD5 of the unencoded
  audio — computed on encode and VERIFIED on decode).
- **Frames**: fixed-blocksize strategy, UTF-8-coded frame numbers,
  CRC-8 header checksum and CRC-16 frame checksum (both verified; a
  flipped bit fails loudly).
- **Subframes**: CONSTANT, VERBATIM, FIXED orders 0–4 (the polynomial
  predictors), and LPC (quantized linear predictor) on the decode side.
- **Residuals**: Rice coding (4- and 5-bit parameter variants, escape
  codes, partition orders).

Because FLAC is lossless, ANY int16 signal round-trips bit-exactly —
which is what lets the ``media_flac`` oracle mirror decoded sample sums
of an arbitrary digest-derived waveform in SQL (no "the payload happens
to survive the lossy codec" argument needed, unlike JPEG/ADPCM).

Encoder strategy per block: CONSTANT when all samples equal, else the
FIXED order 0–2 with the smallest residual magnitude sum (VERBATIM if
rice coding would not beat it), one rice partition, parameter fitted to
the mean residual magnitude.  ``lpc_order1`` exists to exercise the LPC
decode path (an order-1 LPC with coefficient 1, shift 0 — numerically
identical to FIXED order 1, but encoded through the LPC subframe
layout).
"""
from __future__ import annotations

import hashlib
import struct
from typing import List, Tuple

import numpy as np

_MAGIC = b"fLaC"

# fixed-predictor coefficients, order 0..4 (FLAC spec §fixed subframe)
_FIXED_COEF = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}


# --- CRCs (FLAC frame checksums; MSB-first, init 0) ----------------------------

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = (int(_CRC16_TAB[(r >> 8) ^ b]) ^ ((r << 8) & 0xFFFF)) & 0xFFFF
    return r


# --- MSB-first bit I/O ----------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


# --- UTF-8-style coded frame number ---------------------------------------------

def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    for nbytes in range(2, 7):
        if n < (1 << (nbytes * 5 + 1)):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            shift = 6 * (nbytes - 1)
            out.append(lead | (n >> shift))
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode(r: "_BitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 >> (7 - i)) & 1:
            nbytes = i
            break
    if nbytes < 2:
        raise ValueError("bad UTF-8 coded number")
    n = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


# --- rice residuals --------------------------------------------------------------

def _rice_write(wr: _BitWriter, residual: np.ndarray, param: int) -> None:
    # zigzag fold then quotient-unary + param low bits
    for x in residual.tolist():
        u = (x << 1) ^ (x >> 63) if x < 0 else (x << 1)
        wr.write_unary(u >> param)
        if param:
            wr.write(u & ((1 << param) - 1), param)


def _rice_param_for(residual: np.ndarray) -> int:
    if len(residual) == 0:
        return 0
    mean = float(np.abs(residual).mean())
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(wr: _BitWriter, residual: np.ndarray) -> None:
    """Coding method 00 (4-bit rice), partition order 0."""
    wr.write(0, 2)
    wr.write(0, 4)
    param = _rice_param_for(residual)
    if param <= 14:
        wr.write(param, 4)
        _rice_write(wr, residual, param)
    else:  # escape: raw bits
        wr.write(0xF, 4)
        bits = int(np.abs(residual).max()).bit_length() + 1
        wr.write(bits, 5)
        for x in residual.tolist():
            wr.write_signed(x, bits)


def _read_residual(r: "_BitReader", block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    out: List[int] = []
    for part in range(nparts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            bits = r.read(5)
            out.extend(r.read_signed(bits) for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return np.array(out, dtype=np.int64)


# --- encoder ---------------------------------------------------------------------

def _encode_subframe(wr: _BitWriter, block: np.ndarray, bps: int,
                     lpc_order1: bool) -> None:
    if np.all(block == block[0]):
        wr.write(0, 1)
        wr.write(0b000000, 6)  # CONSTANT
        wr.write(0, 1)
        wr.write_signed(int(block[0]), bps)
        return
    if lpc_order1 and len(block) > 1:
        # LPC order 1, precision 2 bits, shift 0, coefficient 1 — the
        # decode-path exercise mode (== FIXED order 1 numerically)
        wr.write(0, 1)
        wr.write(0b100000, 6)  # LPC, order-1 encoded in low 5 bits: order=1
        wr.write(0, 1)
        wr.write_signed(int(block[0]), bps)  # warmup
        wr.write(2 - 1, 4)  # qlp precision - 1
        wr.write(0, 5)  # shift (signed 5 bits)
        wr.write_signed(1, 2)  # the single coefficient
        _write_residual(wr, block[1:] - block[:-1])
        return
    best_order, best_res, best_cost = 0, block.astype(np.int64), None
    x = block.astype(np.int64)
    for order in (0, 1, 2):
        if len(block) <= order:
            break
        res = x[order:].copy()
        for j, c in enumerate(_FIXED_COEF[order].tolist()):
            res -= c * x[order - 1 - j : len(x) - 1 - j]
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    # verbatim fallback if residuals are absurdly wide (adversarial input)
    if len(best_res) and int(np.abs(best_res).max()) > (1 << 28):
        wr.write(0, 1)
        wr.write(0b000001, 6)  # VERBATIM
        wr.write(0, 1)
        for v in block.tolist():
            wr.write_signed(int(v), bps)
        return
    wr.write(0, 1)
    wr.write(0b001000 | best_order, 6)  # FIXED
    wr.write(0, 1)
    for v in block[:best_order].tolist():
        wr.write_signed(int(v), bps)
    _write_residual(wr, best_res)


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096, lpc_order1: bool = False) -> bytes:
    """int16 mono -> FLAC stream (STREAMINFO + fixed-blocksize frames)."""
    samples = np.asarray(samples, dtype=np.int16)
    n = len(samples)
    bps = 16
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    # STREAMINFO (34 bytes), last-metadata flag set
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(bps - 1, 5)
    si.write(n, 36)
    info = si.bytes() if si.nbits == 0 else None
    si.align()
    info = si.bytes() + md5
    out = bytearray(_MAGIC)
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info
    for fno, start in enumerate(range(0, max(n, 1), block_size)):
        block = samples[start : start + block_size].astype(np.int64)
        bs = len(block)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize strategy
        full = bs == block_size
        hdr.write(0b1100 if (full and block_size == 4096) else 0b0111, 4)
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(0, 4)  # channel assignment: mono
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = bytearray(hdr.bytes())
        head += _utf8_encode(fno)
        if not (full and block_size == 4096):
            head += struct.pack(">H", bs - 1)
        head.append(crc8(bytes(head)))
        body = _BitWriter()
        _encode_subframe(body, block, bps, lpc_order1)
        body.align()
        frame = bytes(head) + body.bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


# --- decoder ---------------------------------------------------------------------

def _decode_subframe(r: "_BitReader", bs: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    t = r.read(6)
    if r.read(1) != 0:
        raise NotImplementedError("wasted bits not supported")
    if t == 0b000000:  # CONSTANT
        return np.full(bs, r.read_signed(bps), dtype=np.int64)
    if t == 0b000001:  # VERBATIM
        return np.array([r.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    if 0b001000 <= t <= 0b001100:  # FIXED order 0-4
        order = t & 0x07
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        coef = _FIXED_COEF[order].tolist()
        for i in range(order, bs):
            x[i] = res[i - order] + sum(
                c * x[i - 1 - j] for j, c in enumerate(coef)
            )
        return x
    if t & 0b100000:  # LPC
        order = (t & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = r.read(5)
        if shift >> 4:
            shift -= 32
        if shift < 0:
            raise ValueError("negative qlp shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        for i in range(order, bs):
            acc = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coef))
            x[i] = res[i - order] + (acc >> shift)
        return x
    raise ValueError(f"reserved subframe type {t:06b}")


_BLOCKSIZE_TAB = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}


def decode_flac(payload: bytes) -> Tuple[int, np.ndarray]:
    """FLAC stream (16-bit mono) -> (rate, int16 samples).  Verifies
    frame CRC-8/CRC-16 and the STREAMINFO audio MD5."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = total = None
    md5_expect = None
    bps = 16
    while True:  # metadata blocks
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if hdr & 0x7F == 0:  # STREAMINFO
            r = _BitReader(body)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5_expect = body[18:34]
            if ch != 1 or bps != 16:
                raise NotImplementedError("only 16-bit mono FLAC")
        pos += 4 + length
        if hdr & 0x80:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    out: List[np.ndarray] = []
    got = 0
    while got < (total or 0) and pos < len(payload):
        frame_start = pos
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        if chan != 0:
            raise NotImplementedError("only mono FLAC frames")
        if ss_code != 0b100:
            raise NotImplementedError("only 16-bit FLAC frames")
        _utf8_decode(r)
        if bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_TAB:
            bs = _BLOCKSIZE_TAB[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code not in (0,):  # this encoder always defers to STREAMINFO
            raise NotImplementedError("per-frame sample rate codes")
        header_crc = r.read(8)
        if crc8(payload[frame_start : r.pos - 1]) != header_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        block = _decode_subframe(r, bs, bps)
        r.align()
        frame_crc = struct.unpack_from(">H", payload, r.pos)[0]
        if crc16(payload[frame_start : r.pos]) != frame_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos + 2
        out.append(block)
        got += bs
    samples = (np.concatenate(out) if out else np.array([], dtype=np.int64))
    samples = samples[: total if total else len(samples)].astype(np.int16)
    if md5_expect and md5_expect != b"\x00" * 16:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("FLAC audio MD5 mismatch")
    return rate, samples
