"""Baseline JPEG (ITU-T T.81 SOF0) codec in pure numpy + stdlib.

Closes the last compressed-image plug-point in ``ops/codecs.py``: the
sandbox has no PIL/libjpeg, but baseline sequential JPEG is public
knowledge end to end — Annex K quantization + Huffman tables, the
8x8 type-II DCT as an orthonormal matrix product, canonical Huffman
codes, byte stuffing and restart markers.  Everything here is from the
published spec; no decoder library is wrapped.

Supported on decode:
- SOF0/SOF1 (baseline/extended sequential) and SOF2 (progressive:
  spectral selection + successive approximation, EOB-runs, refinement
  bits — T.81 Annex G), 8-bit, 1 or 3 components,
- any sampling factors whose max is 1 or 2 (4:4:4, 4:2:2, 4:2:0, gray),
- restart intervals (DRI + RST0-7), byte stuffing, APPn/COM skip.
Arithmetic coding, 12-bit, lossless and hierarchical modes raise
``NotImplementedError`` — vanishingly rare in training corpora and the
remaining honest plug-point.

Two encoders — ``encode_jpeg`` (baseline) and
``encode_jpeg_progressive`` (SOF2 with a configurable successive-
approximation ladder) — emit 4:4:4 or 4:2:0 with the Annex K tables
(scaled by the classic IJG quality curve), giving deterministic
fixtures for the decoder and the multimodal stage tests; both entropy
paths must reconstruct identical pixels from the same coefficients,
which is what the round-trip tests pin.

The per-symbol Huffman loop is Python (it is inherently sequential);
the DCT/IDCT, dequantization, upsampling and color transforms are
vectorized across all blocks of a component.  At corpus scale the
decode runs inside ``map_batches`` actors, so the sequential part
parallelizes across documents, not within one.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# --- constants (ITU-T T.81 Annex K) ------------------------------------------

# K.1 / K.2 base quantization tables, natural (row-major) order
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]


def _zigzag_index() -> np.ndarray:
    """ZZ[k] = flat (row*8+col) position of the k-th zigzag coefficient."""
    idx = []
    for s in range(15):
        rows = range(s, -1, -1) if s % 2 == 0 else range(s + 1)
        for r in rows:
            c = s - r
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return np.array(idx, dtype=np.int64)


ZZ = _zigzag_index()

# orthonormal 8-point DCT-II matrix: F = D @ f @ D.T (matches the T.81
# FDCT's 1/4*C(u)*C(v) normalization exactly)
def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    d = np.cos((2 * n[None, :] + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    d[0] /= np.sqrt(2.0)
    return d


DCT_M = _dct_matrix()


def quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the classic IJG quality curve (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# --- bit I/O ------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def raw_marker(self, marker: int) -> None:
        self.pad_to_byte()
        self.out += bytes((0xFF, marker))


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment.

    Handles 0xFF00 stuffing transparently; stops at any real marker
    (leaves position ON the 0xFF) so the caller can consume RSTn / EOI.
    """

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # real marker: feed padding bits, do not advance
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        """Byte-align and consume the RST(idx%8) marker."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (idx % 8):
            raise ValueError("expected restart marker RST%d" % (idx % 8))
        self.pos += 2


# --- Huffman tables ------------------------------------------------------------

def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """value -> (code, length), canonical per T.81 Annex C."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> value."""
    enc = _canonical_codes(bits, vals)
    return {(ln, cd): v for v, (cd, ln) in enc.items()}


def _read_huff(reader: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bit_size(v: int) -> int:
    return int(abs(v)).bit_length()


# --- color transforms -----------------------------------------------------------

def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


# --- block helpers ---------------------------------------------------------------

def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N,8,8) spatial (level-shifted) -> (N,8,8) coefficients."""
    return np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", DCT_M, coeffs, DCT_M)


def _plane_to_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Pad plane (edge-replicate) to bh*8 x bw*8 and cut row-major blocks."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def _blocks_to_plane(blocks: np.ndarray, bw: int, bh: int) -> np.ndarray:
    return (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


# --- encoder ---------------------------------------------------------------------

def _encode_block(wr: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: Dict[int, Tuple[int, int]],
                  ac_codes: Dict[int, Tuple[int, int]]) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _bit_size(diff)
    code, ln = dc_codes[size]
    wr.write(code, ln)
    if size:
        wr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC run-length coding
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            wr.write(c, l)
            run -= 16
        s = _bit_size(v)
        c, l = ac_codes[(run << 4) | s]
        wr.write(c, l)
        wr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        wr.write(c, l)
    return dc


def _prepare_components(arr: np.ndarray, quality: int, subsample: str):
    """Shared front half of both encoders: color transform, subsample,
    FDCT, quantize.  Returns (gray, h, w, samp, qids, qy, qc,
    comp_blocks[zigzag int32 (N,64) per comp], comp_bw, mcus_x, mcus_y)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = quality_tables(quality)
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qtab = [qy]
        qids = [0]
    else:
        ycc = rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "420":
            # pad to even, 2x2 box-average the chroma
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        planes = [y, cb, cr]
        qtab = [qy, qc, qc]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component quantized blocks in row-major block order
    comp_blocks = []
    comp_bw = []
    for plane, (hs, vs), qt in zip(planes, samp, qtab):
        bw, bh = mcus_x * hs, mcus_y * vs
        blocks = _plane_to_blocks(plane, bw, bh) - 128.0
        coeffs = _fdct_blocks(blocks)
        qz = np.round(coeffs / qt).astype(np.int32)
        comp_blocks.append(qz.reshape(-1, 64)[:, ZZ])  # zigzag order
        comp_bw.append(bw)
    return gray, h, w, samp, qids, qy, qc, comp_blocks, comp_bw, mcus_x, mcus_y


def _header_segments(gray, h, w, samp, qids, qy, qc, sof_marker: bytes,
                     huff: list) -> bytearray:
    """SOI + APP0 + DQT + SOFn + DHT header bytes shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qy),) if gray else ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt.reshape(64)[ZZ])
    ncomp = 1 if gray else 3
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        out += bytes((ci + 1, (hs << 4) | vs, qids[ci]))
    for tc_th, bits, vals in huff:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    return out


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) -> baseline JFIF bytes.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2).
    ``restart_interval``: MCUs between RSTn markers (0 = none).
    """
    (gray, h, w, samp, qids, qy, qc, comp_blocks, comp_bw,
     mcus_x, mcus_y) = _prepare_components(arr, quality, subsample)

    ncomp = 1 if gray else 3
    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    enc_tabs = [(dc_y, ac_y)] + [(dc_c, ac_c)] * (ncomp - 1)

    wr = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.raw_marker(0xD0 + (rst_idx % 8))
                rst_idx += 1
                preds = [0] * ncomp
            for ci, (hs, vs) in enumerate(samp):
                bw = comp_bw[ci]
                for v in range(vs):
                    for hh in range(hs):
                        bi = (my * vs + v) * bw + (mx * hs + hh)
                        preds[ci] = _encode_block(
                            wr, comp_blocks[ci][bi], preds[ci], *enc_tabs[ci]
                        )
            mcu_count += 1
    wr.pad_to_byte()

    huff = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        huff += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                 (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    out = _header_segments(gray, h, w, samp, qids, qy, qc, b"\xff\xc0", huff)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        tab = 0x00 if ci == 0 else 0x11
        out += bytes((ci + 1, tab))
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: str = "444", levels: int = 1) -> bytes:
    """HxWx3 uint8 RGB (or HxW gray) -> progressive (SOF2) JFIF bytes.

    Scan script (spectral selection + a ``levels``-deep successive-
    approximation ladder, exercising all four progressive scan kinds):

      1. DC, all components interleaved, Ah=0 Al=levels
      2. per component: AC 1..63, Ah=0 Al=levels
      3. for al = levels-1 .. 0: DC refinement (Ah=al+1, Al=al), then
         per component AC refinement (Ah=al+1, Al=al)
    """
    (gray, h, w, samp, qids, qy, qc, comp_blocks, comp_bw,
     mcus_x, mcus_y) = _prepare_components(arr, quality, subsample)
    ncomp = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (ncomp - 1)
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
        _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ] * (ncomp - 1)

    def sos_header(comp_ids, tabs, ss, se, ah, al) -> bytes:
        ns = len(comp_ids)
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for cid, tb in zip(comp_ids, tabs):
            hdr += bytes((cid, tb))
        return hdr + bytes((ss, se, (ah << 4) | al))

    def dc_first_scan(al: int) -> bytes:
        wr = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (hs, vs) in enumerate(samp):
                    bw = comp_bw[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            dc = int(comp_blocks[ci][(my * vs + v) * bw + (mx * hs + hh)][0])
                            t = dc >> al  # arithmetic shift, like the spec
                            diff = t - preds[ci]
                            preds[ci] = t
                            size = _bit_size(diff)
                            code, ln = dc_codes[ci][size]
                            wr.write(code, ln)
                            if size:
                                wr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        wr.pad_to_byte()
        return bytes(wr.out)

    def dc_refine_scan(al: int) -> bytes:
        wr = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (hs, vs) in enumerate(samp):
                    bw = comp_bw[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            dc = int(comp_blocks[ci][(my * vs + v) * bw + (mx * hs + hh)][0])
                            wr.write((dc >> al) & 1, 1)
        wr.pad_to_byte()
        return bytes(wr.out)

    def _true_blocks(ci: int):
        """Block rows of this component's TRUE (non-MCU-padded) grid."""
        hs, vs = samp[ci]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        bx, by = -(-cw // 8), -(-ch // 8)
        stride = comp_bw[ci]
        for yb in range(by):
            for xb in range(bx):
                yield comp_blocks[ci][yb * stride + xb]

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wr = _BitWriter()
        codes = ac_codes[ci]
        for zz in _true_blocks(ci):
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = (abs(v) >> al) * (1 if v >= 0 else -1)
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    c, l = codes[0xF0]
                    wr.write(c, l)
                    run -= 16
                s = _bit_size(t)
                c, l = codes[(run << 4) | s]
                wr.write(c, l)
                wr.write(t if t >= 0 else t + (1 << s) - 1, s)
                run = 0
            if run:  # trailing zeros -> EOB (run length 1)
                c, l = codes[0x00]
                wr.write(c, l)
        wr.pad_to_byte()
        return bytes(wr.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wr = _BitWriter()
        codes = ac_codes[ci]
        for zz in _true_blocks(ci):
            run = 0
            pending: List[int] = []  # correction bits for passed-over coeffs
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                elif t == 1:  # newly significant in this scan
                    while run > 15:
                        c, l = codes[0xF0]
                        wr.write(c, l)
                        run -= 16
                        for b in pending:
                            wr.write(b, 1)
                        pending = []
                    c, l = codes[(run << 4) | 1]
                    wr.write(c, l)
                    wr.write(1 if v >= 0 else 0, 1)
                    for b in pending:
                        wr.write(b, 1)
                    pending = []
                    run = 0
                else:  # previously significant: buffer its correction bit
                    pending.append(t & 1)
            if run or pending:
                c, l = codes[0x00]  # EOB (run of 1)
                wr.write(c, l)
                for b in pending:
                    wr.write(b, 1)
        wr.pad_to_byte()
        return bytes(wr.out)

    huff = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        huff += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                 (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    out = _header_segments(gray, h, w, samp, qids, qy, qc, b"\xff\xc2", huff)

    all_ids = list(range(1, ncomp + 1))
    dc_tabs = [0x00 if c == 1 else 0x10 for c in all_ids]  # Td<<4 (Ta unused)
    levels = max(1, int(levels))
    # first scans at the coarsest approximation level
    out += sos_header(all_ids, dc_tabs, 0, 0, 0, levels) + dc_first_scan(levels)
    for ci in range(ncomp):
        ta = 0x00 if ci == 0 else 0x01
        out += sos_header([ci + 1], [ta], 1, 63, 0, levels) + ac_first_scan(
            ci, 1, 63, levels
        )
    # refinement ladder: one bit of precision per scan
    for al in range(levels - 1, -1, -1):
        out += sos_header(all_ids, dc_tabs, 0, 0, al + 1, al) + dc_refine_scan(al)
        for ci in range(ncomp):
            ta = 0x00 if ci == 0 else 0x01
            out += sos_header([ci + 1], [ta], 1, 63, al + 1, al) + ac_refine_scan(
                ci, 1, 63, al
            )
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF/JPEG bytes -> HxWx3 uint8 RGB (gray replicated).

    Handles baseline sequential (SOF0/SOF1) and progressive (SOF2:
    spectral selection + successive approximation per T.81 Annex G) —
    multiple scans accumulate into one coefficient store, reconstructed
    once at EOI.  Arithmetic coding / lossless / hierarchical modes
    raise ``NotImplementedError``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    htabs: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hs, vs, qid)], progressive)
    store: List[np.ndarray] = []
    dri = 0
    saw_scan = False
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x00:  # stuffed data byte (e.g. unread scan padding)
            pos += 2
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > n:
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                off += 1
                if pq:
                    vals = np.frombuffer(seg[off : off + 128], dtype=">u2").astype(np.int32)
                    off += 128
                else:
                    vals = np.frombuffer(seg[off : off + 64], dtype=np.uint8).astype(np.int32)
                    off += 64
                nat = np.empty(64, dtype=np.int32)
                nat[ZZ] = vals
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htabs[tc_th] = _decode_map(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            comps = []
            for i in range(nc):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, qid))
            frame = (fh, fw, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            store = [
                np.zeros((mcus_y * vs * mcus_x * hs, 64), dtype=np.int32)
                for (_, hs, vs, _) in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "unsupported JPEG mode (arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_index, dc_table, ac_table)
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((ci, tabs >> 4, tabs & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            pos = _decode_scan(
                payload, pos + 2 + seglen, frame, scan, htabs, dri,
                store, ss, se, ah, al,
            )
            saw_scan = True
            continue
        pos += 2 + seglen
    if not saw_scan:
        raise ValueError("no SOS marker found")
    return _reconstruct(frame, store, qtabs)


def _decode_scan(payload, pos, frame, scan, htabs, dri,
                 store, ss, se, ah, al) -> int:
    """Entropy-decode ONE scan into ``store``; returns the stream
    position after the scan's entropy-coded data.

    Covers all four progressive scan kinds (DC/AC x first/refine) plus
    baseline (ss=0, se=63, ah=al=0) through the same code path: in a
    baseline scan the EOB symbol decodes as an EOB-run of exactly 1,
    which is the baseline meaning.
    """
    fh, fw, comps = frame[0], frame[1], frame[2]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    state = {"eobrun": 0}

    def decode_dc(zz, ci, tdc):
        if ah == 0:  # first scan (or baseline)
            size = _read_huff(reader, htabs[0x00 | tdc])
            diff = _extend(reader.read_bits(size), size) if size else 0
            preds[ci] += diff
            zz[0] = preds[ci] << al
        else:  # refinement: one raw bit
            if reader.read_bits(1):
                zz[0] |= 1 << al

    def decode_ac_first(zz, tac):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_tab = htabs[0x10 | tac]
        k = ss
        while k <= se:
            rs = _read_huff(reader, ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                break
            k += r
            if k > se:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def decode_ac_refine(zz, tac):
        p1, m1 = 1 << al, -(1 << al)

        def correct(k):
            c = int(zz[k])
            if c and reader.read_bits(1) and not (c & p1):
                zz[k] = c + (p1 if c >= 0 else m1)

        k = ss
        if state["eobrun"] == 0:
            ac_tab = htabs[0x10 | tac]
            while k <= se:
                rs = _read_huff(reader, ac_tab)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r < 15:  # EOB-run: includes this block (consumed below)
                        state["eobrun"] = (1 << r) + (reader.read_bits(r) if r else 0)
                        break
                    # r == 15: ZRL — pass 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad refinement symbol")
                    newval = p1 if reader.read_bits(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                correct(k)
                k += 1
            state["eobrun"] -= 1

    def decode_block(zz, ci, tdc, tac):
        if ss == 0:
            decode_dc(zz, ci, tdc)
            if se == 0:
                return
            # baseline: AC follows in the same block
            k = 1
            ac_tab = htabs[0x10 | tac]
            while k <= se:
                rs = _read_huff(reader, ac_tab)
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 15
                if k > se:
                    raise ValueError("AC coefficient index overflow")
                zz[k] = _extend(reader.read_bits(s), s)
                k += 1
        elif ah == 0:
            decode_ac_first(zz, tac)
        else:
            decode_ac_refine(zz, tac)

    rst_idx = 0
    if len(scan) > 1:
        # interleaved scan (ns > 1, T.81 A.2.3): MCU order, padded grid
        nmcu = mcus_x * mcus_y
        for m in range(nmcu):
            if dri and m and m % dri == 0:
                reader.align_and_expect_rst(rst_idx)
                rst_idx += 1
                preds = [0] * len(comps)
                state["eobrun"] = 0
            my, mx = divmod(m, mcus_x)
            for (ci, tdc, tac) in scan:
                _, hs, vs, _ = comps[ci]
                bw = mcus_x * hs
                for v in range(vs):
                    for hh in range(hs):
                        zz = store[ci][(my * vs + v) * bw + (mx * hs + hh)]
                        decode_block(zz, ci, tdc, tac)
    else:
        # non-interleaved: the component's TRUE block grid (T.81 A.2.2),
        # indexed into the MCU-padded store
        ci, tdc, tac = scan[0]
        _, hs, vs, _ = comps[ci]
        cw = -(-fw * hs // hmax)
        ch = -(-fh * vs // vmax)
        bx, by = -(-cw // 8), -(-ch // 8)
        stride = mcus_x * hs
        nblk = 0
        for yb in range(by):
            for xb in range(bx):
                if dri and nblk and nblk % dri == 0:
                    reader.align_and_expect_rst(rst_idx)
                    rst_idx += 1
                    preds = [0] * len(comps)
                    state["eobrun"] = 0
                decode_block(store[ci][yb * stride + xb], ci, tdc, tac)
                nblk += 1

    # step past any partial byte; caller resumes marker parsing here
    return reader.pos


def _reconstruct(frame, store, qtabs) -> np.ndarray:
    """Dequantize + IDCT + reassemble, all vectorized per component."""
    fh, fw, comps = frame[0], frame[1], frame[2]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    planes = []
    for (cid, hs, vs, qid), zzc in zip(comps, store):
        nat = np.zeros_like(zzc)
        nat[:, ZZ] = zzc
        coeffs = nat.reshape(-1, 8, 8).astype(np.float64) * qtabs[qid]
        blocks = _idct_blocks(coeffs) + 128.0
        bw, bh = mcus_x * hs, mcus_y * vs
        plane = _blocks_to_plane(blocks, bw, bh)
        # crop to this component's true size, then upsample by replication
        ch = -(-fh * vs // vmax)
        cw = -(-fw * hs // hmax)
        plane = plane[:ch, :cw]
        if vs != vmax or hs != hmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        g = np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])
