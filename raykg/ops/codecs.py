"""Pure-python/numpy media codecs — no external library needed.

PIL / libsndfile / ffmpeg are not available in this environment, but
these classic formats decode with the stdlib alone, so the multimodal
stages (`ops/multimodal.py`) decode them for REAL:

- **PPM (P6)** binary portable pixmap, maxval 255 — 2-byte magic header.
- **BMP** Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up
  rows with 4-byte padding (the only variant these codecs emit; the
  decoder validates and rejects anything else).
- **WAV** RIFF PCM 16-bit via the stdlib ``wave`` module.
- **PNG** 8-bit gray / RGB / palette / gray+alpha / RGBA, interlaced or
  not: stdlib ``zlib`` inflate + all five scanline filters (None/Sub/Up/
  Average/Paeth, RFC 2083 §6) and Adam7 de-interlacing (§2.6).
- **GIF** 87a/89a with global or local color tables: a full LZW
  decoder (variable code width 3–12 bits, clear/end codes); multi-frame
  GIFs double as a video container (`decode_gif_frames`).
- **PPM stream**: concatenated P6 frames as a minimal video container
  (each frame self-describes its size, so the stream parses without an
  index).

- **JPEG** baseline (SOF0/SOF1) AND progressive (SOF2: spectral
  selection + successive approximation) live in ``ops/jpeg.py`` —
  Annex-K tables, numpy DCT, Huffman entropy coding, 4:2:0/4:2:2/4:4:4,
  restart markers; ``decode_image`` dispatches to it by magic bytes.
- **MJPEG**: concatenated JPEG frames as the intra-only video container
  (AVI/MOV's classic payload); the splitter is marker-aware.
- **G.711 mu-law / A-law WAV** (format tags 0x07/0x06): the ITU-T
  telephony companding codecs, vectorized compress + exact 256-entry
  expansion tables.
- **IMA ADPCM WAV** (format tag 0x11): 4-bit adaptive-delta compressed
  audio, step/index tables from the IMA spec.
- **FLAC** (lossless audio) lives in ``ops/flac.py`` — rice-coded
  fixed/LPC predictors, CRC-8/16 + audio-MD5 verified;
  ``decode_audio`` dispatches WAV vs FLAC by magic bytes.

- **MP4 / ISO-BMFF** container mux + demux lives in ``ops/mp4.py`` —
  box-tree walk + stsd/stts/stsc/stsz/stco sample extraction, with
  real PCM (sowt/twos) and MJPEG ('jpeg') track decode.
- **MP3** (MPEG-1 Layer III) bitstream decode lives in ``ops/mp3.py``
  — frame sync, side info, bit reservoir, Huffman, requantization,
  alias reduction, IMDCT across all window layouts (normal/start/stop/
  short/mixed) and stereo modes (mono/LR/MS); the polyphase synthesis
  window (ISO Table 3-B.3, pure table data) is its one documented
  plug-point.

Still raising ``NotImplementedError``: arithmetic-coded / lossless /
hierarchical JPEG, AAC-in-MP4, the remaining MP3 Huffman pair tables
(4-31, pure Annex-B data) and the MP3 synthesis window — each a
documented data/codec plug-point beside a real decoder.
"""
from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import List, Tuple

import numpy as np


# --- PPM (P6) ---------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary P6."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM needs HxWx3 RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _parse_ppm_header(payload: bytes, off: int) -> Tuple[int, int, int]:
    """Returns (width, height, data_offset) for the P6 frame at ``off``."""
    if payload[off : off + 2] != b"P6":
        raise ValueError("not a P6 ppm")
    fields: List[int] = []
    i = off + 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    if fields[2] != 255:
        raise NotImplementedError("only maxval=255 P6 supported")
    return fields[0], fields[1], i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    w, h, off = _parse_ppm_header(payload, 0)
    n = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    return data.reshape(h, w, 3)


def decode_ppm_stream(payload: bytes) -> List[np.ndarray]:
    """Concatenated P6 frames -> list of HxWx3 arrays."""
    frames: List[np.ndarray] = []
    off = 0
    while off < len(payload):
        w, h, doff = _parse_ppm_header(payload, off)
        n = w * h * 3
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=n, offset=doff).reshape(
                h, w, 3
            )
        )
        off = doff + n
    return frames


def encode_ppm_stream(frames: List[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


# --- BMP (BITMAPINFOHEADER, 24bpp BI_RGB) -----------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("BMP needs HxWx3 RGB")
    row = w * 3
    pad = (4 - row % 4) % 4
    data_size = (row + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + data_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    body = bytearray()
    bgr = arr[:, :, ::-1].astype(np.uint8)  # BMP stores BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    return header + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0 or h <= 0:
        raise NotImplementedError("only uncompressed bottom-up 24bpp BMP supported")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    off = data_off
    for y in range(h - 1, -1, -1):
        out[y] = (
            np.frombuffer(payload, dtype=np.uint8, count=row, offset=off)
            .reshape(w, 3)[:, ::-1]  # BGR -> RGB
        )
        off += row + pad
    return out


# --- WAV (PCM16 via stdlib) ---------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> Tuple[int, np.ndarray]:
    tag = _wav_format_tag(payload)
    if tag == 0x11:  # IMA ADPCM
        return decode_wav_adpcm(payload)
    if tag in (0x06, 0x07):  # G.711 A-law / mu-law
        return decode_wav_g711(payload)
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
        samples = np.frombuffer(raw, dtype="<i2")
        if f.getnchannels() > 1:
            samples = samples.reshape(-1, f.getnchannels()).mean(axis=1).astype("<i2")
    return rate, samples


# --- IMA ADPCM WAV (format tag 0x11): real COMPRESSED audio decode ------------
#
# 4-bit IMA/DVI ADPCM, the classic adaptive-step-size delta codec — pure
# public integer arithmetic (step + index tables from the IMA spec), so
# compressed audio decodes for real with no library.  Mono only (the
# variant these codecs emit; the decoder validates).

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def _ima_step_nibble(pred: int, idx: int, nib: int) -> Tuple[int, int]:
    """One IMA decode step: (pred, idx) + 4-bit code -> new (pred, idx)."""
    step = int(_IMA_STEP[idx])
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_INDEX[nib])))
    return pred, idx


def _wav_format_tag(payload: bytes) -> int:
    """wFormatTag from the fmt chunk (0 if not a parseable WAV)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return 0
    pos = 12
    while pos + 8 <= len(payload):
        cid, ln = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            return struct.unpack_from("<H", payload, pos + 8)[0]
        pos += 8 + ln + (ln & 1)
    return 0


def encode_wav_adpcm(samples: np.ndarray, rate: int = 16000,
                     block_align: int = 256) -> bytes:
    """int16 mono -> IMA ADPCM WAV (format 0x11), 4 bits/sample."""
    samples = samples.astype(np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block (header carries one)
    n = len(samples)
    blocks = bytearray()
    idx = 0
    pos = 0
    while pos < n:
        chunk = samples[pos : pos + spb]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEP[idx])
            delta = int(s) - pred
            nib = 8 if delta < 0 else 0
            d = -delta if delta < 0 else delta
            if d >= step:
                nib |= 4
                d -= step
            if d >= step >> 1:
                nib |= 2
                d -= step >> 1
            if d >= step >> 2:
                nib |= 1
            pred, idx = _ima_step_nibble(pred, idx, nib)
            nibbles.append(nib)
        # pad the block's data area (low nibble first within each byte)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))
        pos += spb
    byte_rate = rate * block_align // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", len(out)) + out


def decode_wav_adpcm(payload: bytes) -> Tuple[int, np.ndarray]:
    """IMA ADPCM WAV (format 0x11, mono) -> (rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = data = None
    total = None
    while pos + 8 <= len(payload):
        cid, ln = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            total = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x11 or bits != 4:
        raise NotImplementedError("only 4-bit IMA ADPCM (format 0x11)")
    if channels != 1:
        raise NotImplementedError("only mono IMA ADPCM")
    spb = (block_align - 4) * 2 + 1
    out: List[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break  # truncated trailing fragment
        pred, idx = struct.unpack_from("<hB", block, 0)
        idx = max(0, min(88, idx))
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                pred, idx = _ima_step_nibble(pred, idx, nib)
                out.append(pred)
    if total is not None:
        out = out[:total]
    return rate, np.array(out, dtype=np.int16)


# --- G.711 mu-law / A-law WAV (format tags 0x07 / 0x06) ------------------------
#
# The ITU-T G.711 companding codecs — 8 bits/sample logarithmic PCM, the
# telephony standard.  Pure public integer arithmetic (segment/quantile
# bit layout from the spec), fully vectorized; expansion is an exact
# 256-entry table, which is what makes decoded sums SQL-mirrorable.

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def _ulaw_expand_table() -> np.ndarray:
    v = np.arange(256, dtype=np.int32) ^ 0xFF  # ~u for every code byte
    t = (((v & 0x0F) << 3) + _ULAW_BIAS) << ((v >> 4) & 7)
    return np.where(v & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def _alaw_expand_table() -> np.ndarray:
    v = np.arange(256, dtype=np.int32) ^ 0x55
    mant, seg = (v & 0x0F) << 4, (v >> 4) & 7
    t = np.where(seg == 0, mant + 8, (mant + 0x108) << np.maximum(seg - 1, 0))
    return np.where(v & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _ulaw_expand_table()
_ALAW_TABLE = _alaw_expand_table()


def ulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 mu-law code bytes (vectorized linear2ulaw)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS  # in [132, 32767]
    exp = np.floor(np.log2(mag)).astype(np.int32) - 7  # exact: bounds are 2^k
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 A-law code bytes (vectorized linear2alaw)."""
    x = samples.astype(np.int32) >> 3  # to 13-bit magnitude domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(
        np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]),
        mag, side="left",
    ).astype(np.int32)
    seg = np.minimum(seg, 7)
    aval = (seg << 4) | ((mag >> np.where(seg < 2, 1, seg)) & 0x0F)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def _wrap_wav_g711(codes: bytes, rate: int, tag: int) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    fact = struct.pack("<I", len(codes))
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(codes)) + codes
    if len(codes) & 1:
        out += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(out)) + out


def wrap_wav_ulaw(codes: bytes, rate: int = 8000) -> bytes:
    """Raw mu-law code bytes -> WAV container (format tag 0x07)."""
    return _wrap_wav_g711(codes, rate, 0x07)


def wrap_wav_alaw(codes: bytes, rate: int = 8000) -> bytes:
    """Raw A-law code bytes -> WAV container (format tag 0x06)."""
    return _wrap_wav_g711(codes, rate, 0x06)


def encode_wav_ulaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono -> G.711 mu-law WAV (format 0x07), 8 bits/sample."""
    return _wrap_wav_g711(ulaw_compress(samples).tobytes(), rate, 0x07)


def encode_wav_alaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono -> G.711 A-law WAV (format 0x06), 8 bits/sample."""
    return _wrap_wav_g711(alaw_compress(samples).tobytes(), rate, 0x06)


def decode_wav_g711(payload: bytes) -> Tuple[int, np.ndarray]:
    """G.711 WAV (format 0x06 A-law / 0x07 mu-law, mono) -> (rate, int16)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = data = None
    total = None
    while pos + 8 <= len(payload):
        cid, ln = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            total = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag not in (0x06, 0x07) or bits != 8:
        raise NotImplementedError("only 8-bit G.711 (format 0x06/0x07)")
    if channels != 1:
        raise NotImplementedError("only mono G.711")
    codes = np.frombuffer(data, dtype=np.uint8)
    if total is not None:
        codes = codes[:total]
    table = _ULAW_TABLE if tag == 0x07 else _ALAW_TABLE
    return rate, table[codes]


# --- PNG (stdlib zlib; 8-bit depth, filters 0-4, no interlace) ----------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, line: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    """Forward filter (encoder side) — the exact inverse of _png_unfilter."""
    line = line.astype(np.int64)
    a = np.zeros_like(line)
    a[bpp:] = line[:-bpp]
    b = prev.astype(np.int64)
    c = np.zeros_like(b)
    c[bpp:] = b[:-bpp]
    if ftype == 0:
        out = line
    elif ftype == 1:
        out = line - a
    elif ftype == 2:
        out = line - b
    elif ftype == 3:
        out = line - (a + b) // 2
    elif ftype == 4:
        p = a + b - c
        pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))
        out = line - pred
    else:
        raise ValueError(f"bad PNG filter {ftype}")
    return (out % 256).astype(np.uint8)


# Adam7 pass grid (RFC 2083 §2.6): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(arr: np.ndarray, filter_type: int = 0, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB -> PNG (color type 2, bit depth 8).  ``filter_type``
    applies one filter to every scanline — 0 for speed; 1-4 exist so tests
    can exercise every decoder unfilter path.  ``interlace`` writes the
    seven Adam7 passes (each pass filtered as its own sub-image)."""
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_png needs HxWx3 RGB")
    arr = arr.astype(np.uint8)
    raw = bytearray()
    passes = (
        [arr[ys::yst, xs::xst] for xs, ys, xst, yst in _ADAM7]
        if interlace
        else [arr]
    )
    for sub in passes:
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue  # empty pass contributes no bytes at all
        prev = np.zeros(pw * 3, dtype=np.uint8)
        for y in range(ph):
            line = np.ascontiguousarray(sub[y]).reshape(-1)
            raw.append(filter_type)
            raw += _png_filter_row(filter_type, line, prev, 3).tobytes()
            prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_adam7(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """De-interlace the 7 Adam7 passes of an unfiltered-per-pass IDAT
    stream into one (height, width, ch) pixel array."""
    out = np.zeros((height, width, ch), dtype=np.uint8)
    pos = 0
    for xs, ys, xst, yst in _ADAM7:
        pw = (width - xs + xst - 1) // xst
        ph = (height - ys + yst - 1) // yst
        if pw == 0 or ph == 0:
            continue
        stride = pw * ch
        need = (stride + 1) * ph
        recon = _png_unfilter(raw[pos : pos + need], ph, stride, ch)
        pos += need
        out[ys::yst, xs::xst] = recon.reshape(ph, pw, ch)
    if pos != len(raw):
        raise ValueError("PNG Adam7 IDAT length mismatch")
    return out


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters -> (h, stride) uint8 recon array.
    None/Up are fully vectorized; Sub is a per-lane modular cumsum;
    Average/Paeth are sequential along x by definition (each byte needs
    the already-reconstructed left neighbor)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos)
        pos += stride
        prev = out[y - 1] if y else zero_row
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up (uint8 addition wraps mod 256 by itself)
            out[y] = line + prev
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp] -> lane cumsum
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            out[y] = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        elif ftype == 3:  # Average
            cur = out[y]
            li = line.astype(np.int64)
            pv = prev.astype(np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (li[x] + ((a + pv[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            li = line.astype(np.int64)
            pv = prev.astype(np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(pv[x])
                c = int(pv[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                cur[x] = (li[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {ftype} at row {y}")
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 RGB (alpha dropped, gray replicated, palette
    resolved).  Supports bit depth 8, color types 0/2/3/4/6, and both
    interlace methods (none / Adam7)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    ctype_ = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, chunk = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if chunk == b"IHDR":
            width, height, depth, ctype_, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if ctype_ not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype_}")
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace}")
        elif chunk == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif chunk == b"IDAT":
            idat += data
        elif chunk == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[ctype_]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if interlace:
        px = _png_adam7(raw, width, height, ch)
    else:
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG IDAT length mismatch")
        recon = _png_unfilter(raw, height, stride, ch)
        px = recon.reshape(height, width, ch)
    if ctype_ == 2:
        return px
    if ctype_ == 6:
        return px[:, :, :3]
    if ctype_ == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_ == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    return plte[px[:, :, 0]]


# --- GIF (87a/89a, LZW) -------------------------------------------------------

def _lzw_decode(data: bytes, min_code: int) -> List[int]:
    """GIF-flavor LZW: LSB-first bitstream, variable code width
    ``min_code+1``..12, clear/end codes."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    table: List[Tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    next_code = end + 1
    out: List[int] = []
    prev: Tuple[int, ...] = ()
    acc = 0
    bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = [(i,) for i in range(clear)] + [(), ()]
                next_code = end + 1
                width = min_code + 1
                prev = ()
                continue
            if code == end:
                return out
            if not prev:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + (entry[0],))
                next_code += 1
            elif code == next_code:
                entry = prev + (prev[0],)
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            if prev and next_code == (1 << width) and width < 12:
                width += 1
            out.extend(entry)
            prev = entry
    return out


def _lzw_encode(indices: List[int], min_code: int) -> bytes:
    """Mirror image of ``_lzw_decode``: the decoder's table lags the
    encoder's by one entry (it adds an entry per RECEIVED code from the
    second after a clear), so the code width is driven by a simulated
    decoder next_code (``dec_next``), not the encoder's own."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1  # encoder's own next entry id
    dec_next = end + 1   # the decoder's simulated next_code
    first = True         # no decoder entry for the first code after clear
    outbuf = bytearray()
    acc = 0
    bits = 0

    def putbits(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            outbuf.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    def emit(code: int) -> None:
        # width may only grow AFTER this code is written (the decoder
        # grows after processing it)
        nonlocal first, dec_next, width
        putbits(code)
        if first:
            first = False
            return
        dec_next += 1
        if dec_next == (1 << width) and width < 12:
            width += 1

    putbits(clear)
    buf: Tuple[int, ...] = ()
    for k in indices:
        cand = buf + (int(k),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code == 4096:  # decoder table would overflow: hard reset
            putbits(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            dec_next = end + 1
            width = min_code + 1
            first = True
        buf = (int(k),)
    if buf:
        emit(table[buf])
    emit(end)
    if bits:
        outbuf.append(acc & 0xFF)
    return bytes(outbuf)

def _gif_interlace_order(h: int) -> np.ndarray:
    """Destination row of each STORED row for a GIF 4-pass interlaced
    frame (GIF89a Appendix E): rows 0,8,16.. then 4,12.. then 2,6.. then
    odd rows."""
    return np.concatenate(
        [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )


def encode_gif(frames: List[np.ndarray], interlace: bool = False) -> bytes:
    """List of HxWx3 uint8 frames (same size, <=256 distinct colors across
    all frames) -> multi-frame GIF89a with one global color table.
    ``interlace`` stores every frame's rows in 4-pass interlaced order."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w, _ = frames[0].shape
    allpx = np.concatenate([f.reshape(-1, 3).astype(np.uint8) for f in frames])
    palette, inverse = np.unique(allpx, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(palette)}")
    # color-table size field: 2^(n+1) entries, padded
    n = 0
    while (2 << n) < max(2, len(palette)):
        n += 1
    pal = np.zeros((2 << n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    min_code = max(2, n + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n << 4) | n, 0, 0)
    out += pal.tobytes()
    pos = 0
    for f in frames:
        npx = f.shape[0] * f.shape[1]
        idx = inverse[pos : pos + npx]
        pos += npx
        if interlace:
            idx = idx.reshape(h, w)[_gif_interlace_order(h)].reshape(-1)
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        out.append(min_code)
        data = _lzw_encode(idx.tolist(), min_code)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(payload: bytes) -> List[np.ndarray]:
    """GIF -> list of HxWx3 uint8 frames (full logical-screen frames; no
    disposal compositing — each frame renders over black).  Interlaced
    frames de-interlace (GIF89a 4-pass row order)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    frames: List[np.ndarray] = []
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label byte + data sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
            pos += size * 3
        if ct is None:
            raise ValueError("GIF frame without any color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(bytes(data), min_code), dtype=np.int64)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        px = ct[idx[: fw * fh]].reshape(fh, fw, 3)
        if iflags & 0x40:  # interlaced: rows stored in 4-pass order
            px = px[np.argsort(_gif_interlace_order(fh), kind="stable")]
        frame = np.zeros((h, w, 3), dtype=np.uint8)
        frame[top : top + fh, left : left + fw] = px
        frames.append(frame)
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    return decode_gif_frames(payload)[0]


# --- MJPEG (concatenated JPEG frames as a video container) ---------------------
#
# Motion JPEG: each frame is an independent JPEG stream (SOI..EOI), laid
# back to back — the classic intra-only video payload inside AVI/MOV.
# The splitter is marker-aware (length-prefixed segments are skipped
# wholesale, entropy data is scanned honoring byte stuffing and RSTn),
# so an FFD9 inside an APP/COM segment can never split a frame.

def encode_mjpeg(frames: List[np.ndarray], quality: int = 90,
                 subsample: str = "420", **kw) -> bytes:
    """List of HxWx3 uint8 frames -> concatenated baseline JPEGs."""
    from raykg.ops.jpeg import encode_jpeg

    return b"".join(encode_jpeg(f, quality=quality, subsample=subsample, **kw)
                    for f in frames)


def split_mjpeg(payload: bytes) -> List[bytes]:
    """Concatenated JPEG streams -> list of single-frame JPEG payloads."""
    frames: List[bytes] = []
    i, n = 0, len(payload)
    while i < n:
        if payload[i : i + 2] != b"\xff\xd8":
            raise ValueError("expected SOI at MJPEG frame boundary")
        start = i
        i += 2
        eoi = False
        while i < n and not eoi:
            if payload[i] != 0xFF:
                i += 1  # entropy-coded data
                continue
            j = i + 1
            while j < n and payload[j] == 0xFF:
                j += 1  # fill bytes
            if j >= n:
                break
            m = payload[j]
            if m == 0x00 or 0xD0 <= m <= 0xD7:  # stuffed FF / RSTn
                i = j + 1
            elif m == 0xD9:  # EOI
                i = j + 1
                frames.append(payload[start:i])
                eoi = True
            elif m == 0x01:  # TEM (standalone)
                i = j + 1
            else:  # length-prefixed segment (incl. SOS header)
                if j + 3 > n:
                    break
                i = j + 1 + struct.unpack_from(">H", payload, j + 1)[0]
        if not eoi:
            raise ValueError("truncated MJPEG stream (missing EOI)")
    return frames


def decode_mjpeg_frames(payload: bytes) -> List[np.ndarray]:
    """MJPEG payload -> list of HxWx3 decoded frames."""
    from raykg.ops.jpeg import decode_jpeg

    return [decode_jpeg(f) for f in split_mjpeg(payload)]


# --- sniffing + resize --------------------------------------------------------

def sniff(payload: bytes) -> str:
    """'ppm'|'bmp'|'png'|'gif'|'jpeg'|'wav'|'unknown' by magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_audio(payload: bytes) -> Tuple[int, np.ndarray]:
    """Audio container dispatch -> (rate, int16 samples): RIFF/WAVE
    (PCM, IMA ADPCM, G.711 u-law/A-law) or native FLAC (``ops/flac.py``)."""
    kind = sniff(payload)
    if kind == "wav":
        return decode_wav(payload)
    if kind == "flac":
        from raykg.ops.flac import decode_flac

        return decode_flac(payload)
    if kind == "mp4":
        from raykg.ops.mp4 import decode_mp4_audio

        return decode_mp4_audio(payload)
    raise NotImplementedError(
        "unrecognized audio container; supported: WAV (PCM/ADPCM/G.711), "
        "FLAC, MP4 (PCM tracks; AAC and MP3 synthesis remain the codec "
        "plug-points)"
    )


def decode_image(payload: bytes) -> np.ndarray:
    kind = sniff(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "gif":
        return decode_gif(payload)
    if kind == "jpeg":
        from raykg.ops.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "unrecognized image container; supported: PPM, BMP, PNG, GIF, "
        "JPEG baseline+progressive (MP3 / MP4 remain the library "
        "plug-point)"
    )


def nn_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling), HxWx3 -> height x width x 3."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys][:, xs]
