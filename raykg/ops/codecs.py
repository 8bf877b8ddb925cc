"""Pure-python/numpy media codecs for the uncompressed container formats.

PIL / libsndfile / ffmpeg are not available in this environment, but the
classic uncompressed formats need no external library, so the multimodal
stages (`ops/multimodal.py`) decode these for REAL:

- **PPM (P6)** binary portable pixmap, maxval 255 — 2-byte magic header.
- **BMP** Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up
  rows with 4-byte padding (the only variant these codecs emit; the
  decoder validates and rejects anything else).
- **WAV** RIFF PCM 16-bit via the stdlib ``wave`` module.
- **PPM stream**: concatenated P6 frames as a minimal video container
  (each frame self-describes its size, so the stream parses without an
  index).

Compressed formats (JPEG/PNG/MP3/MP4…) still raise
``NotImplementedError`` — that is the honest plug-point for a real
decoder library on a production image.
"""
from __future__ import annotations

import io
import struct
import wave
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
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
        samples = np.frombuffer(raw, dtype="<i2")
        if f.getnchannels() > 1:
            samples = samples.reshape(-1, f.getnchannels()).mean(axis=1).astype("<i2")
    return rate, samples


# --- sniffing + resize --------------------------------------------------------

def sniff(payload: bytes) -> str:
    """'ppm' | 'bmp' | 'wav' | 'unknown' by magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_image(payload: bytes) -> np.ndarray:
    kind = sniff(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image formats need PIL (not in env); supported: PPM, BMP"
    )


def nn_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling), HxWx3 -> height x width x 3."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys][:, xs]
