"""MP4 / ISO Base Media File Format (ISO 14496-12) mux + demux in pure
python — the container half of the "MP3/MP4" media gap, closed for REAL.

The BMFF box grammar is fully structural (length-prefixed nested boxes;
sample layout described by the stbl tables stsd/stts/stsc/stsz/stco), so
a from-scratch demuxer is exactly verifiable with no codec tables:

- **demux**: walk the box tree, locate each ``trak``, read its sample
  table, and slice every sample's bytes out of ``mdat`` via the
  chunk-offset (stco) + sample-to-chunk (stsc) + sample-size (stsz)
  mapping — the same three-table walk every real demuxer does.
- **audio tracks**: ``sowt`` (little-endian) / ``twos`` (big-endian)
  uncompressed 16-bit PCM sample entries decode to int16 for real —
  lossless, so round-trips are bit-exact and a SQL oracle can mirror
  decoded sums in integer arithmetic.
- **video tracks**: ``jpeg`` sample entries (the classic QuickTime
  MJPEG-in-MP4 payload) decode per-frame through ``ops/jpeg.py``.
- **mux**: a minimal single-track writer (ftyp/mdat/moov) used by the
  fixture pipeline; it emits the same tables the demuxer reads, with
  multi-chunk layouts so the stsc/stco walk is genuinely exercised.

Compressed audio inside MP4 (AAC ``mp4a``) remains the documented codec
plug-point, exactly like MP3 synthesis — the CONTAINER is fully real.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "encode_mp4_audio", "encode_mp4_mjpeg", "parse_mp4",
    "decode_mp4_audio", "decode_mp4_frames",
]


# --- box writers --------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def _stts(n_samples: int, delta: int) -> bytes:
    return _full(b"stts", 0, 0, struct.pack(">III", 1, n_samples, delta))


def _stsc(runs: List[Tuple[int, int]]) -> bytes:
    """runs = [(first_chunk_1based, samples_per_chunk), ...]"""
    body = struct.pack(">I", len(runs))
    for first, spc in runs:
        body += struct.pack(">III", first, spc, 1)  # desc index 1
    return _full(b"stsc", 0, 0, body)


def _stsz(uniform: int, sizes: Optional[List[int]], count: int) -> bytes:
    if uniform:
        return _full(b"stsz", 0, 0, struct.pack(">II", uniform, count))
    body = struct.pack(">II", 0, len(sizes))
    for s in sizes:
        body += struct.pack(">I", s)
    return _full(b"stsz", 0, 0, body)


def _stco(offsets: List[int]) -> bytes:
    body = struct.pack(">I", len(offsets))
    for o in offsets:
        body += struct.pack(">I", o)
    return _full(b"stco", 0, 0, body)


def _tkhd(track_id: int, duration: int, w: int = 0, h: int = 0) -> bytes:
    body = struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    body += b"\x00" * 8  # reserved
    body += struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, rsvd
    # identity matrix (16.16 / 2.30 fixed point)
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += struct.pack(">II", w << 16, h << 16)
    return _full(b"tkhd", 0, 7, body)  # flags: enabled|in_movie|in_preview


def _mdhd(timescale: int, duration: int) -> bytes:
    return _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + name + b"\x00")


def _dinf() -> bytes:
    url = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    return _box(b"dinf", dref)


def _audio_stsd(fmt: bytes, channels: int, bits: int, rate: int) -> bytes:
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_idx
        + struct.pack(">HHHHHH", 0, 0, 0, 0, channels, bits)
        + struct.pack(">HHI", 0, 0, rate << 16)
    )
    return _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(fmt, entry))


def _video_stsd(fmt: bytes, w: int, h: int) -> bytes:
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHIII", 0, 0, 0, 0, 0)      # predefined/reserved
        + struct.pack(">HHIIIH", w, h, 0x480000, 0x480000, 0, 1)
        + b"\x00" * 32                                # compressor name
        + struct.pack(">Hh", 24, -1)                  # depth, color table
    )
    return _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(fmt, entry))


def _moov(timescale: int, duration: int, stbl_children: bytes,
          handler: bytes, handler_name: bytes, mhd: bytes,
          w: int = 0, h: int = 0) -> bytes:
    stbl = _box(b"stbl", stbl_children)
    minf = _box(b"minf", mhd + _dinf() + stbl)
    mdia = _box(b"mdia", _mdhd(timescale, duration) + _hdlr(handler, handler_name) + minf)
    trak = _box(b"trak", _tkhd(1, duration, w, h) + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    return _box(b"moov", mvhd + trak)


_FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")


def encode_mp4_audio(
    samples: np.ndarray, rate: int = 16000, samples_per_chunk: int = 4096
) -> bytes:
    """Mono int16 PCM -> MP4 with one ``sowt`` (LE PCM) audio track,
    chunked so the stsc/stco walk is exercised (lossless: bit-exact
    round-trip)."""
    pcm = samples.astype("<i2").tobytes()
    n = len(samples)
    n_chunks = max(1, (n + samples_per_chunk - 1) // samples_per_chunk)
    mdat = _box(b"mdat", pcm)
    mdat_off = len(_FTYP) + 8  # payload offset of mdat within the file
    offsets, runs = [], []
    for c in range(n_chunks):
        offsets.append(mdat_off + c * samples_per_chunk * 2)
    last = n - (n_chunks - 1) * samples_per_chunk
    runs.append((1, min(samples_per_chunk, n)))
    if n_chunks > 1 and last != samples_per_chunk:
        runs.append((n_chunks, last))
    stbl = (
        _audio_stsd(b"sowt", 1, 16, rate)
        + _stts(n, 1)
        + _stsc(runs)
        + _stsz(2, None, n)
        + _stco(offsets)
    )
    smhd = _full(b"smhd", 0, 0, struct.pack(">Hh", 0, 0))
    moov = _moov(rate, n, stbl, b"soun", b"SoundHandler", smhd)
    return _FTYP + mdat + moov


def encode_mp4_mjpeg(frames: List[bytes], fps: int = 10,
                     width: int = 0, height: int = 0) -> bytes:
    """JPEG payloads -> MP4 with one ``jpeg`` (MJPEG) video track, one
    sample per frame, all frames in one chunk."""
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_off = len(_FTYP) + 8
    stbl = (
        _video_stsd(b"jpeg", width, height)
        + _stts(len(frames), 1)
        + _stsc([(1, len(frames))])
        + _stsz(0, [len(f) for f in frames], len(frames))
        + _stco([mdat_off])
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    moov = _moov(fps, len(frames), stbl, b"vide", b"VideoHandler", vmhd,
                 w=width, h=height)
    return _FTYP + mdat + moov


# --- demux --------------------------------------------------------------------

def _walk(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each box in a range."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", payload, pos)
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, body, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(payload, start, end):
        if t == btype:
            return b, e
    return None


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def parse_mp4(payload: bytes) -> List[Dict]:
    """Box-tree demux -> one dict per track:
    {handler, format, timescale, duration, samples: [bytes, ...],
     channels, sample_bits, rate (audio); width, height (video)}."""
    if payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    end = len(payload)
    moov = _find(payload, 0, end, b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    tracks: List[Dict] = []
    for t, b, e in _walk(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        info: Dict = {}
        mdhd = _find(payload, *mdia, b"mdhd")
        if mdhd:
            ver = payload[mdhd[0]]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", payload, mdhd[0] + 4 + 16)
            else:
                _c, _m, ts, dur = struct.unpack_from(">IIII", payload, mdhd[0] + 4)
            info["timescale"], info["duration"] = ts, dur
        hdlr = _find(payload, *mdia, b"hdlr")
        info["handler"] = (
            payload[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1") if hdlr else ""
        )
        minf = _find(payload, *mdia, b"minf")
        stbl = _find(payload, *minf, b"stbl") if minf else None
        if stbl is None:
            continue
        # stsd: first sample entry's format (+ audio/video fields)
        stsd = _find(payload, *stbl, b"stsd")
        sb = stsd[0] + 8  # version/flags + entry_count
        esize, fmt = struct.unpack_from(">I4s", payload, sb)
        info["format"] = fmt.decode("latin1")
        if info["handler"] == "soun":
            ch, bits = struct.unpack_from(">HH", payload, sb + 8 + 16)
            rate = struct.unpack_from(">I", payload, sb + 8 + 24)[0] >> 16
            info.update(channels=ch, sample_bits=bits, rate=rate)
        elif info["handler"] == "vide":
            w, h = struct.unpack_from(">HH", payload, sb + 8 + 24)
            info.update(width=w, height=h)
        # sample tables
        stsz_b, _ = _find(payload, *stbl, b"stsz")
        uniform, count = struct.unpack_from(">II", payload, stsz_b + 4)
        if uniform:
            sizes = [uniform] * count
        else:
            sizes = list(
                struct.unpack_from(f">{count}I", payload, stsz_b + 12)
            )
        stco_b, _ = _find(payload, *stbl, b"stco")
        n_chunks = struct.unpack_from(">I", payload, stco_b + 4)[0]
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco_b + 8))
        stsc_b, _ = _find(payload, *stbl, b"stsc")
        n_runs = struct.unpack_from(">I", payload, stsc_b + 4)[0]
        runs = [
            struct.unpack_from(">III", payload, stsc_b + 8 + 12 * i)[:2]
            for i in range(n_runs)
        ]
        # expand samples-per-chunk across chunks, then slice mdat
        spc = np.zeros(n_chunks, dtype=np.int64)
        for i, (first, per) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            spc[first - 1 : last] = per
        samples: List[bytes] = []
        si = 0
        for c in range(n_chunks):
            off = offsets[c]
            for _ in range(int(spc[c])):
                if si >= count:
                    break
                samples.append(payload[off : off + sizes[si]])
                off += sizes[si]
                si += 1
        if si != count:
            raise ValueError(
                f"MP4 stsc/stco walk produced {si} of {count} samples"
            )
        info["samples"] = samples
        tracks.append(info)
    return tracks


def decode_mp4_audio(payload: bytes) -> Tuple[int, np.ndarray]:
    """First audio track -> (rate, mono int16).  PCM (sowt/twos) decodes
    for real; compressed codecs (mp4a/AAC) raise — the codec plug-point;
    the container walk above them is fully real."""
    for tr in parse_mp4(payload):
        if tr.get("handler") != "soun":
            continue
        data = b"".join(tr["samples"])
        if tr["format"] == "sowt":
            s = np.frombuffer(data, dtype="<i2")
        elif tr["format"] == "twos":
            s = np.frombuffer(data, dtype=">i2").astype("<i2")
        else:
            raise NotImplementedError(
                f"MP4 audio codec {tr['format']!r}: only uncompressed PCM "
                "(sowt/twos) decodes natively; AAC needs a codec library"
            )
        if tr.get("channels", 1) > 1:
            s = s.reshape(-1, tr["channels"]).mean(axis=1).astype("<i2")
        return int(tr.get("rate", 0)), s
    raise ValueError("MP4 has no audio track")


def decode_mp4_frames(payload: bytes) -> List[np.ndarray]:
    """First video track -> decoded RGB frames (``jpeg`` sample entries
    via ops/jpeg.py)."""
    from . import jpeg

    for tr in parse_mp4(payload):
        if tr.get("handler") != "vide":
            continue
        if tr["format"] != "jpeg":
            raise NotImplementedError(
                f"MP4 video codec {tr['format']!r}: only MJPEG ('jpeg' "
                "sample entries) decodes natively"
            )
        return [jpeg.decode_jpeg(s) for s in tr["samples"]]
    raise ValueError("MP4 has no video track")
