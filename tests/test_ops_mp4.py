"""MP4 / ISO-BMFF mux + demux: bit-exact PCM round-trips across chunk
layouts, MJPEG video tracks, and malformed-input errors."""

import numpy as np
import pytest

from raykg.ops import codecs, jpeg
from raykg.ops.mp4 import (
    decode_mp4_audio,
    decode_mp4_frames,
    encode_mp4_audio,
    encode_mp4_mjpeg,
    parse_mp4,
)

RNG = np.random.default_rng(59)


def test_pcm_round_trip_chunk_layouts():
    for n, spc in ((1, 4096), (100, 7), (4096, 4096), (5000, 1024), (999, 1000)):
        s = RNG.integers(-32768, 32767, n).astype(np.int16)
        rate, out = decode_mp4_audio(encode_mp4_audio(s, 16000, samples_per_chunk=spc))
        assert rate == 16000
        assert (out == s).all(), (n, spc)


def test_parse_reports_track_metadata():
    s = np.zeros(500, dtype=np.int16)
    tracks = parse_mp4(encode_mp4_audio(s, 8000, samples_per_chunk=100))
    (tr,) = tracks
    assert tr["handler"] == "soun" and tr["format"] == "sowt"
    assert tr["rate"] == 8000 and tr["channels"] == 1
    assert tr["timescale"] == 8000 and tr["duration"] == 500
    assert len(tr["samples"]) == 500


def test_mjpeg_video_track_round_trip():
    frames_px, frames_enc = [], []
    for f in range(3):
        tiles = ((np.arange(4).reshape(2, 2) * 32 + 16 * f) % 256).astype(np.uint8)
        img = np.repeat(np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:, :, None], 3, axis=2)
        frames_px.append(img)
        frames_enc.append(jpeg.encode_jpeg(img, quality=90, subsample="420"))
    payload = encode_mp4_mjpeg(frames_enc, fps=5, width=16, height=16)
    out = decode_mp4_frames(payload)
    assert len(out) == 3
    for a, b in zip(out, frames_px):
        assert (a == b).all()
    (tr,) = parse_mp4(payload)
    assert tr["handler"] == "vide" and tr["format"] == "jpeg"
    assert tr["width"] == 16 and tr["height"] == 16


def test_decode_audio_dispatches_mp4():
    s = RNG.integers(-500, 500, 300).astype(np.int16)
    payload = encode_mp4_audio(s, 16000)
    assert codecs.sniff(payload) == "mp4"
    rate, out = codecs.decode_audio(payload)
    assert rate == 16000 and (out == s).all()


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)
    # truncated box
    good = encode_mp4_audio(np.zeros(64, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        parse_mp4(good[:40])
    # audio decode of a video-only file
    f = jpeg.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=90)
    with pytest.raises(ValueError, match="no audio track"):
        decode_mp4_audio(encode_mp4_mjpeg([f], fps=1, width=8, height=8))
