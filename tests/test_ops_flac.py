"""From-scratch FLAC codec: bit-exact round-trips, subframe coverage,
checksum verification, and the pipeline media builder."""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from raykg.ops import codecs
from raykg.ops.flac import crc8, crc16, decode_flac, encode_flac
from raykg.ops.multimodal import decode_audio_sums, documents_to_flac_media

RNG = np.random.default_rng(1234)


def roundtrip(sig, **kw):
    rate, dec = decode_flac(encode_flac(sig, **kw))
    assert np.array_equal(dec, np.asarray(sig, dtype=np.int16))
    return rate


def test_lossless_roundtrip_random_fullrange():
    # full-amplitude noise (VERBATIM-ish residuals) must still be exact
    sig = RNG.integers(-32768, 32768, 5000).astype(np.int16)
    assert roundtrip(sig, rate=44100) == 44100


def test_lossless_roundtrip_smooth_signal_compresses():
    sig = (np.sin(np.arange(8192) / 25.0) * 9000).astype(np.int16)
    enc = encode_flac(sig)
    assert len(enc) < sig.nbytes  # fixed predictors + rice actually shrink it
    rate, dec = decode_flac(enc)
    assert np.array_equal(dec, sig)


def test_constant_subframe_and_partial_last_block():
    sig = np.full(4097, -123, dtype=np.int16)  # 4096-block + 1-sample tail
    enc = encode_flac(sig)
    assert len(enc) < 120  # CONSTANT subframes: a few bytes per frame
    roundtrip(sig)


def test_small_blocksize_many_frames():
    sig = RNG.integers(-50, 50, 1000).astype(np.int16)
    roundtrip(sig, block_size=64)  # 16 frames, UTF-8 frame numbers > 0


def test_lpc_subframe_decode_path():
    sig = np.cumsum(RNG.integers(-5, 6, 700)).astype(np.int16)
    roundtrip(sig, block_size=128, lpc_order1=True)


def test_single_sample_and_empty():
    roundtrip(np.array([7], dtype=np.int16))
    rate, dec = decode_flac(encode_flac(np.array([], dtype=np.int16)))
    assert len(dec) == 0


def test_frame_crc16_detects_corruption():
    enc = bytearray(encode_flac(RNG.integers(-100, 100, 500).astype(np.int16)))
    enc[-3] ^= 0x40  # inside the last frame body
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(enc))


def test_header_crc8_detects_corruption():
    sig = np.zeros(100, dtype=np.int16)
    enc = bytearray(encode_flac(sig, block_size=64))
    # first frame starts after magic+metadata (4 + 4 + 34 = offset 42);
    # its UTF-8 frame number is byte 46 — flipping it to "frame 1" keeps
    # the header parseable but breaks the header CRC-8
    enc[42 + 4] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(enc))


def test_streaminfo_md5_is_computed_and_checked():
    sig = RNG.integers(-300, 300, 256).astype(np.int16)
    enc = encode_flac(sig)
    i = enc.index(hashlib.md5(sig.astype("<i2").tobytes()).digest())
    assert i == 8 + 18  # MD5 sits at STREAMINFO offset 18
    # swap in a wrong MD5: frames still CRC-clean, MD5 gate must fire
    bad = enc[:i] + bytes([enc[i] ^ 1]) + enc[i + 1 :]
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bad)


def test_crc_primitive_pins():
    # public CRC check values ("123456789"): CRC-8/FLAC=0xF4, CRC-16/BUYPASS=0xFEE8
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_sniff_and_decode_audio_dispatch():
    sig = RNG.integers(-1000, 1000, 300).astype(np.int16)
    enc = encode_flac(sig, rate=16000)
    assert codecs.sniff(enc) == "flac"
    rate, dec = codecs.decode_audio(enc)
    assert rate == 16000 and np.array_equal(dec, sig)


def test_documents_to_flac_media_sums_match_formula():
    docs = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                     "text": ["alpha", "beta", "gamma"]})
    media = documents_to_flac_media(docs)
    out = decode_audio_sums(media)
    for t, n_got, s_got in zip(docs["text"].to_pylist(),
                               out["n_samples"].to_pylist(),
                               out["sum_amp"].to_pylist()):
        d = hashlib.md5(t.encode()).digest()
        n = 64 + d[2] % 192
        gain = 1 + d[4] % 9
        v = ((d[1] + 13 * np.arange(n)) % 256 - 128) * gain
        assert n_got == n and s_got == int(v.sum())
    assert out["rate"].to_pylist() == [16000] * 3
