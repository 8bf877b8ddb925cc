"""Baseline JPEG codec (`raykg/ops/jpeg.py`) — encoder/decoder pins.

The reference plugin has no media path at all (brief-scope extension);
the codec itself is pinned by round-trip bounds that follow from the
T.81 math: quantization error per DCT coefficient is <= q/2, so a
DC-only (blockwise-constant) image with DC quant step < 8 must
round-trip EXACTLY, and smooth content at high quality stays within a
few gray levels.
"""
import numpy as np
import pytest

from raykg.ops import codecs
from raykg.ops import jpeg


def test_tables_and_dct_are_wellformed():
    assert sum(jpeg.DC_LUMA_BITS) == len(jpeg.DC_LUMA_VALS) == 12
    assert sum(jpeg.AC_LUMA_BITS) == len(jpeg.AC_LUMA_VALS) == 162
    assert sum(jpeg.AC_CHROMA_BITS) == len(jpeg.AC_CHROMA_VALS) == 162
    # orthonormal DCT: D @ D.T = I, and zigzag is a permutation of 0..63
    assert np.allclose(jpeg.DCT_M @ jpeg.DCT_M.T, np.eye(8), atol=1e-12)
    assert sorted(jpeg.ZZ.tolist()) == list(range(64))
    # first few zigzag positions per T.81 figure 5
    assert jpeg.ZZ[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_flat_color_roundtrips_exactly():
    img = np.full((16, 24, 3), 130, np.uint8)
    assert (codecs.decode_image(jpeg.encode_jpeg(img, 95)) == img).all()


def test_blockwise_constant_gray_is_lossless_at_q90():
    # DC quant step at Q90 is 3 (< 8): error < 0.5/pixel before rounding
    rng = np.random.default_rng(7)
    tiles = rng.integers(0, 256, (3, 2), dtype=np.uint8)
    gray = np.kron(tiles, np.ones((8, 8), np.uint8))
    img = np.repeat(gray[:, :, None], 3, axis=2)
    for sub in ("444", "420"):
        out = codecs.decode_image(
            jpeg.encode_jpeg(img, 90, sub, restart_interval=2)
        )
        assert (out == img).all(), sub


@pytest.mark.parametrize("quality,sub,tol", [(95, "444", 4), (90, "420", 10)])
def test_gradient_roundtrip_close(quality, sub, tol):
    y, x = np.mgrid[0:40, 0:56]
    img = np.stack(
        [x * 255 // 55, y * 255 // 39, (x + y) * 255 // 94], -1
    ).astype(np.uint8)
    out = codecs.decode_image(jpeg.encode_jpeg(img, quality, sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= tol, err.max()


def test_odd_dimensions_cropped_and_restart_markers():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 45, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, 90, "420", restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI emitted
    out = jpeg.decode_jpeg(payload)
    assert out.shape == (37, 45, 3)
    # re-encoding the decode must be drift-bounded (codec is stable)
    out2 = jpeg.decode_jpeg(jpeg.encode_jpeg(out, 90, "420", restart_interval=3))
    assert np.abs(out2.astype(int) - out.astype(int)).mean() < np.abs(
        out.astype(int) - img.astype(int)
    ).mean() + 1


def test_grayscale_single_component():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, 100))
    assert out.shape == (17, 19, 3)
    # gray replicated across channels, near-lossless at Q100
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3


def test_q100_near_lossless_on_noise():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 100, "444"))
    # only YCbCr float rounding remains at quant step 1
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_sniff_and_dispatch():
    img = np.full((8, 8, 3), 99, np.uint8)
    payload = jpeg.encode_jpeg(img, 95)
    assert codecs.sniff(payload) == "jpeg"
    assert (codecs.decode_image(payload) == img).all()


def test_arithmetic_coding_rejected():
    img = np.full((8, 8, 3), 99, np.uint8)
    payload = bytearray(jpeg.encode_jpeg(img, 95))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(payload))


@pytest.mark.parametrize("quality,sub,levels", [
    (85, "420", 1), (85, "420", 2), (95, "444", 3), (50, "444", 1),
])
def test_progressive_matches_baseline_exactly(quality, sub, levels):
    """SOF2 spectral-selection + successive-approximation scans carry the
    SAME quantized coefficients as the baseline scan, so reconstruction
    must be bit-identical — pinning EOB-runs, ZRL-with-corrections,
    refinement bits and the non-interleaved true-block grid at once."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (37, 45, 3), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality, sub))
    prog_payload = jpeg.encode_jpeg_progressive(img, quality, sub, levels=levels)
    assert b"\xff\xc2" in prog_payload  # SOF2
    prog = jpeg.decode_jpeg(prog_payload)
    assert np.array_equal(base, prog)


def test_progressive_grayscale_and_dispatch():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(g, 92))
    payload = jpeg.encode_jpeg_progressive(g, 92, levels=2)
    assert codecs.sniff(payload) == "jpeg"
    assert np.array_equal(codecs.decode_image(payload), base)


def test_truncated_and_garbage_rejected():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x00\x01\x02")
    img = np.full((8, 8, 3), 50, np.uint8)
    payload = jpeg.encode_jpeg(img, 95)
    with pytest.raises((ValueError, IndexError)):
        jpeg.decode_jpeg(payload[:40])  # headers cut before SOS


def test_media_wav_generator_matches_oracle_arithmetic():
    """Per-block-constant ADPCM payloads decode to exactly the modular
    sums the media_wav SQL oracle computes (lossy codec, exact by
    construction: constant blocks encode as all-zero nibbles)."""
    import pyarrow as pa
    import hashlib

    from raykg.ops import multimodal as mm

    texts = ["hello world", "", None, "ünïcode tëxt", "x" * 500, "abc def"]
    batch = pa.table(
        {"doc_id": pa.array(range(6), type=pa.int64()), "text": texts}
    )
    sums = mm.decode_audio_sums(mm.documents_to_adpcm_media(batch))
    for i, t in enumerate(texts):
        d = hashlib.md5((t or "").encode("utf-8")).digest()
        nb = 1 + d[5] % 4
        exp = sum(
            17 * (((d[1] + 37 * b) % 256) - 128) * 13 for b in range(nb)
        )
        row = {c: sums[c][i].as_py() for c in sums.column_names}
        assert row["rate"] == 8000
        assert row["n_samples"] == 17 * nb
        assert row["sum_amp"] == exp, (i, t)


def test_media_jpeg_generator_matches_oracle_arithmetic():
    """The pipeline's digest-derived JPEG payloads decode to exactly the
    modular-arithmetic sums the SQL oracle computes."""
    import pyarrow as pa
    import hashlib

    from raykg.ops import multimodal as mm

    texts = ["hello world", "", None, "ünïcode tëxt", "x" * 500]
    batch = pa.table(
        {"doc_id": pa.array(range(5), type=pa.int64()), "text": texts}
    )
    media = mm.documents_to_jpeg_media(batch)
    sums = mm.decode_image_sums(media)
    for i, t in enumerate(texts):
        d = hashlib.md5(((t or "")).encode("utf-8")).digest()
        tw, th = 1 + d[3] % 3, 1 + d[4] % 3
        expect = 64 * sum(
            (d[0] + 11 * tx + 23 * ty) % 256
            for tx in range(tw)
            for ty in range(th)
        )
        row = {c: sums[c][i].as_py() for c in sums.column_names}
        assert row["width"] == 8 * tw and row["height"] == 8 * th
        assert row["sum_r"] == row["sum_g"] == row["sum_b"] == expect, (i, t)
