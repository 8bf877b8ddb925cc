"""Pure-python media codecs + real (non-fake) multimodal stages."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from raykg.ops import codecs
from raykg.ops.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    resize_images,
    sample_frames,
)

RNG = np.random.default_rng(42)


def rand_img(h, w):
    return RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = rand_img(5, 7)
    assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()


def test_bmp_roundtrip_with_row_padding():
    img = rand_img(4, 3)  # row = 9 bytes -> 3 pad bytes
    assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()


def test_wav_roundtrip():
    samples = (RNG.standard_normal(1600) * 8000).astype("<i2")
    rate, back = codecs.decode_wav(codecs.encode_wav(samples, rate=16000))
    assert rate == 16000
    assert (back == samples).all()


def test_wav_adpcm_roundtrip_snr():
    """IMA ADPCM (format 0x11): real compressed-audio decode.  4-bit
    adaptive delta coding is lossy; a band-limited signal must come back
    above 25 dB SNR (the codec's design range), length- and rate-exact,
    through the decode_wav dispatch."""
    t = np.arange(8000)
    sig = (
        3000 * np.sin(2 * np.pi * 440 * t / 16000)
        + 800 * np.sin(2 * np.pi * 97 * t / 16000)
    ).astype(np.int16)
    payload = codecs.encode_wav_adpcm(sig, 16000)
    assert codecs.sniff(payload) == "wav"
    rate, out = codecs.decode_wav(payload)
    assert rate == 16000 and len(out) == len(sig)
    err = out.astype(np.float64) - sig.astype(np.float64)
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err ** 2).mean())
    assert snr > 25.0, snr
    # deterministic bytes + block-header resync (pred restarts per block)
    assert codecs.encode_wav_adpcm(sig, 16000) == payload
    blocks = len(sig) // ((256 - 4) * 2 + 1) + 1
    assert payload.count(b"data") == 1 and blocks >= 15


def test_wav_adpcm_step_table_pins():
    """First IMA decode steps from index 0 are fully determined by the
    public step/index tables — pin a tiny hand-checkable sequence."""
    small = np.array([0, 100, 200, 120, -300], dtype=np.int16)
    p = codecs.encode_wav_adpcm(small, 8000, block_align=8)
    rate, out = codecs.decode_wav_adpcm(p)
    assert rate == 8000
    # header carries sample 0 exactly; the 4-bit deltas then slew-limit
    # (step table starts at 7 -> max +/-13 on the first step)
    assert out[0] == 0 and out.tolist() == [0, 11, 41, 104, -32]
    with np.testing.assert_raises(NotImplementedError):
        # stereo rejected
        fmt_pos = p.index(b"fmt ") + 8
        bad = bytearray(p)
        bad[fmt_pos + 2] = 2
        codecs.decode_wav_adpcm(bytes(bad))


def test_wav_g711_roundtrip_snr_and_dispatch():
    """G.711 mu-law / A-law (format 0x07/0x06): 8-bit companded audio.
    Both codecs must round-trip a speech-band signal above 30 dB SNR
    (the telephony design point), length/rate-exact, through the
    decode_wav dispatch."""
    t = np.arange(4000)
    sig = (
        6000 * np.sin(2 * np.pi * 300 * t / 8000)
        + 1500 * np.sin(2 * np.pi * 1100 * t / 8000)
    ).astype(np.int16)
    for enc in (codecs.encode_wav_ulaw, codecs.encode_wav_alaw):
        payload = enc(sig, 8000)
        assert codecs.sniff(payload) == "wav"
        rate, out = codecs.decode_wav(payload)
        assert rate == 8000 and len(out) == len(sig)
        err = out.astype(np.float64) - sig.astype(np.float64)
        snr = 10 * np.log10(
            (sig.astype(np.float64) ** 2).mean() / (err ** 2).mean()
        )
        assert snr > 30.0, snr
        assert enc(sig, 8000) == payload  # deterministic bytes


def test_wav_g711_table_pins():
    """Pin expansion-table values against the canonical ITU-T tables and
    the compress/expand fixed-point property."""
    # mu-law: 0x00 -> -32124 (max negative), 0x80 -> +32124, both zero codes
    assert codecs._ULAW_TABLE[0x00] == -32124
    assert codecs._ULAW_TABLE[0x80] == 32124
    assert codecs._ULAW_TABLE[0x7F] == 0 and codecs._ULAW_TABLE[0xFF] == 0
    # A-law: 0x55 -> -8 (min magnitude), 0xD5 -> +8, 0x2A -> max negative
    assert codecs._ALAW_TABLE[0x55] == -8 and codecs._ALAW_TABLE[0xD5] == 8
    assert codecs._ALAW_TABLE[0x2A] == -32256 and codecs._ALAW_TABLE[0xAA] == 32256
    # every mu-law code is a fixed point of expand -> compress
    # (0x7F/0xFF both decode to 0; recompress canonicalizes 0 to 0xFF)
    codes = np.arange(256, dtype=np.uint8)
    re = codecs.ulaw_compress(codecs._ULAW_TABLE[codes])
    ok = (re == codes) | ((codes == 0x7F) & (re == 0xFF))
    assert ok.all()
    # mono-only guard
    p = bytearray(codecs.encode_wav_ulaw(np.zeros(10, dtype=np.int16)))
    p[p.index(b"fmt ") + 8 + 2] = 2
    with np.testing.assert_raises(NotImplementedError):
        codecs.decode_wav_g711(bytes(p))


def test_mjpeg_split_and_roundtrip():
    """MJPEG: concatenated JPEGs split marker-aware and decode per
    frame.  DC-only tile frames round-trip byte-exactly at Q90; the
    splitter must not be fooled by FFD9-looking bytes inside entropy
    data (restart markers + stuffed bytes exercise that path)."""
    tiles = np.kron(
        np.array([[10, 200], [77, 139]], dtype=np.uint8),
        np.ones((8, 8), np.uint8),
    )
    arr = np.repeat(tiles[:, :, None], 3, axis=2)
    frames = [arr, np.roll(arr, 8, axis=0), arr[::-1].copy()]
    payload = codecs.encode_mjpeg(frames, quality=90, restart_interval=2)
    parts = codecs.split_mjpeg(payload)
    assert len(parts) == 3 and b"".join(parts) == payload
    for f, d in zip(frames, codecs.decode_mjpeg_frames(payload)):
        assert np.array_equal(f, d)
    # truncated stream fails loudly
    with np.testing.assert_raises(ValueError):
        codecs.split_mjpeg(payload[:-2])
    with np.testing.assert_raises(ValueError):
        codecs.split_mjpeg(b"\x00\x01" + payload)


def test_ppm_stream_roundtrip():
    frames = [rand_img(4, 4) for _ in range(6)]
    back = codecs.decode_ppm_stream(codecs.encode_ppm_stream(frames))
    assert len(back) == 6
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_nn_resize_identity_and_downscale():
    img = rand_img(8, 8)
    assert (codecs.nn_resize(img, 8, 8) == img).all()
    half = codecs.nn_resize(img, 4, 4)
    assert half.shape == (4, 4, 3)
    # pixel-center sampling picks rows/cols 1,3,5,7
    assert (half == img[1::2, 1::2]).all()


def test_sniff_and_unknown_rejected():
    assert codecs.sniff(codecs.encode_ppm(rand_img(2, 2))) == "ppm"
    assert codecs.sniff(codecs.encode_bmp(rand_img(2, 2))) == "bmp"
    assert codecs.sniff(codecs.encode_wav(np.zeros(4, dtype="<i2"))) == "wav"
    assert codecs.sniff(codecs.encode_png(rand_img(2, 2))) == "png"
    assert codecs.sniff(codecs.encode_gif([rand_img(1, 2)])) == "gif"
    # JPEG now decodes for real (ops/jpeg.py); a header-only fragment is
    # recognized but rejected as malformed
    assert codecs.sniff(b"\xff\xd8\xff\xe0....JFIF....") == "jpeg"
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0....JFIF....")
    with pytest.raises(NotImplementedError):
        # unknown magic: the remaining honest plug-point (MP3/MP4/...)
        codecs.decode_image(b"\x00\x00\x00\x20ftypmp42")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    img = rand_img(13, 9)
    back = codecs.decode_png(codecs.encode_png(img, filter_type=filter_type))
    assert (back == img).all()


def test_png_gray_alpha_palette_decode():
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def png(w, h, ctype, raw, plte=b""):
        body = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        if plte:
            body += chunk(b"PLTE", plte)
        return (
            codecs._PNG_SIG + body
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    gray = RNG.integers(0, 256, (4, 6), dtype=np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(4))
    out = codecs.decode_png(png(6, 4, 0, raw))
    assert (out == np.repeat(gray[:, :, None], 3, axis=2)).all()

    rgba = RNG.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    assert (codecs.decode_png(png(5, 3, 6, raw)) == rgba[:, :, :3]).all()

    plte = RNG.integers(0, 256, (5, 3), dtype=np.uint8)
    pix = RNG.integers(0, 5, (4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(4))
    assert (codecs.decode_png(png(4, 4, 3, raw, plte.tobytes())) == plte[pix]).all()


def test_png_bad_interlace_method_rejected():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)  # bogus method
    data = (
        codecs._PNG_SIG
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        codecs.decode_png(data)


def test_gif_roundtrip_single_and_multiframe():
    pal = np.unique(RNG.integers(0, 256, (40, 3), dtype=np.uint8), axis=0)
    frame = pal[RNG.integers(0, len(pal), (11, 7))]
    assert (codecs.decode_gif(codecs.encode_gif([frame])) == frame).all()
    frames = [pal[RNG.integers(0, len(pal), (6, 9))] for _ in range(5)]
    back = codecs.decode_gif_frames(codecs.encode_gif(frames))
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_gif_lzw_width_growth_and_table_reset():
    # 128x128 with ~200 colors: the LZW table passes every width step and
    # overflows 4096 entries, exercising the clear-code reset path
    pal = np.unique(RNG.integers(0, 256, (220, 3), dtype=np.uint8), axis=0)
    img = pal[RNG.integers(0, len(pal), (128, 128))]
    assert (codecs.decode_gif(codecs.encode_gif([img])) == img).all()


def test_gif_too_many_colors_rejected():
    img = np.arange(2048 * 3, dtype=np.uint8).reshape(32, 64, 3)
    img[:, :, 0] = np.arange(2048).reshape(32, 64) % 256
    img[:, :, 1] = np.arange(2048).reshape(32, 64) // 256
    with pytest.raises(ValueError):
        codecs.encode_gif([img])


def _media_table():
    img = rand_img(6, 4)
    wav = codecs.encode_wav((RNG.standard_normal(3200) * 8000).astype("<i2"), 16000)
    vid = codecs.encode_ppm_stream([rand_img(3, 3) for _ in range(12)])
    gif_vid = codecs.encode_gif([rand_img(3, 3) for _ in range(12)])
    mjpeg_vid = codecs.encode_mjpeg([rand_img(3, 3) for _ in range(12)])
    ulaw = codecs.encode_wav_ulaw(
        (RNG.standard_normal(3200) * 8000).astype("<i2"), 8000
    )
    rows = [
        (1, "image", codecs.encode_ppm(img), "image/x-portable-pixmap"),
        (2, "image", codecs.encode_bmp(img), "image/bmp"),
        (3, "audio", wav, "audio/wav"),
        (4, "video", vid, "video/x-ppm-stream"),
        (5, "image", codecs.encode_png(img, filter_type=4), "image/png"),
        (6, "image", codecs.encode_gif([img]), "image/gif"),
        (7, "video", gif_vid, "image/gif"),
        (8, "video", mjpeg_vid, "video/x-motion-jpeg"),
        (9, "audio", ulaw, "audio/basic"),
    ]
    return pa.Table.from_pydict(
        {
            "media_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "media_type": pa.array([r[1] for r in rows], type=pa.string()),
            "payload": pa.array([r[2] for r in rows], type=pa.binary()),
            "mime": pa.array([r[3] for r in rows], type=pa.string()),
            "n_bytes": pa.array([len(r[2]) for r in rows], type=pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


def test_real_feature_extraction(ray_session):
    ds = ray.data.from_arrow(_media_table())
    out = extract_media_features(ds, fake=False, concurrency=1).to_pandas()
    out = out.set_index("media_id")
    assert out.loc[1, "width"] == 4 and out.loc[1, "height"] == 6
    assert out.loc[2, "width"] == 4 and out.loc[2, "height"] == 6
    # same pixels via ppm / bmp / png / gif -> identical features
    assert out.loc[1, "features"] == pytest.approx(out.loc[2, "features"])
    assert out.loc[1, "features"] == pytest.approx(out.loc[5, "features"])
    assert out.loc[1, "features"] == pytest.approx(out.loc[6, "features"])
    assert out.loc[3, "duration_s"] == pytest.approx(3200 / 16000)
    assert out.loc[4, "duration_s"] == pytest.approx(12 / 24.0)
    assert out.loc[7, "duration_s"] == pytest.approx(12 / 24.0)  # gif video
    assert out.loc[8, "duration_s"] == pytest.approx(12 / 24.0)  # mjpeg video
    assert out.loc[9, "duration_s"] == pytest.approx(3200 / 8000)  # mu-law
    assert all(len(f) == 16 for f in out["features"])


def test_real_resize(ray_session):
    ds = ray.data.from_arrow(_media_table()).filter(
        lambda r: r["media_type"] == "image"
    )
    out = resize_images(ds, width=2, height=3, fake=False, concurrency=1)
    out = out.map_batches(lambda b: b, batch_format="pyarrow").to_pandas()
    assert (out["width"] == 2).all() and (out["height"] == 3).all()
    for p in out["payload"]:
        arr = codecs.decode_image(bytes(p))
        assert arr.shape == (3, 2, 3)


def test_real_frame_sampling(ray_session):
    ds = ray.data.from_arrow(_media_table())
    out = sample_frames(ds, n_frames=4, fake=False, concurrency=1).to_pandas()
    assert len(out) == 12  # 3 videos (ppm-stream + gif + mjpeg) x 4 frames
    for mid, g in out.groupby("media_id"):
        assert sorted(g["frame_idx"]) == [0, 4, 7, 11]  # evenly spaced over 12
    for f in out["frame"]:
        assert codecs.decode_image(bytes(f)).shape == (3, 3, 3)


def test_png_adam7_round_trip():
    """Adam7-interlaced PNG de-interlaces to pixel-equal output, for every
    filter type and for sizes exercising empty/ragged passes."""
    import numpy as np

    from raykg.ops.codecs import decode_png, encode_png

    rng = np.random.default_rng(47)
    for h, w in ((1, 1), (3, 5), (8, 8), (13, 21), (31, 2)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            enc = encode_png(img, filter_type=ft, interlace=True)
            assert (decode_png(enc) == img).all(), (h, w, ft)
            # and the stream really is marked interlaced
            assert enc[28] == 1


def test_gif_interlaced_round_trip():
    import numpy as np

    from raykg.ops.codecs import decode_gif_frames, encode_gif

    rng = np.random.default_rng(53)
    for h, w in ((1, 4), (5, 3), (16, 7), (23, 11)):
        # <=256 colors: draw from a small palette
        pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
        idx = rng.integers(0, len(pal), (h, w))
        img = pal[idx]
        enc = encode_gif([img, img[::-1].copy()], interlace=True)
        frames = decode_gif_frames(enc)
        assert len(frames) == 2
        assert (frames[0] == img).all(), (h, w)
        assert (frames[1] == img[::-1]).all()
