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
    with pytest.raises(NotImplementedError):
        # JPEG magic: DCT decode is the remaining honest plug-point
        codecs.decode_image(b"\xff\xd8\xff\xe0....JFIF....")


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


def test_png_interlace_rejected():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    data = (
        codecs._PNG_SIG
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError):
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
    rows = [
        (1, "image", codecs.encode_ppm(img), "image/x-portable-pixmap"),
        (2, "image", codecs.encode_bmp(img), "image/bmp"),
        (3, "audio", wav, "audio/wav"),
        (4, "video", vid, "video/x-ppm-stream"),
        (5, "image", codecs.encode_png(img, filter_type=4), "image/png"),
        (6, "image", codecs.encode_gif([img]), "image/gif"),
        (7, "video", gif_vid, "image/gif"),
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
    assert len(out) == 8  # 2 videos (ppm-stream + gif) x 4 frames
    for mid, g in out.groupby("media_id"):
        assert sorted(g["frame_idx"]) == [0, 4, 7, 11]  # evenly spaced over 12
    for f in out["frame"]:
        assert codecs.decode_image(bytes(f)).shape == (3, 3, 3)
