"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
decode kernels are STUBS (clearly marked, ``NotImplementedError``) with a
deterministic fake mode — but the Ray-side plumbing is real and tested:
binary columns ride through Arrow blocks untouched, decode/feature stages
are actor pools with small batches (large payloads -> keep batch bytes
bounded), and outputs are fixed-width feature columns.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)


def documents_to_media(batch: pa.Table, id_column: str = "doc_id",
                       text_column: str = "text") -> pa.Table:
    """Deterministic fake media table from documents (test/bench harness):
    the text bytes become the opaque payload."""
    ids = batch[id_column].to_pylist()
    texts = batch[text_column].to_pylist()
    types = ["image", "audio", "video"]
    payloads = [(t or "").encode("utf-8") for t in texts]
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array([types[i % 3] for i in ids], type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(
                ["application/octet-stream"] * len(ids), type=pa.string()
            ),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureActor:
    """Actor-pool stage: decode + feature-extract one batch of payloads.

    Real decoders (PIL / libsndfile / ffmpeg) are unavailable here; with
    ``fake=True`` (default) features are a deterministic digest-based
    16-float vector plus fake width/height/duration, so schema, batching and
    determinism are fully exercised.  With ``fake=False`` the stub raises.
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes, media_type: str):
        if not self.fake:
            # STUB: real decode requires PIL/torchaudio/ffmpeg (not in env)
            raise NotImplementedError(
                "real media decode not available in this environment; "
                "use fake=True or plug a decoder"
            )
        digest = hashlib.md5(payload).digest()
        w = 1 + digest[0] % 64
        h = 1 + digest[1] % 64
        dur = round((digest[2] % 1000) / 10.0, 1)
        feats = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
        feats = np.concatenate([feats, feats])[: self.FEATURE_DIM] / 255.0
        return w, h, dur, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths: List[Optional[int]] = []
        heights: List[Optional[int]] = []
        durations: List[Optional[float]] = []
        features: List[list] = []
        for payload, mtype in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            w, h, dur, feats = self._decode(payload or b"", mtype)
            widths.append(w if mtype == "image" else None)
            heights.append(h if mtype == "image" else None)
            durations.append(dur if mtype in ("audio", "video") else None)
            features.append(np.round(feats, 6).tolist())
        out = batch.drop_columns(["payload"])  # features replace the payload
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("duration_s", pa.array(durations, type=pa.float64()))
        out = out.append_column(
            "features", pa.array(features, type=pa.list_(pa.float64()))
        )
        return out


class MediaResizeActor:
    """Image resize stage (STUB decode; deterministic fake keeps the
    payload plumbing honest: output payload is a digest-derived byte string
    of the target size's magnitude, metadata updated)."""

    def __init__(self, width: int = 32, height: int = 32, fake: bool = True):
        self.width = width
        self.height = height
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real image resize requires PIL (not in env)")
        payloads = []
        for p in batch["payload"].to_pylist():
            digest = hashlib.md5(p or b"").digest()
            payloads.append((digest * ((self.width * self.height) // 16 + 1))[: self.width * self.height])
        out = batch.set_column(
            batch.schema.get_field_index("payload"),
            pa.field("payload", pa.binary()),
            pa.array(payloads, type=pa.binary()),
        )
        out = out.append_column("width", pa.array([self.width] * len(payloads), type=pa.int32()))
        out = out.append_column("height", pa.array([self.height] * len(payloads), type=pa.int32()))
        return out


class FrameSampleActor:
    """Video frame sampling stage (STUB decode): emits ``n_frames`` rows per
    video payload — the fan-out shape (one row per sampled frame with a
    frame_idx) is the real contract; frame bytes are digest-derived fakes."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling requires ffmpeg (not in env)")
        out = {"media_id": [], "frame_idx": [], "frame": []}
        for mid, p, mtype in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["media_type"].to_pylist(),
        ):
            if mtype != "video":
                continue
            for f in range(self.n_frames):
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["frame"].append(hashlib.md5((p or b"") + bytes([f])).digest())
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "frame": pa.array(out["frame"], type=pa.binary()),
            }
        )


def resize_images(ds: "ray.data.Dataset", width=32, height=32,
                  batch_size: int = 256, concurrency=2) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds: "ray.data.Dataset", n_frames=4,
                  batch_size: int = 256, concurrency=2) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_media_features(
    ds: "ray.data.Dataset", fake: bool = True, batch_size: int = 256, concurrency=2
) -> "ray.data.Dataset":
    """Media table -> feature table. Small batch_size on purpose: payload
    bytes x batch x concurrency must fit the worker heap — large binary
    columns need small batches or the actor pool's resident set outgrows
    its node."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
