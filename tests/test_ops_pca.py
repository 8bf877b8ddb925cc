"""Covariance / PCA: exact fixed-point parity, planted low-rank recovery."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.pca import covariance_fixedpoint, pca_fit, pca_transform


def _vec_ds(x: np.ndarray, parts: int = 1):
    ds = ray.data.from_pandas(
        pd.DataFrame({"embedding": [row.astype(np.float32) for row in x]})
    )
    return ds.repartition(parts) if parts > 1 else ds


def test_fixedpoint_covariance_matches_numpy_exactly(ray_session):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 5)).astype(np.float32)
    got = covariance_fixedpoint(_vec_ds(x, parts=7), scale_bits=20).to_pandas()
    q = np.floor(x.astype(np.float64) * (1 << 20)).astype(np.int64)
    n = len(q)
    want = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))
    assert len(got) == 5 * 6 // 2
    for r in got.itertuples():
        assert r.num == want[r.i - 1, r.j - 1]


def test_fixedpoint_partition_invariant(ray_session):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 4)).astype(np.float32)
    a = covariance_fixedpoint(_vec_ds(x, 1)).to_pandas().sort_values(["i", "j"])
    b = covariance_fixedpoint(_vec_ds(x, 11)).to_pandas().sort_values(["i", "j"])
    assert (a["num"].to_numpy() == b["num"].to_numpy()).all()


def test_pca_recovers_planted_subspace(ray_session):
    rng = np.random.default_rng(11)
    # rank-2 data in 6 dims + small noise
    basis = np.linalg.qr(rng.normal(size=(6, 2)))[0].T  # (2, 6)
    coeff = rng.normal(size=(400, 2)) * np.array([5.0, 2.0])
    x = coeff @ basis + rng.normal(size=(400, 6)) * 0.01 + 3.0
    mean, comps, ev = pca_fit(_vec_ds(x, 5), k=2)
    assert mean == pytest.approx(x.mean(axis=0), abs=1e-3)
    # spanned subspace matches: projections of basis onto comps ~ identity
    overlap = comps @ basis.T  # (2, 2)
    s = np.linalg.svd(overlap, compute_uv=False)
    assert s == pytest.approx([1.0, 1.0], abs=1e-3)
    assert ev[0] > ev[1] > 10 * 0.01**2


def test_pca_transform_projects(ray_session):
    rng = np.random.default_rng(17)
    x = rng.normal(size=(100, 4))
    mean, comps, _ = pca_fit(_vec_ds(x), k=3)
    out = pca_transform(_vec_ds(x), mean, comps).to_pandas()
    proj = np.stack(out["pca"].to_numpy())
    want = (x - mean) @ comps.T
    assert proj == pytest.approx(want, abs=1e-6)
    # projected dims are uncorrelated
    c = np.cov(proj.T)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-6


def test_quantize_roundtrip_and_range(ray_session):
    from raykg.ops.pca import quantize_embeddings

    rng = np.random.default_rng(23)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(50),
             "embedding": [row for row in x]}
        )
    )
    out = quantize_embeddings(ds).to_pandas()
    assert len(out) == 50 * 8
    assert out["code"].between(-127, 127).all()
    # reconstruct within one quantization step
    for vid, g in out.groupby("id"):
        g = g.sort_values("i")
        recon = g["code"].to_numpy() * g["absmax"].to_numpy() / 127.0
        err = np.abs(recon - x[vid].astype(np.float64))
        assert (err <= g["absmax"].iloc[0] / 127.0 + 1e-12).all()


def test_quantize_zero_vector(ray_session):
    from raykg.ops.pca import quantize_embeddings

    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": [0], "embedding": [np.zeros(4, np.float32)]})
    )
    out = quantize_embeddings(ds).to_pandas()
    assert (out["code"] == 0).all() and (out["absmax"] == 0.0).all()
