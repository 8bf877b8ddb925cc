"""Skyline operator: vectorized kernel vs brute force, dataset plumbing."""
import numpy as np
import pyarrow as pa
import ray.data

from raykg.ops.skyline import skyline, skyline_mask


def brute_mask(X):
    n = len(X)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (X[j] <= X[i]).all() and (X[j] < X[i]).any():
                keep[i] = False
                break
    return keep


def test_kernel_matches_brute_force_2d_and_3d():
    rng = np.random.default_rng(5)
    for d in (1, 2, 3):
        X = rng.integers(0, 30, size=(400, d)).astype(np.float64)
        assert (skyline_mask(X) == brute_mask(X)).all()


def test_duplicates_all_survive_and_chunk_boundaries():
    # identical points never dominate each other; 1500 rows crosses the
    # 512-row chunking twice
    X = np.tile(np.array([[1.0, 2.0], [2.0, 1.0], [1.0, 2.0]]), (500, 1))
    assert skyline_mask(X).all()


def test_dataset_skyline_matches_brute_force():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 50, 3000).astype(np.float64)
    b = rng.integers(0, 50, 3000).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"id": np.arange(3000), "a": a, "b": b}))
    out = skyline(ds.repartition(8), ["a", "b"]).to_pandas()
    X = np.stack([a, b], axis=1)
    expect = set(np.nonzero(brute_mask(X))[0])
    assert set(out["id"]) == expect


def test_directions_max_flips_frontier():
    tbl = pa.table({"x": [1.0, 5.0, 3.0], "y": [1.0, 5.0, 3.0]})
    ds = ray.data.from_arrow(tbl)
    lo = skyline(ds, ["x", "y"]).to_pandas()
    hi = skyline(ds, ["x", "y"], directions=["max", "max"]).to_pandas()
    assert lo["x"].tolist() == [1.0] and hi["x"].tolist() == [5.0]


def test_nan_rows_excluded():
    tbl = pa.table({"x": [np.nan, 2.0, 9.0], "y": [0.0, 2.0, 9.0]})
    out = skyline(ray.data.from_arrow(tbl), ["x", "y"]).to_pandas()
    assert out["x"].tolist() == [2.0]
