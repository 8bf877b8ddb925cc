"""Nearest-centroid classifier: planted clusters, exactness, invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.classify import (
    _quant,
    nearest_centroid_fit,
    nearest_centroid_predict,
)


def _ds(x, y, parts=1):
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(len(x)),
             "embedding": [r.astype(np.float32) for r in x],
             "label": y.astype(np.int64)}
        )
    )
    return ds.repartition(parts) if parts > 1 else ds


def test_planted_clusters_classified(ray_session):
    rng = np.random.default_rng(3)
    means = np.array([[3.0, 0, 0, 0], [0, 3.0, 0, 0], [0, 0, 3.0, 0]])
    y = rng.integers(0, 3, 300)
    x = means[y] + rng.normal(scale=0.3, size=(300, 4))
    labels, cents = nearest_centroid_fit(_ds(x, y, parts=5))
    assert labels.tolist() == [0, 1, 2]
    pred = nearest_centroid_predict(
        _ds(x, y, parts=3), labels, cents
    ).to_pandas()
    acc = (pred["pred"].to_numpy() == pred["label"].to_numpy()).mean()
    assert acc > 0.99


def test_fit_matches_local_exactly(ray_session):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(120, 6)).astype(np.float32)
    y = rng.integers(0, 4, 120)
    labels, cents = nearest_centroid_fit(_ds(x, y, parts=9))
    q = _quant(x.astype(np.float64))
    for i, lab in enumerate(labels):
        m = y == lab
        want = np.floor(q[m].sum(axis=0) / m.sum()).astype(np.int64)
        assert (cents[i] == want).all()


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(200, 5)).astype(np.float32)
    y = rng.integers(0, 3, 200)
    _, c1 = nearest_centroid_fit(_ds(x, y, parts=1))
    _, c2 = nearest_centroid_fit(_ds(x, y, parts=13))
    assert (c1 == c2).all()


class TestLogistic:
    def test_separable_converges(self, ray_session):
        from raykg.ops.classify import logistic_fit, logistic_predict

        rng = np.random.default_rng(13)
        n = 400
        y = rng.integers(0, 2, n)
        # class 0 at +2 on dim0, class 1 at -2
        x = np.zeros((n, 3))
        x[:, 0] = np.where(y == 0, 2.0, -2.0) + rng.normal(scale=0.4, size=n)
        x[:, 1:] = rng.normal(size=(n, 2))
        ds = _ds(x, y, parts=5)
        w = logistic_fit(ds, iters=40, lr=1.0)
        scored = logistic_predict(ds, w).to_pandas()
        pred_pos = scored["score"].to_numpy() > 0.5
        acc = (pred_pos == (scored["label"].to_numpy() == 0)).mean()
        assert acc > 0.98

    def test_matches_local_reference(self, ray_session):
        from raykg.ops.classify import logistic_fit

        rng = np.random.default_rng(17)
        x = rng.normal(size=(150, 4))
        y = rng.integers(0, 2, 150)
        w = logistic_fit(_ds(x, y, parts=4), iters=10, lr=0.3, l2=1e-3)

        # local re-implementation of the same full-batch GD
        wl = np.zeros(5)
        yy = (y == 0).astype(float)
        for _ in range(10):
            z = x @ wl[:-1] + wl[-1]
            p = 1 / (1 + np.exp(-z))
            g = np.concatenate([x.T @ (p - yy), [(p - yy).sum()]]) / len(y)
            g[:-1] += 1e-3 * wl[:-1]
            wl = wl - 0.3 * g
        # partial-sum reassociation drifts ~1e-9 over 10 iterations
        assert w == pytest.approx(wl, rel=1e-4, abs=1e-7)
