"""Distributed Lloyd's k-means: recovers planted clusters, is
partition-invariant, and matches a local single-process reference."""

import numpy as np
import pytest

import ray
import ray.data

from raykg.ops.kmeans import kmeans_assign, kmeans_fit


def _blobs(n_per=50, d=8, k=3, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 5
    rows = []
    for j in range(k):
        pts = centers[j] + 0.1 * rng.randn(n_per, d)
        for i, p in enumerate(pts):
            rows.append({"vec_id": j * n_per + i, "embedding": p.tolist()})
    return rows


@pytest.mark.usefixtures("ray_session")
class TestKmeans:
    def test_recovers_planted_clusters(self):
        rows = _blobs()
        ds = ray.data.from_items(rows).repartition(4)
        c = kmeans_fit(ds, k=3, iters=10, seed=1)
        assert c.shape == (3, 8)
        out = kmeans_assign(ds, c).to_pandas().sort_values("vec_id")
        planted = np.array([i // 50 for i in range(150)])
        got = out["cluster"].to_numpy()
        # each planted blob maps to exactly one fitted cluster
        for j in range(3):
            assert len(set(got[planted == j])) == 1
        assert len(set(got)) == 3

    def test_partition_invariant(self):
        rows = _blobs(seed=11)
        a = kmeans_fit(ray.data.from_items(rows).repartition(2), k=3, iters=5, seed=3)
        b = kmeans_fit(ray.data.from_items(rows).repartition(9), k=3, iters=5, seed=3)
        assert np.allclose(a, b, atol=1e-9)

    def test_matches_local_reference(self):
        rows = _blobs(n_per=30, seed=5)
        ds = ray.data.from_items(rows)
        c = kmeans_fit(ds, k=3, iters=4, seed=9, sample_rows=4096, tol=0.0)

        # the same algorithm, single-process
        m = np.array([r["embedding"] for r in rows], dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        rng = np.random.RandomState(9)
        ref = m[rng.choice(len(m), size=3, replace=False)].copy()
        for _ in range(4):
            assign = (m @ ref.T).argmax(axis=1)
            new = ref.copy()
            for j in range(3):
                members = m[assign == j]
                if len(members):
                    new[j] = members.mean(axis=0)
            ref = new / np.linalg.norm(new, axis=1, keepdims=True)
        assert np.allclose(c, ref, atol=1e-9)
