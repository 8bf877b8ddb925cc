"""Orthogonal Procrustes embedding alignment.

Retraining a KG-embedding model (or ingesting a second source's
vectors) produces a space that is rotated/reflected relative to the old
one; cross-space operations (near-dup between corpora, temporal drift
of an entity, merging indexes) first need the least-squares ORTHOGONAL
map ``W = argmin ||A W - B||_F`` (Schonemann 1966): with
``M = A^T B``, ``W = U V^T`` from ``M = U S V^T``.

Scale shape — the `ops/pca.py` moment-pass pattern: the paired vectors
stream through ONE map over the joined Dataset emitting per-batch
``d x d`` cross-moment partials (d = embedding width, so each partial
is a few KB regardless of rows); partials tree-fold through a Dataset
sum; only the d x d matrix and its SVD ever touch the driver.  Applying
``W`` is a stateless batched matmul.

Float SVD is iterative — no bit-exact SQL mirror exists by design (the
`logistic_fit` precedent); correctness is pinned by the
planted-rotation test: encode B = A R for a random orthogonal R and
recover ``W = R`` to 1e-8, plus partition invariance of the moment
fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def cross_moment(
    pairs: "ray.data.Dataset",
    a_column: str = "a",
    b_column: str = "b",
) -> np.ndarray:
    """``M = sum_i a_i b_i^T`` over a Dataset of paired list<float>
    vectors — one streaming pass, d x d partials only."""

    def partial(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[a_column].to_pylist(), dtype=np.float64)
        b = np.asarray(batch[b_column].to_pylist(), dtype=np.float64)
        m = a.T @ b if len(a) else np.zeros((0, 0))
        return pa.table({"m": pa.array([m.ravel().tolist()],
                                       type=pa.list_(pa.float64())),
                         "d": pa.array([m.shape[0]], type=pa.int64())})

    parts = pairs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "d" in parts.columns:
        parts = parts[parts["d"] > 0]
    if parts.empty:
        raise ValueError("procrustes: no vector pairs")
    d = int(parts["d"].iloc[0])
    acc = np.zeros((d, d))
    for flat in parts["m"]:
        acc += np.asarray(flat, dtype=np.float64).reshape(d, d)
    return acc


def procrustes_fit(
    pairs: "ray.data.Dataset",
    a_column: str = "a",
    b_column: str = "b",
) -> np.ndarray:
    """The orthogonal map ``W`` minimizing ``||A W - B||_F`` over the
    paired vectors (rotation/reflection; no scaling)."""
    m = cross_moment(pairs, a_column, b_column)
    u, _s, vt = np.linalg.svd(m)
    return u @ vt


def procrustes_apply(
    ds: "ray.data.Dataset",
    w: np.ndarray,
    vector_column: str = "embedding",
    out_column: str = "aligned",
) -> "ray.data.Dataset":
    """Map every vector through ``W`` — stateless batched matmul."""
    import ray

    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def apply(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ww = _ray.get(w_ref)
        x = np.asarray(batch[vector_column].to_pylist(), dtype=np.float64)
        y = x @ ww if len(x) else x
        return batch.append_column(
            out_column,
            pa.array([row.tolist() for row in y],
                     type=pa.list_(pa.float64())),
        )

    return ds.map_batches(apply, batch_format="pyarrow")
