"""Nearest-centroid (Rocchio) classification in exact fixed point.

The classic lightweight embedding classifier: fit = one streaming pass
accumulating per-class vector sums, predict = one stateless vectorized
map against the broadcast centroid matrix.  All arithmetic is integer:

- vectors quantize as ``q = floor(x * 2^20)`` (exact — see
  `ops/pca.covariance_fixedpoint`),
- a class centroid is the element-wise ``floor(sum / n)`` (an s/n
  rational is never within 1/n of a wrong integer, so the double
  division + floor is the true floor — deterministic on both engines;
  valid while ``|class sum| < 2^53`` so the double is exact, i.e.
  n per class below ~2^32 at the 2^20 quantization scale — beyond
  that, compute the fold with Python integer division on the driver),
- a prediction is ``argmin_c  sum_i (q_i - c_i)^2`` with ties to the
  smaller class label, all in int64.

So the distributed result is bit-equal to a SQL mirror — an ML
inference op with an EXACT oracle, not an approximate one.

Scale shape: fit partials are (n_classes x d) int64 matrices per batch
(class count is label-sized, never corpus-sized), tree-combined via a
256-row intermediate fold like `ops/pca.py`; predict broadcasts the
(n_classes x d) centroid matrix in the task closure and scores each
batch with one (B, d) x (d, C) einsum-free integer expansion.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .pca import _stack

_SCALE_BITS = 20


def _quant(x: np.ndarray) -> np.ndarray:
    return np.floor(x.astype(np.float64) * float(1 << _SCALE_BITS)).astype(
        np.int64
    )


def nearest_centroid_fit(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    label_col: str = "label",
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns ``(labels (C,), centroids (C, d) int64)`` — fixed-point
    class centroids from one pass of per-batch class-sum partials."""

    def partial(batch: pa.Table) -> pa.Table:
        q = _quant(_stack(batch, col))
        y = batch[label_col].to_numpy(zero_copy_only=False)
        rows = []
        for lab in np.unique(y):
            m = y == lab
            rows.append(
                {
                    "label": int(lab),
                    "n": int(m.sum()),
                    "s": q[m].sum(axis=0).tolist(),
                }
            )
        return pa.Table.from_pylist(rows)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lab, g in df.groupby("label", sort=True):
            out.append(
                {
                    "label": int(lab),
                    "n": int(g["n"].sum()),
                    "s": np.sum(
                        [np.asarray(v, dtype=np.int64) for v in g["s"]],
                        axis=0,
                    ).tolist(),
                }
            )
        return pd.DataFrame(out)

    parts = (
        ds.select_columns([col, label_col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=256)
        .to_pandas()
    )
    agg: Dict[int, Tuple[int, np.ndarray]] = {}
    for r in parts.itertuples():
        n, s = agg.get(r.label, (0, 0))
        agg[r.label] = (n + r.n, s + np.asarray(r.s, dtype=np.int64))
    labels = np.array(sorted(agg), dtype=np.int64)
    cents = np.stack(
        [
            np.floor(agg[l][1] / agg[l][0]).astype(np.int64)
            for l in labels
        ]
    )
    return labels, cents


def nearest_centroid_predict(
    ds: "ray.data.Dataset",
    labels: np.ndarray,
    centroids: np.ndarray,
    col: str = "embedding",
    out_col: str = "pred",
) -> "ray.data.Dataset":
    """Append ``out_col`` = the label of the squared-distance-nearest
    centroid (ties to the smaller label; exact int64 arithmetic)."""
    labels = np.asarray(labels, dtype=np.int64)
    cents = np.asarray(centroids, dtype=np.int64)

    def predict(batch: pa.Table) -> pa.Table:
        q = _quant(_stack(batch, col))
        if not len(q):
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
        # (B, C) int64 distances; diffs bounded ~2^21, squares 2^42, x64
        # dims ~2^48 — safely inside int64
        d2 = np.empty((q.shape[0], len(labels)), dtype=np.int64)
        for ci in range(len(labels)):
            diff = q - cents[ci]
            d2[:, ci] = (diff * diff).sum(axis=1)
        best = labels[np.argmin(d2, axis=1)]  # argmin ties -> first = min label
        return batch.append_column(out_col, pa.array(best, type=pa.int64()))

    return ds.map_batches(predict, batch_format="pyarrow")


def logistic_fit(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    label_col: str = "label",
    positive_label: int = 0,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> np.ndarray:
    """Binary logistic regression by full-batch gradient descent —
    ``iters`` synchronous passes, each one streaming map of per-batch
    gradient partials ``(g (d+1,), n)`` folded on the driver (the weight
    vector is d+1 floats — model-sized state, shipped per pass via the
    task closure; the corpus is never collected).

    Iterative float math has no SQL mirror by design — correctness is
    pinned by tests (separable-data convergence, sklearn-free local
    reference parity, partition invariance of each gradient step up to
    float-sum reassociation).  Returns ``w (d+1,)`` with the bias last.
    """
    first = ds.take(1)
    d = len(first[0][col])
    w = np.zeros(d + 1, dtype=np.float64)

    for _ in range(iters):
        w_now = w.copy()

        def grad(batch: pa.Table, w_=w_now) -> pa.Table:
            x = _stack(batch, col).astype(np.float64)
            y = (
                batch[label_col].to_numpy(zero_copy_only=False)
                == positive_label
            ).astype(np.float64)
            z = x @ w_[:-1] + w_[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = np.empty(d + 1, dtype=np.float64)
            g[:-1] = x.T @ err
            g[-1] = err.sum()
            return pa.table(
                {"g": pa.array([g.tolist()]),
                 "n": pa.array([len(y)], type=pa.int64())}
            )

        parts = ds.map_batches(grad, batch_format="pyarrow").take_all()
        n = sum(int(p["n"]) for p in parts)
        g = np.sum([np.asarray(p["g"]) for p in parts], axis=0) / n
        g[:-1] += l2 * w[:-1]
        w = w - lr * g
    return w


def logistic_predict(
    ds: "ray.data.Dataset",
    w: np.ndarray,
    col: str = "embedding",
    out_col: str = "score",
) -> "ray.data.Dataset":
    """Append the positive-class probability — stateless vectorized map."""
    w = np.asarray(w, dtype=np.float64)

    def score(batch: pa.Table) -> pa.Table:
        x = _stack(batch, col).astype(np.float64)
        z = x @ w[:-1] + w[-1] if x.size else np.zeros(0)
        p = 1.0 / (1.0 + np.exp(-z))
        return batch.append_column(out_col, pa.array(p, type=pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")
