"""Centroid-based (simplified) silhouette over a labeled embedding table.

For each vector: a = squared distance to its OWN label centroid, b =
min squared distance to any OTHER label centroid, silhouette =
(b − a) / max(a, b) — the standard medoid-free silhouette used to
score clustering / label quality at corpus scale (per-vector work is
O(k·dim) against k centroids, never pairwise).

Exactness contract (the ``embed_cov`` fixed-point pattern): vectors
quantize to floor(x·1024) int64; per-label coordinate SUMS are exact
integers; the centroid is the fixed-point integer
(1024·(s + 1024·n)) // n − 1024², computed with a non-negative
numerator because SQL integer division truncates while Python floors —
shifting by a multiple of n makes both agree.  Distances are then
EXACT int64 (≤ 64·(2²¹)² ≪ 2^63) and only the final ratio is a float
with one fixed evaluation tree.

Distribution: one bounded pass of per-batch (label, dim) sum partials
(k·dim cells), centroids broadcast once via ``ray.put``, then a
stateless vectorized map — no exchange over the vector table at all.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_Q = 1024  # fixed-point grid; |x| must stay below _Q (guarded)


def silhouette_by_label(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> "ray.data.Dataset":
    """Rows [id, label, a_d2, b_d2, silhouette(6dp)] per input vector;
    labels with a single distinct value short-circuit to an error (no
    'other' centroid exists)."""

    def quantize(batch: pa.Table) -> np.ndarray:
        m = np.stack(
            [np.asarray(v, dtype=np.float64)
             for v in batch[vec_col].to_pylist()]
        )
        if np.abs(m).max() >= _Q:
            raise ValueError(
                f"silhouette_by_label: |x| >= {_Q} breaks the fixed-point "
                "grid — rescale the embeddings first"
            )
        return np.floor(m * _Q).astype(np.int64)

    def sums(batch: pa.Table) -> pa.Table:
        q = quantize(batch)
        df = pd.DataFrame(q)
        df[label_col] = batch[label_col].to_numpy(zero_copy_only=False)
        g = df.groupby(label_col, sort=True)
        s = g.sum()
        n = g.size()
        dims = q.shape[1]
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(s.index.to_numpy(), dims), type=pa.int64()
                ),
                "i": pa.array(np.tile(np.arange(dims), len(s)),
                              type=pa.int64()),
                "s": pa.array(s.to_numpy().ravel(), type=pa.int64()),
                "n": pa.array(np.repeat(n.to_numpy(), dims),
                              type=pa.int64()),
            }
        )

    cells = (
        ds.select_columns([vec_col, label_col])
        .map_batches(sums, batch_format="pyarrow")
        .groupby(["label", "i"])
        .sum(["s", "n"])
        .to_pandas()  # k·dim rows — bounded by construction
    )
    piv = cells.pivot_table(index="label", columns="i", values="sum(s)",
                            aggfunc="sum").sort_index()
    # every batch emits each (label, i) cell once with its local count,
    # so any dim's summed n is the label's total count
    counts = (
        cells.groupby("label")["sum(n)"].max()
        .loc[piv.index]
        .to_numpy(dtype=np.int64)
    )
    labels = piv.index.to_numpy()
    if len(labels) < 2:
        raise ValueError("silhouette_by_label: need >= 2 distinct labels")
    s_mat = piv.to_numpy(dtype=np.int64)
    n_vec = counts[:, None]
    cent = (_Q * (s_mat + _Q * n_vec)) // n_vec - _Q * _Q  # floor-safe
    cent_ref = ray.put((labels, cent))

    def score(batch: pa.Table) -> pa.Table:
        lab_arr, c = ray.get(cent_ref)
        q = quantize(batch) * _Q  # scale x onto the centroid grid
        lab = batch[label_col].to_numpy(zero_copy_only=False)
        # exact integer distances: (n_vecs, k)
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        own_idx = np.searchsorted(lab_arr, lab)
        rows = np.arange(len(lab))
        a = d2[rows, own_idx]
        masked = d2.copy()
        masked[rows, own_idx] = np.iinfo(np.int64).max
        b = masked.min(axis=1)
        with np.errstate(invalid="ignore"):
            sil = (b - a) / np.maximum(a, b)
        sil = np.where(np.maximum(a, b) > 0, sil, 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                label_col: pa.array(lab, type=pa.int64()),
                "a_d2": pa.array(a, type=pa.int64()),
                "b_d2": pa.array(b, type=pa.int64()),
                "silhouette": pa.array(np.round(sil, 6),
                                       type=pa.float64()),
            }
        )

    return ds.select_columns([id_col, vec_col, label_col]).map_batches(
        score, batch_format="pyarrow"
    )
