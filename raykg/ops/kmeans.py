"""Distributed k-means (Lloyd's algorithm) over an embedding column.

Each iteration is ONE streaming pass: centroids are broadcast once
(``ray.put``), every block computes its members' per-centroid partial
sums and counts with a single matmul + ``np.add.at``, and the partials
tree-combine through a custom ``AggregateFnV2`` — the accumulator is a
fixed ``(k, d)`` matrix regardless of data size, so nothing
corpus-sized ever moves, and there is no shuffle at all (the reduce is
Ray Data's aggregate tree).  The driver holds only the ``(k, d)``
centroid matrix between iterations.

Determinism: init takes a seeded choice from a bounded prefix sample
(same contract as ``IVFIndex.fit``), and every arithmetic step is fixed
order, so results are reproducible run-to-run and independent of block
layout (numpy reduces each block in row order; partial sums are
float64 and combine via the same tree shape only when the block count
changes — the partition-invariance test pins the tolerance).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import AggregateFnV2
from ray.data.block import BlockAccessor

from .similarity import _normalize


class _CentroidPartials(AggregateFnV2):
    """One Lloyd step's reduce: (sums[k,d], counts[k]) per block, added
    through the aggregate tree."""

    def __init__(self, centroids_ref, k: int, d: int, embedding_column: str,
                 spherical: bool):
        self._cref = centroids_ref
        self._k, self._d = k, d
        self._col = embedding_column
        self._spherical = spherical
        super().__init__(
            "centroid_partials",
            zero_factory=lambda: (
                np.zeros((k, d), dtype=np.float64),
                np.zeros(k, dtype=np.int64),
            ),
            on=embedding_column,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> Tuple[np.ndarray, np.ndarray]:
        tab = BlockAccessor.for_block(block).to_arrow()
        m = np.array(tab[self._col].to_pylist(), dtype=np.float64)
        sums = np.zeros((self._k, self._d), dtype=np.float64)
        counts = np.zeros(self._k, dtype=np.int64)
        if len(m) == 0:
            return sums, counts
        if self._spherical:
            m = _normalize(m)
        c = ray.get(self._cref)
        assign = (m @ c.T).argmax(axis=1)
        np.add.at(sums, assign, m)
        np.add.at(counts, assign, 1)
        return sums, counts

    def combine(self, acc, new):
        return acc[0] + new[0], acc[1] + new[1]

    def finalize(self, acc):
        # ndarray accumulators confuse the block builder; ship as lists
        return [acc[0].tolist(), acc[1].tolist()]


def kmeans_fit(
    ds: "ray.data.Dataset",
    embedding_column: str = "embedding",
    k: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample_rows: int = 4096,
    spherical: bool = True,
    tol: float = 1e-6,
) -> np.ndarray:
    """Fit ``k`` centroids with at most ``iters`` full-data Lloyd passes;
    returns the ``(k, d)`` centroid matrix.  ``spherical=True`` keeps
    centroids unit-norm (cosine k-means, the ANN/IVF regime)."""
    sample = ds.limit(sample_rows).to_pandas()
    m = np.array(sample[embedding_column].tolist(), dtype=np.float64)
    if spherical:
        m = _normalize(m)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(m), size=min(k, len(m)), replace=False)
    c = m[idx].copy()
    k_eff, d = c.shape

    for _ in range(iters):
        cref = ray.put(c)
        agg = _CentroidPartials(cref, k_eff, d, embedding_column, spherical)
        out = ds.aggregate(agg)["centroid_partials"]
        sums = np.asarray(out[0], dtype=np.float64)
        counts = np.asarray(out[1], dtype=np.int64)
        new = c.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        if spherical:
            new = _normalize(new)
        shift = float(np.abs(new - c).max())
        c = new
        if shift < tol:
            break
    return c


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    embedding_column: str = "embedding",
    out_column: str = "cluster",
    spherical: bool = True,
) -> "ray.data.Dataset":
    """Streaming nearest-centroid assignment (broadcast once)."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = np.array(batch[embedding_column].to_pylist(), dtype=np.float64)
        if len(m) == 0:
            return batch.append_column(out_column, pa.array([], type=pa.int32()))
        if spherical:
            m = _normalize(m)
        lists = (m @ c.T).argmax(axis=1)
        return batch.append_column(out_column, pa.array(lists, type=pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")
