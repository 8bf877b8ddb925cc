"""Distributed covariance and PCA over an embedding column.

Single-pass moment accumulation: every batch contributes the tiny
decomposable triple ``(n, sum_vec (d), gram (d x d))``; the partials
tree-combine, the d x d eigendecomposition runs on the driver (d is
model-embedding-sized — 64..4096 — never corpus-sized), and the
projection is a stateless vectorized ``map_batches``.  The corpus is
read once for fit and once for transform; nothing corpus-scale is ever
collected.

Two surfaces:

- ``covariance_fixedpoint`` — the EXACT integer-domain covariance
  numerator ``n * S2[i,j] - S1[i] * S1[j]`` over values quantized as
  ``floor(x * 2^20)`` (power-of-two scaling of a float32 is exact in
  doubles, and floor — unlike round — breaks no ties, so Python and SQL
  agree on every value).  Integer arithmetic makes
  the result bit-equal to a SQL mirror — the same exact-parity idiom as
  the int-cents averages and BM25's rational idf.  int64 gram sums
  overflow past ~1e7 rows at this scale factor; the corpus-scale path
  re-centers per partition (shift by a first-pass approximate mean)
  before accumulating, which this module documents but does not need at
  bench scale.
- ``pca_fit`` / ``pca_transform`` — float-domain principal components
  (eigh of the sample covariance), sign-fixed so the largest-magnitude
  loading of every component is positive (eigenvector sign is otherwise
  arbitrary).

The reference plugin has no vector analytics; this extends the
embedding family in `ops/similarity.py` / `ops/kmeans.py`.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _stack(batch: pa.Table, col: str) -> np.ndarray:
    """(n, d) float matrix from a list<float> or tensor-extension column."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    # Ray's ArrowTensorArray (from_pandas of ndarray cells) and friends
    m = np.asarray(arr.to_numpy(zero_copy_only=False).tolist())
    return m if n else m.reshape(0, 0)


def _combine_partials(batch: pa.Table) -> pa.Table:
    """Tree-combine moment partials (up to batch_size rows -> 1) so the
    driver collect is #input-batches / 256, not #input-batches."""
    if batch.num_rows <= 1:
        return batch
    df = batch.to_pandas()
    out = {"n": [int(df["n"].sum())],
           "s1": [np.sum([np.asarray(v) for v in df["s1"]], axis=0).tolist()],
           "s2": [np.sum([np.asarray(v) for v in df["s2"]], axis=0).tolist()]}
    if "d" in df.columns:
        out["d"] = [int(df["d"].iloc[0])]
    return pa.table(out)


def covariance_fixedpoint(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    scale_bits: int = 20,
) -> "ray.data.Dataset":
    """``(i, j, num)`` for i <= j with ``num = n * sum(q_i q_j) -
    sum(q_i) sum(q_j)`` over ``q = floor(x * 2^scale_bits)`` — the
    covariance numerator, exactly, in int64."""
    mult = float(1 << scale_bits)

    def partial(batch: pa.Table) -> pa.Table:
        x = _stack(batch, col)
        q = np.floor(x.astype(np.float64) * mult).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "n": pa.array([q.shape[0]], type=pa.int64()),
                "s1": pa.array([q.sum(axis=0).tolist()]),
                "s2": pa.array([(q.T @ q).reshape(-1).tolist()]),
                "d": pa.array([d], type=pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_combine_partials, batch_format="pyarrow", batch_size=256)
        .take_all()
    )
    if not parts:
        return ray.data.from_arrow(
            pa.table({"i": pa.array([], type=pa.int64()),
                      "j": pa.array([], type=pa.int64()),
                      "num": pa.array([], type=pa.int64())})
        )
    d = int(parts[0]["d"])
    n = sum(int(p["n"]) for p in parts)
    s1 = np.zeros(d, dtype=np.int64)
    s2 = np.zeros(d * d, dtype=np.int64)
    for p in parts:
        s1 += np.asarray(p["s1"], dtype=np.int64)
        s2 += np.asarray(p["s2"], dtype=np.int64)
    s2 = s2.reshape(d, d)
    num = n * s2 - np.outer(s1, s1)
    ii, jj = np.triu_indices(d)
    return ray.data.from_arrow(
        pa.table(
            {
                "i": pa.array(ii + 1, type=pa.int64()),
                "j": pa.array(jj + 1, type=pa.int64()),
                "num": pa.array(num[ii, jj], type=pa.int64()),
            }
        )
    )


def pca_fit(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    k: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA: returns ``(mean (d,), components (k, d), explained_var
    (k,))`` from one streaming moment pass + a driver-side ``eigh``."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _stack(batch, col).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], type=pa.int64()),
                "s1": pa.array([x.sum(axis=0).tolist()]),
                "s2": pa.array([(x.T @ x).reshape(-1).tolist()]),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_combine_partials, batch_format="pyarrow", batch_size=256)
        .take_all()
    )
    n = sum(int(p["n"]) for p in parts)
    s1 = np.sum([np.asarray(p["s1"]) for p in parts], axis=0)
    d = len(s1)
    s2 = np.sum([np.asarray(p["s2"]) for p in parts], axis=0).reshape(d, d)
    mean = s1 / n
    cov = (s2 - np.outer(s1, s1) / n) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # fix sign: largest-|loading| entry positive per component
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return mean, comps, evals[order]


def pca_transform(
    ds: "ray.data.Dataset",
    mean: np.ndarray,
    components: np.ndarray,
    col: str = "embedding",
    out_col: str = "pca",
) -> "ray.data.Dataset":
    """Append ``out_col`` = centered projection onto the components —
    stateless vectorized map; the (k, d) matrix ships in the closure."""
    mean = np.asarray(mean, dtype=np.float64)
    comp_t = np.asarray(components, dtype=np.float64).T

    def project(batch: pa.Table) -> pa.Table:
        x = _stack(batch, col).astype(np.float64)
        proj = (x - mean) @ comp_t if x.size else x.reshape(0, 0)
        return batch.append_column(
            out_col, pa.array(list(proj), type=pa.list_(pa.float64()))
        )

    return ds.map_batches(project, batch_format="pyarrow")


def quantize_embeddings(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> "ray.data.Dataset":
    """Per-vector symmetric int8 quantization — the embedding-compression
    step of a training-data pipeline (4x smaller than float32, decoded
    as ``code * absmax / levels``).

    Emits the LONG form ``(id, i, code, absmax)`` with
    ``code = floor(x * levels / absmax)`` over each vector's max-|x|
    scale.  All arithmetic is float32→double exact + floor (no
    round-half ties), so a SQL mirror computes identical codes.
    Stateless vectorized map; zero exchanges.
    """

    def quant(batch: pa.Table) -> pa.Table:
        x = _stack(batch, col).astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n, d = x.shape if x.size else (0, 0)
        if not n:
            return pa.table(
                {"id": pa.array([], type=pa.int64()),
                 "i": pa.array([], type=pa.int64()),
                 "code": pa.array([], type=pa.int64()),
                 "absmax": pa.array([], type=pa.float64())}
            )
        m = np.abs(x).max(axis=1)
        safe = np.where(m == 0.0, 1.0, m)
        codes = np.floor(x * float(levels) / safe[:, None]).astype(np.int64)
        codes[m == 0.0] = 0
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, d), type=pa.int64()),
                "i": pa.array(np.tile(np.arange(1, d + 1), n), type=pa.int64()),
                "code": pa.array(codes.reshape(-1), type=pa.int64()),
                "absmax": pa.array(np.repeat(m, d), type=pa.float64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")
