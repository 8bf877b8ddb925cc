"""Cardinality sketching — KMV (k-minimum-values) approximate distinct
count.

The exact distinct count of a corpus-scaled key needs an all-to-all
exchange of every distinct value; the KMV sketch replaces it with a
BOUNDED summary: each block contributes its k smallest 60-bit hash
values (≤ k rows per block regardless of block size), merging is a
tiny global ``sort().limit(k)``, and the estimate comes from the k-th
smallest hash — ``(k-1) * 2^60 / h_k`` (uniform order statistics).
When fewer than k distinct hashes exist the sketch IS the distinct set
and the count is exact.  Standard error ~ 1/sqrt(k-2) (~6% at k=256).

The hash is the corpus-auditability idiom from ``ops/sample.py``: the
first 15 hex chars of ``md5(str(value))`` — cross-engine reproducible,
so a SQL engine computes the *identical* sketch and estimate (DuckDB:
``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT``).  The
estimate is integer arithmetic end-to-end: deterministic, exactly
comparable.
"""

from __future__ import annotations

import hashlib
import heapq

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import AggregateFnV2
from ray.data.block import BlockAccessor

_BITS = 60  # 15 hex chars; fits int64 with headroom


def _h60(value) -> int:
    return int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16)


class KmvSketch(AggregateFnV2):
    """Dataset-native KMV accumulator: each block contributes its ≤ k
    smallest distinct hashes, partials tree-combine through Ray Data's
    aggregate machinery (never through the driver), and ``finalize``
    turns the k-th order statistic into the integer estimate."""

    def __init__(self, on: str, k: int = 256):
        self._k = k
        super().__init__(
            f"kmv({on})",
            zero_factory=lambda: np.zeros(0, dtype=np.int64),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        col = BlockAccessor.for_block(block).to_arrow()[self.get_target_column()]
        hs = {_h60(v) for v in col.to_pylist() if v is not None}
        return np.array(sorted(heapq.nsmallest(self._k, hs)), dtype=np.int64)

    def combine(self, acc: np.ndarray, new: np.ndarray) -> np.ndarray:
        return np.union1d(acc, new)[: self._k]

    def finalize(self, acc: np.ndarray) -> int:
        if len(acc) < self._k:
            return int(len(acc))
        return (self._k - 1) * (1 << _BITS) // int(acc[-1])


def kmv_distinct(
    ds: "ray.data.Dataset", column: str, k: int = 256
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT column) via a k-minimum-values sketch.

    Returns a one-row DataFrame ``{n_distinct_est}``.  Per-block and
    per-combine state is ≤ k ints — the sketch contract is exactly that
    nothing cardinality-sized ever moves or materializes."""
    out = ds.aggregate(KmvSketch(column, k=k))
    return pd.DataFrame([{"n_distinct_est": int(out[f"kmv({column})"])}])


def kmv_oracle_sql(table: str, column: str, k: int = 256) -> str:
    """The DuckDB mirror of :func:`kmv_distinct` — identical hash,
    identical integer estimate."""
    return f"""
    WITH h AS (SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
               FROM {table} WHERE {column} IS NOT NULL),
    k AS (SELECT h FROM h ORDER BY h LIMIT {k})
    SELECT CAST(CASE WHEN (SELECT COUNT(*) FROM k) < {k}
                     THEN (SELECT COUNT(*) FROM k)
                     ELSE ({k - 1} * (CAST(1 AS HUGEINT) << {_BITS}))
                          // (SELECT MAX(h) FROM k)
                END AS BIGINT) AS n_distinct_est
    """
