"""Sequence packing and mixture replication — the two assembly steps a
training-data pipeline runs after filtering/dedup: pack variable-length
documents into fixed token-budget bins (sequence packing for efficient
batching) and up/down-weight corpus slices into a target mixture.

Both are deterministic and cross-engine auditable (md5-keyed, same
convention as ops/sample.py), so a SQL engine can reproduce the exact
bin assignment / copy multiset — resume- and cluster-layout-invariant.

Scale shapes:

- :func:`pack_bins` — packing is inherently sequential *within a stream*,
  so the stream is the unit of distribution: docs are md5-sharded into
  ``num_shards`` independent streams, each stream is packed greedily
  in doc-id order inside one sharded-reduce call.  The per-shard kernel
  is O(num_bins) numpy ``searchsorted`` steps over the cumulative token
  sum, NOT O(docs) Python.  Bin quality (fill fraction) is unaffected by
  sharding for i.i.d. doc lengths; at 100 TB, shard count scales with
  cluster size and each stream packs independently.
- :func:`mix_weighted` — a stateless per-batch map: integer part of the
  weight replicates every row, the fractional part keeps a deterministic
  md5-percentile slice.  No shuffle; output feeds a downstream
  shuffle/pack stage.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .agg import sharded_groupby_apply


def _md5_60bit(keys) -> np.ndarray:
    """First 15 hex chars of md5(str(key)) as int64 — the cross-engine
    rank/shard key (DuckDB: ``('0x' || substr(md5(k::VARCHAR),1,15))::BIGINT``)."""
    return np.fromiter(
        (
            int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:15], 16)
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def _greedy_bins(n_tok: np.ndarray, capacity: int) -> np.ndarray:
    """First-fit-in-order bin ids for one stream: O(num_bins) searchsorted
    steps on the cumulative sum; an oversize doc (> capacity) gets a bin
    of its own."""
    cs = np.cumsum(n_tok.astype(np.int64))
    bins = np.empty(len(n_tok), dtype=np.int64)
    start, b = 0, 0
    base = np.int64(0)
    while start < len(n_tok):
        end = int(np.searchsorted(cs, base + capacity, side="right"))
        if end == start:  # oversize doc: own bin
            end = start + 1
        bins[start:end] = b
        b += 1
        base = cs[end - 1]
        start = end
    return bins


def pack_bins(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    capacity: int = 256,
    num_shards: int = 8,
) -> "ray.data.Dataset":
    """Assign every document to a ``(shard, bin)`` such that each bin's
    whitespace-token total is <= ``capacity`` (oversize docs bin alone),
    greedy in ``id_column`` order within each md5-derived shard.

    Output: ``(doc_id, shard, bin, n_tok)``."""

    def annotate(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        n_tok = np.fromiter(
            (len((t or "").split()) for t in batch[text_column].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        shard = _md5_60bit(ids) % num_shards
        return pa.table(
            {
                id_column: batch[id_column],
                "shard": pa.array(shard, type=pa.int64()),
                "n_tok": pa.array(n_tok, type=pa.int64()),
            }
        )

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, g in df.groupby("shard", sort=False):
            g = g.sort_values(id_column, kind="mergesort")
            out.append(
                pd.DataFrame(
                    {
                        id_column: g[id_column].to_numpy(),
                        "shard": shard,
                        "bin": _greedy_bins(g["n_tok"].to_numpy(), capacity),
                        "n_tok": g["n_tok"].to_numpy(),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    annotated = ds.map_batches(annotate, batch_format="pyarrow")
    return sharded_groupby_apply(annotated, ["shard"], pack, num_shards=num_shards)


def mix_weighted(
    ds: "ray.data.Dataset",
    weights: Dict[str, float],
    weight_column: str = "lang",
    key_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic mixture resampling: each row appears
    ``floor(w) + (md5pct(key) < round(frac(w)*100))`` times, where ``w``
    is ``weights[row[weight_column]]`` (missing -> 0, i.e. dropped) and
    md5pct is the ops/sample.py percentile.  Fractional weights have
    1% granularity by construction.  Output adds a ``copy`` column
    (1..n) so downstream stages can salt repeated rows apart."""
    whole = {k: int(np.floor(w)) for k, w in weights.items()}
    frac_pct = {k: int(round((w - np.floor(w)) * 100)) for k, w in weights.items()}

    def replicate(batch: pa.Table) -> pa.Table:
        keys = batch[key_column].to_pylist()
        groups = batch[weight_column].to_pylist()
        pct = np.fromiter(
            (
                int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:8], 16) % 100
                for k in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        n = np.fromiter(
            (
                whole.get(g, 0) + (1 if pct[i] < frac_pct.get(g, 0) else 0)
                for i, g in enumerate(groups)
            ),
            dtype=np.int64,
            count=len(groups),
        )
        idx = np.repeat(np.arange(batch.num_rows), n)
        ends = np.cumsum(n)
        copy = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - n, n
        ) + 1
        out = batch.take(pa.array(idx))
        return out.append_column("copy", pa.array(copy, type=pa.int64()))

    return ds.map_batches(replicate, batch_format="pyarrow")
