"""Per-group Gini coefficient (income-inequality index over a value
column), the sorted-rank formulation:

    G = 2 * Σ_i (i * x_(i)) / (n * Σ x) - (n + 1) / n      (x sorted asc)

Distribution: one hash exchange via ``ops/agg.sharded_groupby_apply``
(O(num_shards) engine groups regardless of key cardinality); the
per-shard kernel sorts each key's values vectorized (a single lexsort
over (key, value) + segmented index arithmetic — no per-group Python
loop).  Partitioning assumption: one key's rows fit in a shard worker,
the same contract as every grouped aggregate here.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .agg import sharded_groupby_apply


def _shard_gini(keys: Sequence[str], value: str, out: str):
    def apply(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([*keys, value], kind="stable")
        v = d[value].to_numpy(dtype=np.float64)
        # per-row 1-based rank within its (already contiguous) group
        i = d.groupby(list(keys), sort=False).cumcount().to_numpy() + 1
        d = d.assign(__iv=i * v)
        g = d.groupby(list(keys), sort=False).agg(
            __siv=("__iv", "sum"), __sv=(value, "sum"), __n=(value, "size")
        )
        gini = 2.0 * g["__siv"] / (g["__n"] * g["__sv"]) - (g["__n"] + 1.0) / g["__n"]
        out_df = g.reset_index()[list(keys)]
        out_df[out] = np.round(gini.to_numpy(), 6)
        return out_df

    return apply


def gini_by(ds, keys: Sequence[str], value: str, out: str = "gini",
            num_shards: int = 64):
    """Per-key Gini of `value`: one row per key group, rounded to 6
    digits (ties in `value` contribute the same Σ i*x regardless of
    order, so the result is tie-order invariant)."""
    keys = list(keys)
    return sharded_groupby_apply(
        ds.select_columns([*keys, value]),
        keys,
        _shard_gini(keys, value, out),
        num_shards=num_shards,
    )
