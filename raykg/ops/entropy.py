"""Per-group Shannon entropy of a categorical distribution.

    H(key) = -Σ_item p ln p = ln N - (Σ_item c·ln c) / N

with c the (key, item) pair count and N = Σ c.  Two bounded exchanges:

1. (key, item) pair counts via ``ops/agg.sharded_groupby_apply`` —
   pair cardinality scales with the data, so the engine must see
   O(num_shards) groups, not one group per pair;
2. a per-batch partial fold of (Σc, Σ c·ln c) over the pair-count table
   (rows per batch ≤ distinct keys) + one tiny groupby(key) sum — Σc and
   Σ c·ln c are both additive, so partials compose exactly.

No row-cardinality state ever reaches the driver.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import sharded_groupby_apply


def _pair_counts(keys: Sequence[str], item: str):
    def apply(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([*keys, item], sort=False).size().rename("__c")
        return g.reset_index()

    return apply


def group_entropy(ds, keys: Sequence[str], item: str, out: str = "entropy",
                  num_shards: int = 64):
    """One row per key group: Shannon entropy (nats, 6 digits) of the
    distribution of `item` values within the group."""
    keys = list(keys)
    pairs = sharded_groupby_apply(
        ds.select_columns([*keys, item]),
        [*keys, item],
        _pair_counts(keys, item),
        num_shards=num_shards,
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([*keys, "__c"]).to_pandas()
        c = df["__c"].to_numpy(dtype=np.float64)
        df["__clnc"] = c * np.log(c)
        g = df.groupby(keys, sort=False).agg(
            __n=("__c", "sum"), __s=("__clnc", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False).agg(
            __n=("__n", "sum"), __s=("__s", "sum")
        )
        h = np.log(g["__n"].to_numpy(dtype=np.float64)) - (
            g["__s"].to_numpy() / g["__n"].to_numpy(dtype=np.float64)
        )
        res = g.reset_index()[keys]
        res[out] = np.round(h, 6)
        return res

    parts = pairs.map_batches(partial, batch_format="pyarrow")
    return sharded_groupby_apply(parts, keys, fold, num_shards=num_shards)
