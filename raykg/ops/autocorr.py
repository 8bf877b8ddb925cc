"""Lag-k autocorrelation of a per-key ordered series (pooled Pearson).

Pairs (x_{t-k}, x_t) are formed WITHIN each key's time-ordered sequence
(a grouped shift — state never crosses keys), then a single Pearson
correlation is computed over the pooled pairs: the standard panel-data
lag-k autocorrelation.  Values are INTEGER fixed-point (caller scales,
e.g. cents), so every moment partial (n, Σx, Σy, Σx², Σy², Σxy) is an
exact integer below 2^53 on both this engine and a SQL LAG mirror; the
only float work is the one-row final ratio.

Distribution: one hash exchange via ``ops/agg.sharded_groupby_apply``,
ONE vectorized lexsort + C grouped shift per shard, each shard emitting
a single moment-partial row — the exchange output is O(shards), and the
final combine is a tiny ``Dataset.sum``.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def lag_corr(ds, key: str, order: Sequence[str], value: str,
             lag: int = 1, num_shards: int = 64) -> pa.Table:
    """One row {n_pairs, autocorr}: Pearson r of (x_{t-lag}, x_t) pairs
    pooled across all `key` groups in `order`-sorted sequence."""
    from .agg import sharded_groupby_apply

    order = list(order)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key, *order], kind="stable")
        y = d[value].to_numpy(dtype=np.float64)
        x = d.groupby(key, sort=False)[value].shift(lag).to_numpy(
            dtype=np.float64
        )
        m = ~np.isnan(x)
        x, y = x[m], y[m]
        return pd.DataFrame(
            {
                "n": [float(len(x))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxx": [(x * x).sum()],
                "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    cols = list(dict.fromkeys([key, *order, value]))
    parts = sharded_groupby_apply(
        ds.select_columns(cols), [key], apply, num_shards=num_shards
    )
    agg = parts.sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    n, sx, sy = agg["sum(n)"], agg["sum(sx)"], agg["sum(sy)"]
    sxx, syy, sxy = agg["sum(sxx)"], agg["sum(syy)"], agg["sum(sxy)"]
    den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    r = float((n * sxy - sx * sy) / den) if den > 0 else float("nan")
    return pa.table(
        {
            "n_pairs": pa.array([int(n)], type=pa.int64()),
            "autocorr": pa.array([round(r, 6)], type=pa.float64()),
        }
    )
