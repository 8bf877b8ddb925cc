"""Per-key exponentially weighted moving average (EWMA) — the linear
recurrence y_t = α·x_t + (1−α)·y_{t−1}, y_0 = x_0 (pandas
``adjust=False`` semantics), ordered by event time within each key.

Distribution: one hash exchange via ``ops/agg.sharded_groupby_apply``
(all rows of a key share a shard — the same contract as every grouped
window here); inside the shard the recurrence runs on pandas'
C-implemented grouped ``ewm`` after ONE vectorized lexsort, so there is
no per-group Python call and no per-row loop.  State never crosses
shards, so at 10^12 rows the op scales with the largest single key,
not the corpus.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .agg import sharded_groupby_apply


def ewma_by(ds, key: str, order: Sequence[str], value: str, alpha: float,
            id_cols: Sequence[str], out: str = "ewma", num_shards: int = 64):
    """Rows ``[*id_cols, out]`` with `out` = EWMA of `value` within each
    `key` group in `order`-sorted sequence, rounded to 6 digits."""
    order = list(order)
    id_cols = list(id_cols)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key, *order], kind="stable")
        e = (
            d.groupby(key, sort=False)[value]
            .ewm(alpha=alpha, adjust=False)
            .mean()
        )
        res = d[id_cols].copy()
        res[out] = np.round(e.to_numpy(), 6)
        return res

    cols = list(dict.fromkeys([key, *order, value, *id_cols]))
    return sharded_groupby_apply(
        ds.select_columns(cols), [key], apply, num_shards=num_shards
    )
