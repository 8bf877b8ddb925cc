"""Per-key CUSUM changepoint detection, integer-exact.

For each key's time-ordered series x_1..x_n the changepoint statistic
at split k is the centered cumulative-sum deviation

    dev_k = |n * S_k - k * S_n|,   S_k = x_1 + ... + x_k,  1 <= k < n

— the classical CUSUM / max-type changepoint scan (public standard
form; equivalent to max |S_k - (k/n) S_n| scaled by n).  Values are
fixed-point integers (the caller scales, e.g. cents), so dev is EXACT
int64 arithmetic with no float path: argmax and the SQL window mirror
agree bit-for-bit, ties broken toward the smallest k.

Distribution: one hash exchange via ``ops/agg.sharded_groupby_apply``
(all rows of a key share a shard); inside the shard ONE vectorized
lexsort then pandas' C grouped cumsum/size/sum — no per-key Python.
Keys with n < 2 have no interior split and are dropped.

int64 bound: dev <= n^2 * max|x|; exact while that stays under 2^63
(n ~ 1e7 rows per key at cent scale) — per-KEY length, not corpus size.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .agg import sharded_groupby_apply


def cusum_by(ds, key: str, order: Sequence[str], value: str,
             num_shards: int = 64):
    """Rows [key, n, change_k, dev]: the interior split k (1-based)
    maximizing |n*S_k - k*S_n| of integer column `value` within each
    key group in `order`-sorted sequence; ties -> smallest k."""
    order = list(order)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key, *order], kind="stable")
        g = d.groupby(key, sort=False)[value]
        v = d[value].to_numpy(dtype=np.int64)
        s = g.cumsum().to_numpy(dtype=np.int64)
        k = (g.cumcount() + 1).to_numpy(dtype=np.int64)
        n = g.transform("size").to_numpy(dtype=np.int64)
        st = g.transform("sum").to_numpy(dtype=np.int64)
        dev = np.abs(n * s - k * st)
        keep = k < n  # interior splits of keys with n >= 2
        out = pd.DataFrame(
            {
                key: d[key].to_numpy()[keep],
                "n": n[keep],
                "change_k": k[keep],
                "dev": dev[keep],
            }
        )
        # rows are k-ascending within each key, so idxmax (first max)
        # lands on the smallest attaining k
        best = out.loc[out.groupby(key, sort=False)["dev"].idxmax()]
        return best.reset_index(drop=True)

    cols = list(dict.fromkeys([key, *order, value]))
    return sharded_groupby_apply(
        ds.select_columns(cols), [key], apply, num_shards=num_shards
    )
