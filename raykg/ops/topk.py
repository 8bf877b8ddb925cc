"""Per-group top-k — the windowed `row_number() <= k` of SQL.

The group count (conversations, users, queries) scales with the corpus,
so this rides :func:`raykg.ops.agg.sharded_groupby_apply`: one vectorized
sort + ``groupby.head(k)`` per SHARD, never a Python call per key.  Rows
of one key are co-located by the shard hash, so per-key ranks are exact.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray.data

from .agg import sharded_groupby_apply


def group_topk(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    value_column: str,
    k: int,
    ascending: bool = False,
    tiebreak: Sequence[str] = (),
    rank_column: str = "rank",
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Keep the top ``k`` rows per key group ordered by ``value_column``
    (descending by default), with deterministic ``tiebreak`` columns
    (ascending) and a 1-based ``rank_column`` appended."""
    keys = list(keys)
    tiebreak = list(tiebreak)

    def shard_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            keys + [value_column] + tiebreak,
            ascending=[True] * len(keys) + [ascending] + [True] * len(tiebreak),
            kind="stable",
        )
        df[rank_column] = df.groupby(keys, sort=False).cumcount() + 1
        return df[df[rank_column] <= k]

    return sharded_groupby_apply(ds, keys, shard_topk, num_shards=num_shards)
