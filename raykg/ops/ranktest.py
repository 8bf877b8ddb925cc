"""Mann-Whitney U (Wilcoxon rank-sum) two-sample test, distributed.

The statistic needs tie-AVERAGED ranks of the COMBINED two-group sample;
they come from ``ops/rank.with_avg_ranks`` (rank-by-sort: one
range-partitioned sort, block-local tie ranks, no joins — the group
column rides along through the sort).  Per-group rank sums are per-batch
partials (at most two rows per batch — the two groups) folded on the
driver.

Ranks are multiples of 0.5, so the sums are EXACT in float64 below 2^52;
U = R_g - n_g (n_g + 1) / 2 per group.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .rank import with_avg_ranks


def rank_sum_test(ds, group: str, value: str, group_a: str, group_b: str) -> pa.Table:
    """Two rows ``{grp, n, rank_sum, u_stat}`` (sorted by grp) for the
    two-sample rank-sum test of `value` between `group_a` and `group_b`
    rows of `ds`.  ``u_stat`` of one group is n_a*n_b minus the other's;
    the smaller U is the classical test statistic."""
    keep = pa.array([group_a, group_b], type=pa.string())

    def only_two(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[group], value_set=keep)).drop_null()

    two = ds.select_columns([group, value]).map_batches(
        only_two, batch_format="pyarrow"
    )
    ranked = with_avg_ranks(two, value, "__rk")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"grp": batch[group].to_pandas(),
             "rk": batch["__rk"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("grp", sort=False).agg(n=("rk", "size"), r=("rk", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ranked.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.groupby("grp").sum().sort_index()
    n = tot["n"].to_numpy(dtype=np.float64)
    r = tot["r"].to_numpy(dtype=np.float64)
    u = r - n * (n + 1.0) / 2.0
    return pa.table(
        {
            "grp": pa.array(tot.index.to_list(), type=pa.string()),
            "n": pa.array(n.astype(np.int64), type=pa.int64()),
            "rank_sum": pa.array(np.round(r, 2), type=pa.float64()),
            "u_stat": pa.array(np.round(u, 2), type=pa.float64()),
        }
    )
