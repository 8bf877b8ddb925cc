"""One-way ANOVA F test over a categorical grouping, moment-exact.

Per-group moments (n_g, Σx, Σx²) are additive partials: pre-aggregated
vectorized inside every batch, combined by a bounded groupby (group
cardinality is the operator's contract — event types, languages, not
corpus-scale keys).  The caller supplies INTEGER values (e.g. cents):
integer sums are exact in int64 / float64 below 2^53, so both this and
a SQL mirror see identical moment inputs, and the only float work is
the final O(k)-term statistic:

    SSB = Σ_g s_g²/n_g − s²/n      (between groups)
    SSW = Σx² − Σ_g s_g²/n_g       (within groups)
    F   = (SSB/(k−1)) / (SSW/(n−k)),   η² = SSB/(SSB+SSW)

Only O(1)-scale RATIOS are emitted rounded — raw sums of squares at
corpus scale cannot hold a 1e-6 absolute rounding contract across two
engines' summation orders, ratios can.

int64 bound: Σx² exact while under 2^63 (~1e9 rows at cent scale);
beyond that the partial must widen — guarded by the caller's scaling.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def anova_f(ds, group: str, value: str) -> pa.Table:
    """One row {k, n, f_stat, eta_sq} for the one-way ANOVA of integer
    column `value` across the levels of `group`."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas()
        v = df[value].to_numpy(dtype=np.int64)
        df = pd.DataFrame({group: df[group], "s": v, "ss": v * v})
        g = df.groupby(group, sort=False).agg(
            n=("s", "size"), s=("s", "sum"), ss=("ss", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    moments = (
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group)
        .sum(["n", "s", "ss"])
        .to_pandas()
        .sort_values(group)
    )
    n_g = moments["sum(n)"].to_numpy(dtype=np.float64)
    s_g = moments["sum(s)"].to_numpy(dtype=np.float64)
    n = float(n_g.sum())
    s = float(s_g.sum())
    ss = float(moments["sum(ss)"].sum())
    k = len(moments)
    sg = float((s_g * s_g / n_g).sum())
    ssb = sg - s * s / n
    ssw = ss - sg
    f = (ssb / (k - 1)) / (ssw / (n - k)) if k > 1 and ssw > 0 else float("nan")
    eta = ssb / (ssb + ssw) if ssb + ssw > 0 else float("nan")
    return pa.table(
        {
            "k": pa.array([k], type=pa.int64()),
            "n": pa.array([int(n)], type=pa.int64()),
            "f_stat": pa.array([round(f, 6)], type=pa.float64()),
            "eta_sq": pa.array([round(eta, 6)], type=pa.float64()),
        }
    )
