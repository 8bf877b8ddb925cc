"""Welch's unequal-variance two-sample t-test, moment-exact.

Same distribution contract as ``ops/anova.py``: the caller supplies
INTEGER values (e.g. cents), per-group moments (n, Σx, Σx²) are additive
partials pre-aggregated vectorized inside each batch and combined by a
bounded two-key groupby, so both this and a SQL mirror see identical
integer moment inputs.  Only the O(1)-scale outputs (t statistic and
Welch–Satterthwaite dof) are emitted as 6-digit-rounded floats — the
same float expression over the same exact integers is deterministic
across engines.

    t   = (m1 − m2) / sqrt(v1/n1 + v2/n2)
    dof = (v1/n1 + v2/n2)² / ((v1/n1)²/(n1−1) + (v2/n2)²/(n2−1))

int64 bound: Σx² exact while under 2^63 (~1e9 rows at cent scale);
beyond that the partial must widen — guarded by the caller's scaling.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def welch_ttest(ds, group: str, value: str, level_a: str, level_b: str) -> pa.Table:
    """One row {n_a, n_b, mean_diff_x100, t_stat, dof} for Welch's t-test
    of integer column ``value`` between ``group`` levels ``level_a`` and
    ``level_b``.  ``mean_diff_x100`` is the rounded mean difference kept
    in the caller's integer unit x100 so the scalar survives the 1e-6
    rounding contract at any magnitude."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas()
        df = df[df[group].isin([level_a, level_b])]
        v = df[value].to_numpy(dtype=np.int64)
        g = (
            pd.DataFrame({group: df[group].to_numpy(), "s": v, "ss": v * v})
            .groupby(group, sort=False)
            .agg(n=("s", "size"), s=("s", "sum"), ss=("ss", "sum"))
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    moments = (
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group)
        .sum(["n", "s", "ss"])
        .to_pandas()
        .set_index(group)
    )

    def side(level):
        row = moments.loc[level]
        n = float(row["sum(n)"])
        s = float(row["sum(s)"])
        ss = float(row["sum(ss)"])
        m = s / n
        var = (ss - s * s / n) / (n - 1.0)
        return n, m, var

    n1, m1, v1 = side(level_a)
    n2, m2, v2 = side(level_b)
    # explicit x*x (never **2 / POWER): identical IEEE ops on both engines
    a, b = v1 / n1, v2 / n2
    se2 = a + b
    t = (m1 - m2) / np.sqrt(se2) if se2 > 0 else float("nan")
    dof = (
        se2 * se2 / (a * a / (n1 - 1.0) + b * b / (n2 - 1.0))
        if se2 > 0
        else float("nan")
    )
    return pa.table(
        {
            "n_a": pa.array([int(n1)], type=pa.int64()),
            "n_b": pa.array([int(n2)], type=pa.int64()),
            "mean_diff_x100": pa.array(
                [round(100.0 * (m1 - m2), 6)], type=pa.float64()
            ),
            "t_stat": pa.array([round(float(t), 6)], type=pa.float64()),
            "dof": pa.array([round(float(dof), 6)], type=pa.float64()),
        }
    )
