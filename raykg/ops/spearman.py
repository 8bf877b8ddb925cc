"""Spearman rank correlation, fully distributed with tie-averaged ranks.

Spearman rho = Pearson correlation of the AVERAGE ranks (standard tie
handling: every member of a tie group gets the mean of the positions the
group occupies).  Ranks come from ``ops/rank.with_avg_ranks`` —
rank-by-sort, ONE range-partitioned sort per column and no joins (the
value -> rank table of a continuous column is near row-cardinality, so
any join-back plan ships the whole corpus again); the x-ranks ride along
through the y-sort, so the pipeline is exactly two exchanges:

    drop-null -> sort(x) + block-local tie ranks -> sort(y) + ranks
    -> per-batch moment partials (n, Σrx, Σry, Σrx², Σry², Σrx·ry)
    -> tiny driver-side combine.

Rank sums are multiples of 0.25 below 2^53 at oracle scales, so the
moments are EXACT there; the final rho is rounded to 6 digits to absorb
the analytic-vs-SQL float path difference.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rank import with_avg_ranks


def spearman(ds, x: str, y: str) -> pa.Table:
    """One-row table {'spearman_rho': float64 rounded to 6 digits} over
    the x/y columns of `ds` (rows with either side null are dropped,
    matching SQL NULL rank semantics)."""
    rows = ds.select_columns([x, y]).map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow"
    )
    rows = with_avg_ranks(rows, x, "__rx")
    rows = with_avg_ranks(rows, y, "__ry")

    def moments(batch: pa.Table) -> pa.Table:
        a = batch["__rx"].to_numpy(zero_copy_only=False)
        b = batch["__ry"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([float(len(a))]),
                "sx": pa.array([a.sum()]),
                "sy": pa.array([b.sum()]),
                "sxx": pa.array([(a * a).sum()]),
                "syy": pa.array([(b * b).sum()]),
                "sxy": pa.array([(a * b).sum()]),
            }
        )

    parts = rows.map_batches(moments, batch_format="pyarrow")
    agg = parts.sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    n, sx, sy = agg["sum(n)"], agg["sum(sx)"], agg["sum(sy)"]
    sxx, syy, sxy = agg["sum(sxx)"], agg["sum(syy)"], agg["sum(sxy)"]
    den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    rho = float((n * sxy - sx * sy) / den) if den > 0 else float("nan")
    return pa.table({"spearman_rho": pa.array([round(rho, 6)], type=pa.float64())})
