"""Spearman rank correlation, fully distributed with tie-averaged ranks.

Spearman rho = Pearson correlation of the AVERAGE ranks (standard
tie handling: every member of a tie group gets the mean of the
positions the group occupies).  The average rank of value v is
computable from the distinct-value count table alone:

    avgrank(v) = cum_count_through(v) - count(v) + (count(v) + 1) / 2

so the pipeline never ranks rows directly:

1. ``groupby(col).count()`` — one exchange, output = distinct values;
2. ``ops/scan.prefix_sum`` over the count table in value order — the
   sort is over DISTINCT values, not rows;
3. bucketed hash join of the (value -> avgrank) table back onto the
   rows (the rank side can be nearly row-cardinality for continuous
   columns, so a broadcast would be wrong at scale);
4. per-batch partial moments (n, Σrx, Σry, Σrx², Σry², Σrx·ry) and a
   tiny driver-side combine.

Rank sums are multiples of 0.25 below 2^53 at oracle scales, so the
moments are EXACT there; the final rho is rounded to 6 digits to
absorb the analytic-vs-SQL float path difference.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .join import bucketed_hash_join
from .scan import prefix_sum


def _avg_ranks(ds, col: str, out: str):
    counts = ds.groupby(col).count()
    run = prefix_sum(counts, "count()", sort_keys=[col], out_column="__cum")

    def rk(batch: pa.Table) -> pa.Table:
        c = batch["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        cum = batch["__cum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                col: batch[col],
                out: pa.array(cum - c + (c + 1.0) / 2.0, type=pa.float64()),
            }
        )

    return run.map_batches(rk, batch_format="pyarrow")


def spearman(ds, x: str, y: str, num_buckets: int = 64) -> pa.Table:
    """One-row table {'spearman_rho': float64 rounded to 6 digits} over
    the x/y columns of `ds` (rows with either side null are dropped by
    the inner join-back, matching SQL NULL rank semantics)."""
    rows = ds.select_columns([x, y])
    rows = bucketed_hash_join(
        rows, _avg_ranks(ds, x, "__rx"), on=x, num_buckets=num_buckets
    )
    rows = bucketed_hash_join(
        rows, _avg_ranks(ds, y, "__ry"), on=y, num_buckets=num_buckets
    )

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
