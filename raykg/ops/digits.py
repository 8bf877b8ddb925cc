"""Benford leading-digit profile (fraud / data-quality audit).

The leading digit is extracted EXACTLY: the value is scaled to integer
units (cents by default), then reduced by vectorized integer division —
never ``floor(log10 v)``, whose float error flips the digit of exact
powers of ten.  Per-batch 9-bin histograms fold to one row per digit;
no per-row Python and no exchange at all (the final fold is 9 rows).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def benford_digits(ds, value: str, scale: float = 100.0) -> pa.Table:
    """Nine rows {digit, n, p, benford_p}: observed leading-digit share
    of ``round(value * scale)`` over positive values vs the Benford
    expectation log10(1 + 1/d), both rounded to 6 digits."""
    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value].to_numpy(zero_copy_only=False)
        i = np.round(v * scale).astype(np.int64)
        i = i[i > 0]
        while True:
            big = i >= 10
            if not big.any():
                break
            i[big] //= 10
        counts = np.bincount(i, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10), type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    parts = ds.select_columns([value]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    tot = parts.groupby("digit")["n"].sum().reindex(range(1, 10), fill_value=0)
    n = tot.to_numpy(dtype=np.float64)
    d = np.arange(1, 10, dtype=np.float64)
    return pa.table(
        {
            "digit": pa.array(np.arange(1, 10), type=pa.int64()),
            "n": pa.array(tot.to_numpy().astype(np.int64), type=pa.int64()),
            "p": pa.array(np.round(n / n.sum(), 6), type=pa.float64()),
            "benford_p": pa.array(
                np.round(np.log(1.0 + 1.0 / d) / np.log(10.0), 6),
                type=pa.float64(),
            ),
        }
    )
