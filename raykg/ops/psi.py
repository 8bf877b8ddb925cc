"""Population Stability Index between two time halves of a stream.

PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i) — the standard drift monitor
between a reference window and a comparison window, here the first vs
second half of the observed time span (split at the integer midpoint of
min/max event time, so the split is exactly reproducible in SQL).
Buckets are fixed-width value bins (integer arithmetic); buckets empty
on either side are skipped (the standard finite-PSI convention,
mirrored by the oracle's WHERE).

Distribution: pass 1 is a tiny min/max aggregate; pass 2 counts
(bucket, half) cells per batch and folds them over a BOUNDED table
(nbuckets × 2) — counts are exact integers, the only float work is the
final O(nbuckets) sum.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Min


def psi_time_split(ds, ts: str, value: str, width: float,
                   nbuckets: int) -> pa.Table:
    """One row {psi, n_a, n_b}: PSI of `value` (fixed `width` bins,
    capped at `nbuckets`) between rows at-or-before vs after the
    midpoint of `ts` (microsecond precision)."""
    import pyarrow.compute as pc

    def us(batch: pa.Table) -> pa.Table:
        # aggregate over an int64 microsecond column — scalar timestamp
        # results leak engine-dependent units (pandas .value is ns)
        return pa.table({"__us": pc.cast(batch[ts], pa.int64())})

    mm = ds.select_columns([ts]).map_batches(
        us, batch_format="pyarrow"
    ).aggregate(Min("__us"), Max("__us"))
    mid = (int(mm["min(__us)"]) + int(mm["max(__us)"])) // 2

    def cells(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch[ts], pa.int64()).to_numpy(zero_copy_only=False)
        v = batch[value].to_numpy(zero_copy_only=False)
        b = np.minimum((v / width).astype(np.int64), nbuckets - 1)
        half = (t > mid).astype(np.int64)
        df = pd.DataFrame({"bucket": b, "half": half})
        g = df.groupby(["bucket", "half"], sort=False).size().rename("n")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    folded = (
        ds.select_columns([ts, value])
        .map_batches(cells, batch_format="pyarrow")
        .groupby(["bucket", "half"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    piv = folded.pivot_table(index="bucket", columns="half", values="n",
                             fill_value=0, aggfunc="sum").sort_index()
    na = piv[0].to_numpy(dtype=np.float64) if 0 in piv else np.zeros(len(piv))
    nb = piv[1].to_numpy(dtype=np.float64) if 1 in piv else np.zeros(len(piv))
    ta, tb = na.sum(), nb.sum()
    keep = (na > 0) & (nb > 0)
    p, q = na[keep] / ta, nb[keep] / tb
    psi = float(((p - q) * np.log(p / q)).sum())
    return pa.table(
        {
            "psi": pa.array([round(psi, 6)], type=pa.float64()),
            "n_a": pa.array([int(ta)], type=pa.int64()),
            "n_b": pa.array([int(tb)], type=pa.int64()),
        }
    )
