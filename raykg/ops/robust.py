"""Robust per-group outlier detection: median/MAD over exact integer
histograms, modified-z threshold as a pure-integer predicate.

The contract is a BOUNDED integer value domain (e.g. cents of a bounded
metric): per-batch (group, value, count) partials fold through one
bounded groupby into a histogram whose size is |groups| x |domain| —
never corpus-scale — so the driver extracts EXACT order statistics
(lower median, rank = (n-1)//2 + 1, matching SQL ``quantile_disc(0.5)``)
and the MAD from the deviation histogram.  The outlier test
|0.6745·(x−med)/MAD| > 3.5 is cleared of floats entirely:

    6745 · |x − med| > 35000 · MAD

which also gives the right degenerate behavior at MAD = 0 (any nonzero
deviation is an outlier) without a special case.  Group stats broadcast
via the closure; the second pass streams and filters vectorized.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hist_median(vals: np.ndarray, counts: np.ndarray) -> int:
    """Lower median (SQL quantile_disc(0.5)) of the histogram, exact."""
    order = np.argsort(vals, kind="stable")
    v, c = vals[order], counts[order]
    n = int(c.sum())
    rank = (n - 1) // 2 + 1
    idx = int(np.searchsorted(np.cumsum(c), rank))
    return int(v[idx])


def group_median_mad(ds, group: str, value: str) -> dict:
    """{group_level: (median, mad)} over integer column ``value``."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas()
        g = df.groupby([group, value], sort=False).size().rename("c")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    hist = (
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group, value])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    stats = {}
    for level, sub in hist.groupby(group):
        vals = sub[value].to_numpy(np.int64)
        counts = sub["c"].to_numpy(np.int64)
        med = _hist_median(vals, counts)
        dev = np.abs(vals - med)
        # deviation histogram: same counts re-keyed by |v - med|
        dd = pd.DataFrame({"d": dev, "c": counts}).groupby("d")["c"].sum()
        mad = _hist_median(dd.index.to_numpy(np.int64), dd.to_numpy(np.int64))
        stats[level] = (med, mad)
    return stats


def mad_outliers(ds, group: str, value: str, keep_cols) -> "ray.data.Dataset":
    """Rows whose integer ``value`` fails the modified-z test within its
    ``group`` (6745·|x−med| > 35000·MAD): ``keep_cols`` + value_c + dev_c."""
    import ray

    stats = group_median_mad(ds, group, value)
    stats_ref = ray.put(stats)

    def filt(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        gv = pd.Series(batch[group].to_pylist())
        med = gv.map({k: v[0] for k, v in st.items()}).to_numpy(np.int64)
        mad = gv.map({k: v[1] for k, v in st.items()}).to_numpy(np.int64)
        v = batch[value].to_numpy(zero_copy_only=False)
        dev = np.abs(v - med)
        keep = 6745 * dev > 35000 * mad
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                **{c: out[c] for c in keep_cols},
                "value_c": pa.array(
                    out[value].to_numpy(zero_copy_only=False), type=pa.int64()
                ),
                "dev_c": pa.array(dev[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")
