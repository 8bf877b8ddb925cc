"""Mann–Kendall trend test over a time-bucketed count series.

The statistic  S = Σ_{i<j} sign(x_j − x_i)  over the time-ordered series
is EXACT INTEGER arithmetic — no float summation order to reconcile with
an oracle.  The distributed part is the bucketing: corpus-scale rows
fold into per-batch (bucket, n) partials and ONE bounded groupby (the
bucket domain is calendar-bounded — days, weeks — never corpus-scale),
after which the O(days²) pairwise fold is a driver-side numpy kernel
over a few-thousand-element vector.  The normal-approximation Z uses
the tie-corrected variance

    var = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18

(t = tied-group sizes), emitted 6-digit-rounded like every O(1) ratio.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def mann_kendall(counts: np.ndarray) -> tuple[int, float]:
    """(S, z) for the time-ordered integer series ``counts``."""
    x = np.asarray(counts, dtype=np.int64)
    n = len(x)
    # S = Σ_j (#less before j) − (#greater before j): O(n²) compares but
    # O(n) memory — n is calendar-bounded (days), never corpus-scale.
    s = 0
    for j in range(1, n):
        s += int((x[:j] < x[j]).sum()) - int((x[:j] > x[j]).sum())
    _, tie_counts = np.unique(x, return_counts=True)
    t = tie_counts.astype(np.int64)
    var = (
        n * (n - 1) * (2 * n + 5) - int((t * (t - 1) * (2 * t + 5)).sum())
    ) / 18.0
    if var <= 0:
        # degenerate series (n < 2 or all values tied): the oracles emit
        # 0.0 for this case (CASE WHEN var <= 0 THEN 0.0), so match them
        # rather than returning NaN and breaking value-hash parity.
        return s, 0.0
    if s > 0:
        z = (s - 1) / np.sqrt(var)
    elif s < 0:
        z = (s + 1) / np.sqrt(var)
    else:
        z = 0.0
    return s, float(z)


def daily_count_trend(ds, ts_column: str) -> pa.Table:
    """One row {n_buckets, n_rows, s_stat, z_stat} — Mann–Kendall trend of
    the per-DAY row counts of ``ds`` ordered by day.  Per-batch day
    partials, one calendar-bounded groupby, driver-side O(days²) fold."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        tsv = batch[ts_column].to_numpy(zero_copy_only=False)
        days = tsv.astype("datetime64[D]").astype(np.int64)
        uniq, counts = np.unique(days, return_counts=True)
        return pa.table(
            {
                "day": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    daily = (
        ds.select_columns([ts_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day")
    )
    counts = daily["n"].to_numpy(np.int64)
    s, z = mann_kendall(counts)
    return pa.table(
        {
            "n_buckets": pa.array([len(counts)], type=pa.int64()),
            "n_rows": pa.array([int(counts.sum())], type=pa.int64()),
            "s_stat": pa.array([s], type=pa.int64()),
            "z_stat": pa.array([round(z, 6)], type=pa.float64()),
        }
    )


def grouped_daily_trend(ds, group: str, ts_column: str) -> pa.Table:
    """Per-``group`` Mann–Kendall trend of daily row counts: the bounded
    (group x day) count table folds from per-batch partials through one
    calendar-bounded groupby, then each group's exact-integer S and
    tie-corrected Z compute on the driver (same kernel as
    :func:`mann_kendall`)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        tsv = batch[ts_column].to_numpy(zero_copy_only=False)
        days = tsv.astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"g": batch[group].to_pylist(), "day": days})
        out = df.groupby(["g", "day"], sort=False).size().rename("n")
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    daily = (
        ds.select_columns([group, ts_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "day"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["g", "day"])
    )
    rows = []
    for g, sub in daily.groupby("g", sort=True):
        counts = sub["n"].to_numpy(np.int64)
        s, z = mann_kendall(counts)
        rows.append((g, len(counts), int(counts.sum()), s, round(z, 6)))
    # infer the group column type from the data (int64 ids, strings, ...)
    # instead of hardcoding pa.string() — the kernel is type-agnostic.
    return pa.table(
        {
            group: pa.array([r[0] for r in rows], from_pandas=True),
            "n_buckets": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_rows": pa.array([r[2] for r in rows], type=pa.int64()),
            "s_stat": pa.array([r[3] for r in rows], type=pa.int64()),
            "z_stat": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )


def grouped_theil_sen(ds, group: str, ts_column: str) -> pa.Table:
    """Per-``group`` Theil–Sen estimator over the daily-count series
    (Theil 1950 / Sen 1968): slope = median of all pairwise slopes
    (y_j − y_i)/(x_j − x_i) over day pairs, intercept = median of
    y − slope·x — the robust companion to :func:`grouped_daily_trend`'s
    Mann–Kendall test (up to ~29% outlier days cannot move it, unlike
    OLS in ``ops/regress``).  Same scale shape as the rest of this
    module: per-batch (group, day) count partials, ONE calendar-bounded
    groupby, then the O(days²) pair fold per group is a driver-side
    numpy kernel over a few-thousand-element vector.  Groups with fewer
    than two day buckets have no pairwise slope and are omitted (as an
    inner-join SQL mirror does)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        tsv = batch[ts_column].to_numpy(zero_copy_only=False)
        days = tsv.astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"g": batch[group].to_pylist(), "day": days})
        out = df.groupby(["g", "day"], sort=False).size().rename("n")
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    daily = (
        ds.select_columns([group, ts_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "day"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["g", "day"])
    )

    def rnd6(v: float) -> float:
        return float(np.floor(abs(v) * 1e6 + 0.5) / 1e6 * np.sign(v)) + 0.0

    rows = []
    for g, sub in daily.groupby("g", sort=True):
        x = sub["day"].to_numpy(np.int64)
        y = sub["n"].to_numpy(np.int64)
        if len(x) < 2:
            continue
        iu, ju = np.triu_indices(len(x), k=1)
        slopes = (y[ju] - y[iu]).astype(np.float64) / (
            x[ju] - x[iu]
        ).astype(np.float64)
        slope = float(np.median(slopes))
        icept = float(np.median(y.astype(np.float64) - slope * x))
        rows.append((g, len(x), rnd6(slope), rnd6(icept)))
    return pa.table(
        {
            group: pa.array([r[0] for r in rows], from_pandas=True),
            "n_buckets": pa.array([r[1] for r in rows], type=pa.int64()),
            "slope": pa.array([r[2] for r in rows], type=pa.float64()),
            "intercept": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
