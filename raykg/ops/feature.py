"""Per-group feature normalization (z-score) — ML feature prep.

Parity note: not in the reference plugin; this is the feature-scaling
stage of a training pipeline (normalize a numeric column within each
category before modeling).

Scale shape — NO row exchange at all: per-batch ``(group, n, sum,
sumsq)`` partials tree-reduce to one tiny stats table (group-count
sized), which ships back via ``ray.put`` into a stateless map that
attaches the z-score.  Rows never shuffle; the only moving state is
three doubles per group.  This is the right shape whenever the group
count is bounded (categories, priorities, languages) — for
corpus-scaled keys use `ops/window.window_over`'s sharded machinery
instead.

Determinism: population variance from the sum/sumsq moments —
``var = sumsq/n - mean^2`` — mirrors exactly in SQL (no engine
``STDDEV``, whose algorithm differs); float summation order still
varies, so consumers round (the driver query rounds to 6)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def zscore_by_group(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    out_column: str = "zscore",
) -> "ray.data.Dataset":
    """Append ``out_column`` = (value - group_mean) / group_stddev_pop.
    Groups with zero variance get z-score 0.0."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {"g": batch[group_column], "v": batch[value_column]}
        ).to_pandas()
        v = df["v"].astype(np.float64)
        agg = df.assign(v=v, v2=v * v).groupby("g", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("v2", "sum")
        )
        return pa.table(
            {
                "g": pa.array(agg.index, type=batch[group_column].type),
                "n": pa.array(agg["n"], type=pa.int64()),
                "s": pa.array(agg["s"], type=pa.float64()),
                "ss": pa.array(agg["ss"], type=pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    stats = parts.groupby("g", sort=False).sum()
    mean = stats["s"] / stats["n"]
    var = stats["ss"] / stats["n"] - mean * mean
    table = pd.DataFrame(
        {"mean": mean, "sd": np.sqrt(np.maximum(var, 0.0))}
    )
    ref = ray.put(table)

    def attach(batch: pa.Table, ref=ref) -> pa.Table:
        st = ray.get(ref)
        df = pa.table(
            {"g": batch[group_column], "v": batch[value_column]}
        ).to_pandas()
        m = df["g"].map(st["mean"]).to_numpy(dtype=np.float64)
        sd = df["g"].map(st["sd"]).to_numpy(dtype=np.float64)
        v = df["v"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0.0, (v - m) / sd, 0.0)
        return batch.append_column(out_column, pa.array(z, type=pa.float64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def quantile_bucketize(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    n_buckets: int = 4,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Equi-depth feature discretization: per row, the bucket index
    ``0..n_buckets-1`` of its value within its group's exact quantile
    grid — the binning companion to :func:`zscore_by_group`.

    Thresholds are ``quantile_disc(i / n_buckets)`` for ``i = 1..n-1``
    (exact, via the key-sharded ``ops/events.key_quantiles``), a
    group-cardinality-sized table broadcast as a LUT into one stateless
    filter-free map — rows never shuffle.  The bucket is the COUNT of
    thresholds <= value (``searchsorted`` right), which a SQL mirror
    reproduces exactly as a sum of CASE comparisons (duplicated
    thresholds count once each, both sides — ties behave identically).
    """
    import ray

    from .events import key_quantiles

    qs = [i / n_buckets for i in range(1, n_buckets)]
    names = [f"p{round(q * 100):d}" for q in qs]
    thr = key_quantiles(
        ds.select_columns([group_column, value_column]),
        key_column=group_column,
        value_column=value_column,
        quantiles=qs,
        num_shards=num_shards,
    ).to_pandas()
    lut = {
        row[group_column]: np.asarray([row[n] for n in names], dtype=np.float64)
        for _, row in thr.iterrows()
    }
    lut_ref = ray.put(lut)

    def bucketize(batch: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        groups = pd.Series(batch[group_column].to_pylist())
        vals = batch[value_column].to_numpy(zero_copy_only=False)
        out = np.empty(len(groups), dtype=np.int64)
        # one vectorized searchsorted per DISTINCT group in the batch
        codes, uniques = pd.factorize(groups)
        for code, g in enumerate(uniques):
            mask = codes == code
            out[mask] = np.searchsorted(table[g], vals[mask], side="right")
        return batch.append_column("bucket", pa.array(out, type=pa.int64()))

    return ds.map_batches(bucketize, batch_format="pyarrow")
