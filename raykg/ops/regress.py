"""Per-group simple linear regression (OLS y on x) from moment partials.

    slope = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²)
    intercept = (Σy − slope·Σx) / n
    r² = (nΣxy − ΣxΣy)² / ((nΣxx − (Σx)²)(nΣyy − (Σy)²))

All six moments are additive, so the op is one pass of per-batch grouped
partials (vectorized pandas groupby over the batch; group count is
bounded — the operator's contract, like every grouped aggregate that
folds on the driver) and a tiny driver combine.  No exchange at all.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def linreg_by(ds, keys: Sequence[str], x: str, y: str):
    """One row per key group: {**keys, n, slope, intercept, r2} (6
    digits), over non-null (x, y) pairs."""
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([*keys, x, y]).drop_null().to_pandas()
        xv = df[x].to_numpy(dtype=np.float64)
        yv = df[y].to_numpy(dtype=np.float64)
        df = df.assign(
            __xx=xv * xv, __yy=yv * yv, __xy=xv * yv,
            __x=xv, __y=yv, __n=1.0,
        )
        g = df.groupby(keys, sort=False)[
            ["__n", "__x", "__y", "__xx", "__yy", "__xy"]
        ].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ds.select_columns([*keys, x, y]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    t = parts.groupby(keys).sum()
    n = t["__n"].to_numpy()
    sx, sy = t["__x"].to_numpy(), t["__y"].to_numpy()
    sxx, syy, sxy = t["__xx"].to_numpy(), t["__yy"].to_numpy(), t["__xy"].to_numpy()
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = num / denx
        intercept = (sy - slope * sx) / n
        r2 = num * num / (denx * deny)
    out = t.reset_index()[keys]
    out["n"] = n.astype(np.int64)
    out["slope"] = np.round(slope, 6)
    out["intercept"] = np.round(intercept, 6)
    out["r2"] = np.round(r2, 6)
    return pa.Table.from_pandas(out, preserve_index=False)
