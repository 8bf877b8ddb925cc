"""Kaplan–Meier survival estimator over inter-event gaps.

    S(t) = Π_{t_i ≤ t, observed} (1 − d_i / n_i)

The subjects are EVENT OCCURRENCES: each event's duration is the gap to
the same user's next event (the classic "time to next purchase"
survival), right-censored at the user's last event (gap to the end of
the observed span).  Distribution:

1. ONE sharded hash exchange on the user key (all of a user's rows
   share a shard); inside the shard the gaps come from a vectorized
   lexsort + grouped ``shift`` — no per-user Python;
2. gaps quantize to integer hours (the estimator's documented
   resolution) and pre-aggregate to (duration, observed) counts in the
   shard, so the exchange output is bounded by the span, not the corpus;
3. the driver folds the bounded curve table and runs the product as
   ``exp(cumsum(log(1 − d/n)))`` in duration order — the SAME op
   sequence as the SQL window mirror (extinction guard −1e30 on both
   sides).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .agg import sharded_groupby_apply

_US_PER_HOUR = 3_600_000_000


def km_gap_curve(ds, subject: str, ts: str) -> pa.Table:
    """Kaplan–Meier curve rows {duration_h, n_risk, deaths, survival}
    over per-`subject` inter-event gaps of timestamp[us] column `ts`,
    at observed (non-censored) durations only."""
    span = ds.select_columns([ts]).map_batches(
        lambda t: pa.table(
            {"mx": pa.array([pc.max(t[ts]).cast(pa.int64()).as_py()])}
        ),
        batch_format="pyarrow",
    )
    mx = int(span.aggregate(ray.data.aggregate.Max("mx"))["max(mx)"])

    def gap_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([subject, ts], kind="stable")
        d = d.assign(__t=d[ts].astype("int64"))
        t = d["__t"].to_numpy()
        nxt = d.groupby(subject, sort=False)["__t"].shift(-1).to_numpy(
            dtype=np.float64
        )  # int shift -> float64 with NaN at each user's last row
        observed = ~np.isnan(nxt)
        gap = np.where(observed, nxt - t, mx - t).astype(np.int64)
        out = pd.DataFrame(
            {"duration_h": gap // _US_PER_HOUR, "observed": observed}
        )
        g = out.groupby(["duration_h", "observed"], sort=False).size()
        return g.rename("__c").reset_index()

    parts = sharded_groupby_apply(
        ds.select_columns([subject, ts]), [subject], gap_counts
    ).to_pandas()
    t = (
        parts.groupby(["duration_h", "observed"])["__c"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=[False, True], fill_value=0)
        .sort_index()
    )
    total = int(t.to_numpy().sum())
    exits = t.sum(axis=1).to_numpy()
    deaths = t[True].to_numpy(dtype=np.float64)
    n_risk = total - np.concatenate([[0], np.cumsum(exits[:-1])]).astype(
        np.float64
    )
    # extinction guard (everyone at risk dies): −1e30, exp -> 0.0 —
    # the SQL mirror uses the identical CASE branch
    with np.errstate(divide="ignore", invalid="ignore"):
        logterm = np.where(
            deaths >= n_risk,
            -1e30,
            np.log(1.0 - deaths / np.maximum(n_risk, 1.0)),
        )
    surv = np.exp(np.cumsum(logterm))
    keep = deaths > 0
    return pa.table(
        {
            "duration_h": pa.array(t.index.to_numpy()[keep], type=pa.int64()),
            "n_risk": pa.array(n_risk[keep].astype(np.int64), type=pa.int64()),
            "deaths": pa.array(deaths[keep].astype(np.int64), type=pa.int64()),
            "survival": pa.array(np.round(surv[keep], 6), type=pa.float64()),
        }
    )
