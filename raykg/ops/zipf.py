"""Zipf's-law fit over the corpus token frequency spectrum.

OLS of ln(frequency) on ln(rank) across the whole vocabulary — the
classical Zipf slope (~ -1 for natural language; a corpus-health /
synthetic-data tell).  Ranks are tie-AVERAGED over descending frequency
(every token of an equal-count group gets the group's mean position),
which a SQL mirror expresses exactly as gt + (ties+1)/2 from the
counts-of-counts table.

Distribution:
1. tokens explode per batch (compiled regex), per-batch pre-count, then
   ONE hash(token) exchange via ``ops/agg.sharded_groupby_apply`` —
   vocabulary-scale counting with O(shards) engine groups;
2. tie-averaged ranks of the NEGATED count via ``ops/rank
   .with_avg_ranks`` — one range-partitioned sort of the vocab table
   (ascending -f == descending f, identical tie means);
3. streaming per-batch moment partials over (ln rank, ln f), tiny
   driver combine — the spearman pattern.

Only O(1)-scale fit coefficients are emitted (6-digit rounded); raw
log-moment sums never leave the engine.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import sharded_groupby_apply
from .rank import with_avg_ranks

_TOK = re.compile(r"\S+")


def token_frequencies(ds, text_col: str = "text",
                      num_shards: int = 64):
    """Vocabulary table [tok, f] — exact corpus token counts."""
    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        cnt: dict = {}
        for t in texts:
            for w in _TOK.findall(t or ""):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table(
            {
                "tok": pa.array(list(cnt.keys()), type=pa.string()),
                "c": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("tok", sort=False)["c"].sum().reset_index()
        return out.rename(columns={"c": "f"})

    pre = ds.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    return sharded_groupby_apply(pre, ["tok"], combine,
                                 num_shards=num_shards)


def zipf_fit(ds, text_col: str = "text") -> pa.Table:
    """One row {n_tokens, slope, intercept}: ln f = slope·ln r + b fit
    over the tie-average-ranked frequency spectrum of `text_col`."""
    freqs = token_frequencies(ds, text_col)

    def neg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "__negf", pc.negate(pc.cast(batch["f"], pa.int64()))
        )

    ranked = with_avg_ranks(
        freqs.map_batches(neg, batch_format="pyarrow"), "__negf", "__r"
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = np.log(batch["__r"].to_numpy(zero_copy_only=False))
        y = np.log(batch["f"].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "sxy": pa.array([(x * y).sum()]),
            }
        )

    agg = ranked.map_batches(moments, batch_format="pyarrow").sum(
        ["n", "sx", "sy", "sxx", "sxy"]
    )
    n, sx, sy = agg["sum(n)"], agg["sum(sx)"], agg["sum(sy)"]
    sxx, sxy = agg["sum(sxx)"], agg["sum(sxy)"]
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den if den > 0 else float("nan")
    intercept = (sy - slope * sx) / n
    return pa.table(
        {
            "n_tokens": pa.array([int(n)], type=pa.int64()),
            "slope": pa.array([round(float(slope), 6)], type=pa.float64()),
            "intercept": pa.array(
                [round(float(intercept), 6)], type=pa.float64()
            ),
        }
    )
