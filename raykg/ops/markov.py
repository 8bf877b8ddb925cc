"""First-order Markov transition counts over per-key ordered sequences.

For every key's time-ordered state sequence s_1..s_n, count the
transitions (s_i -> s_{i+1}) and report each row's share of its source
state's outgoing mass.  Probabilities are exact integer
parts-per-million (round-half-up via integer arithmetic) — no float
rounding path to disagree with a SQL mirror.

Distribution: one hash exchange via ``ops/agg.sharded_groupby_apply``
(all rows of a key share a shard), ONE vectorized lexsort + grouped
shift per shard, then per-shard (prev, next) count partials.  The final
combine is a groupby over the state-pair table, whose cardinality is
|states|^2 — bounded by the alphabet, NOT the corpus — so the driver-
side probability pass touches O(|states|^2) rows only.
"""
from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa


def transition_counts(ds, key: str, order: Sequence[str], state: str,
                      num_shards: int = 64) -> pa.Table:
    """Table [prev_state, next_state, c, total, p_ppm] of first-order
    transitions within each key group in `order`-sorted sequence."""
    from .agg import sharded_groupby_apply

    order = list(order)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key, *order], kind="stable")
        nxt = d.groupby(key, sort=False)[state].shift(-1)
        pairs = pd.DataFrame({"prev_state": d[state], "next_state": nxt})
        pairs = pairs[pairs["next_state"].notna()]
        out = (
            pairs.groupby(["prev_state", "next_state"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return out

    cols = list(dict.fromkeys([key, *order, state]))
    partials = sharded_groupby_apply(
        ds.select_columns(cols), [key], apply, num_shards=num_shards
    )
    # |states|^2 keys — bounded alphabet, Ray's groupby is fine here
    combined = partials.groupby(["prev_state", "next_state"]).sum("c")
    t = pa.Table.from_pandas(
        combined.to_pandas(), preserve_index=False
    )  # O(|states|^2) rows by construction
    df = t.to_pandas().rename(columns={"sum(c)": "c"})
    df["total"] = df.groupby("prev_state")["c"].transform("sum")
    df["p_ppm"] = (df["c"] * 2_000_000 + df["total"]) // (2 * df["total"])
    df = df.sort_values(["prev_state", "next_state"]).reset_index(drop=True)
    return pa.table(
        {
            "prev_state": pa.array(df["prev_state"], type=pa.string()),
            "next_state": pa.array(df["next_state"], type=pa.string()),
            "c": pa.array(df["c"], type=pa.int64()),
            "total": pa.array(df["total"], type=pa.int64()),
            "p_ppm": pa.array(df["p_ppm"], type=pa.int64()),
        }
    )
