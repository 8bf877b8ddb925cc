"""Concept co-mention edges: tags co-occurring in the same turn.

The KG layer's concept-concept edge builder (reference has no
equivalent; `pipeline/graph.py` builds only structural + tagged_as
edges).  ``n_turns`` counts turns where BOTH tags are mentioned at
least once — in-turn repeats don't inflate the weight.

Scale shape — two mention-scale exchanges, never text:

1. **Pair emission** — per-batch distinct ``(conv, turn, tag)`` rows
   (mention-scale, three small columns) exchange sharded by turn key so
   every turn's tag set co-locates even when an upstream batch split a
   turn; inside the shard a vectorized pass emits sorted tag pairs per
   turn and PRE-COUNTS them per shard.
2. **Count reduce** — per-shard partial counts (≤ pairs × shards rows)
   sum in a pair-sharded exchange.
"""
from __future__ import annotations

from itertools import combinations
from typing import List

import pandas as pd
import pyarrow as pa
import ray.data

from .agg import sharded_groupby_apply


def co_mention_edges(
    mentions: "ray.data.Dataset",
    conv_column: str = "conv_id",
    turn_column: str = "turn_idx",
    tag_column: str = "tag",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """``(tag_a, tag_b, n_turns)`` with ``tag_a < tag_b``, one count per
    turn mentioning both."""

    def distinct_triples(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "conv": batch[conv_column],
                "turn": batch[turn_column],
                "tag": batch[tag_column],
            }
        )
        return t.group_by(["conv", "turn", "tag"]).aggregate([])

    def pairs_in_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["conv", "turn", "tag"])
        a_out: List[str] = []
        b_out: List[str] = []
        for _, tags in df.groupby(["conv", "turn"], sort=False)["tag"]:
            uniq = sorted(tags)
            if len(uniq) > 1:
                for a, b in combinations(uniq, 2):
                    a_out.append(a)
                    b_out.append(b)
        part = pd.DataFrame({"tag_a": a_out, "tag_b": b_out})
        return (
            part.groupby(["tag_a", "tag_b"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    partials = sharded_groupby_apply(
        mentions.map_batches(distinct_triples, batch_format="pyarrow"),
        ["conv", "turn"],
        pairs_in_shard,
        num_shards=num_shards,
    )

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["tag_a", "tag_b"], sort=False, as_index=False)["n"].sum()
        return g.rename(columns={"n": "n_turns"})

    return sharded_groupby_apply(
        partials, ["tag_a", "tag_b"], sum_pairs, num_shards=num_shards
    )
