"""Weisfeiler-Lehman label refinement (1-WL color refinement).

The classic graph-canonicalization primitive (Weisfeiler & Lehman 1968;
Shervashidze et al. 2011 for the kernel form): every node starts with a
constant label and each round replaces it with a hash of (own label,
SORTED list of in-neighbor labels).  After k rounds two nodes share a
color only if their k-hop neighborhood trees are isomorphic — the
signature KG pipelines use for structural entity canonicalization,
near-isomorphic subgraph grouping, and GNN expressiveness baselines.

Scale shape, per round:

1. attach the current label to each edge's src — map-side dict merge
   from a ``ray.put`` label table when ``|V| <= max_broadcast_nodes``
   (edges never shuffle), else a bucketed hash join (both sides large);
2. ONE node-sharded exchange folds the |E| contribution rows together
   with the |V| state rows: inside the shard a vectorized sort +
   groupby-join builds each node's sorted neighbor-label string and
   ``md5(prev || '|' || joined)`` becomes the new label.

The md5 is per NODE per round (not per edge): a Python-loop hash over
|V| strings, bounded by ``rounds`` — the same cost class as the repo's
md5-percentile samplers, and required verbatim for the SQL mirror
(``md5(prev || '|' || string_agg(lbl, ',' ORDER BY lbl))``).

Semantics notes: parallel edges are collapsed (1-WL over simple
graphs — the neighbor multiset counts each distinct neighbor once);
direction matters (labels flow src -> dst), so callers wanting the
undirected refinement symmetrize first (`ops/gnn.symmetrize`).  Labels
are full 32-hex md5 strings; round 0 is the constant ``'0'``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply
from .join import bucketed_hash_join
from .setops import distinct_rows


def _typed(ds: "ray.data.Dataset", cols) -> "ray.data.Dataset":
    def conv(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {c: pa.array(df[c], type=pa.string(), from_pandas=True) for c in cols}
        )

    return ds.map_batches(conv, batch_format="pandas")


def wl_refine(
    edges: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    rounds: int = 2,
    num_shards: int = 64,
    max_broadcast_nodes: int = 5_000_000,
) -> "ray.data.Dataset":
    """Refine for ``rounds`` iterations; returns ``(node, wl_color)``
    over every endpoint of the (deduplicated) edge list."""
    e = distinct_rows(
        edges.select_columns([src_column, dst_column]),
        [src_column, dst_column],
        num_shards=num_shards,
    )
    e = _typed(e, [src_column, dst_column]).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        batch[src_column].combine_chunks(),
                        batch[dst_column].combine_chunks(),
                    ]
                )
            }
        )

    nodes = distinct_rows(
        e.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        num_shards=num_shards,
    )
    labels = _typed(
        nodes.map_batches(
            lambda df: df.assign(lbl="0"), batch_format="pandas"
        ),
        ["node", "lbl"],
    ).materialize()
    n_nodes = labels.count()
    if n_nodes == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "node": pd.Series([], dtype=str),
                    "wl_color": pd.Series([], dtype=str),
                }
            )
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        s = df[df["kind"] == "s"]
        c = df[df["kind"] == "c"].sort_values(
            ["node", "lbl"], kind="stable"
        )
        agg = c.groupby("node", sort=False)["lbl"].agg(",".join)
        joined = s["node"].map(agg).fillna("")
        new = [
            hashlib.md5((p + "|" + a).encode("utf-8")).hexdigest()
            for p, a in zip(s["lbl"].to_numpy(), joined.to_numpy())
        ]
        return pd.DataFrame({"node": s["node"].to_numpy(), "lbl": new})

    for _ in range(rounds):
        if n_nodes <= max_broadcast_nodes:
            lab_pd = labels.to_pandas()
            ref = ray.put(lab_pd)

            def contrib(batch: pa.Table, ref=ref) -> pa.Table:
                st = ray.get(ref)  # plasma-cached per worker
                df = batch.select([src_column, dst_column]).to_pandas()
                m = df.merge(
                    st, left_on=src_column, right_on="node", how="left"
                )
                return pa.table(
                    {
                        "node": pa.array(
                            m[dst_column], type=pa.string(), from_pandas=True
                        ),
                        "lbl": pa.array(
                            m["lbl"], type=pa.string(), from_pandas=True
                        ),
                        "kind": pa.array(["c"] * len(m), type=pa.string()),
                    }
                )

            contribs = e.map_batches(contrib, batch_format="pyarrow")
        else:
            right = labels.map_batches(
                lambda b: pa.table({src_column: b["node"], "lbl": b["lbl"]}),
                batch_format="pyarrow",
            )
            joined = bucketed_hash_join(
                e, right, on=src_column, num_buckets=num_shards
            )
            contribs = joined.map_batches(
                lambda b: pa.table(
                    {
                        "node": b[dst_column],
                        "lbl": b["lbl"],
                        "kind": pa.array(
                            ["c"] * b.num_rows, type=pa.string()
                        ),
                    }
                ),
                batch_format="pyarrow",
            )

        tagged = labels.map_batches(
            lambda b: b.append_column(
                "kind", pa.array(["s"] * b.num_rows, type=pa.string())
            ),
            batch_format="pyarrow",
        )
        labels = _typed(
            sharded_groupby_apply(
                tagged.union(contribs), ["node"], fold, num_shards=num_shards
            ),
            ["node", "lbl"],
        ).materialize()

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "wl_color": b["lbl"]}),
        batch_format="pyarrow",
    )
