"""Bounded-hop weighted shortest paths (level-synchronous Bellman-Ford).

``bounded_shortest_paths`` returns ``(node, cost)`` — the minimum total
edge weight over any path of at most ``max_hops`` edges from the seed
set (seeds at cost 0, each node once with its minimum).  Bounded-hop
semantics make the loop deterministic and give the textbook guarantee:
with ``max_hops >= |V| - 1`` and non-negative weights this is the full
single-source shortest path.

Two engines, pinned equal by test — the same broadcast-vs-sharded split
as `ops/bfs.py` / `ops/pagerank.py`:

- **broadcast** (default): the distance table lives as two sorted
  arrays (node ids, costs) shipped once per level via ``ray.put``;
  every edge batch relaxes with one vectorized ``searchsorted`` +
  per-batch ``groupby.min`` partial, so the per-level collect is
  bounded by distinct-destination partials, not edge count.  Only
  edges whose source improved last level are expanded (frontier
  masking).  Node-state-scale memory; edge table streamed
  ``max_hops`` times.
- **sharded**: distances stay a Dataset end-to-end.  Per level one
  bucketed hash join expands ``frontier ⋈ edges`` and one node-sharded
  exchange min-folds candidates into the running distance table —
  2 exchanges/level, the >10M-node fallback.

The reference plugin has no graph traversal; this extends the KG layer
alongside `ops/bfs.py` / `ops/triangles.py` / `ops/neighbors.py`.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply


def _directed_view(edges, src, dst, weight, directed):
    def both(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"s": batch[src], "d": batch[dst], "w": batch[weight]})
        if directed:
            return fwd
        rev = pa.table({"s": batch[dst], "d": batch[src], "w": batch[weight]})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    return edges.select_columns([src, dst, weight]).map_batches(
        both, batch_format="pyarrow"
    )


def _paths_broadcast(e, seeds: np.ndarray, max_hops: int):
    nodes = np.sort(seeds)
    costs = np.zeros(len(nodes), dtype=np.float64)
    frontier = nodes  # nodes whose cost improved last level
    for _ in range(max_hops):
        if not len(frontier):
            break
        ref = ray.put((nodes, costs, np.sort(frontier)))

        def relax(df: pd.DataFrame) -> pd.DataFrame:
            ns, cs, fr = ray.get(ref)
            s = df["s"].to_numpy()
            pos = np.minimum(np.searchsorted(fr, s), len(fr) - 1)
            mask = fr[pos] == s
            if not mask.any():
                return pd.DataFrame(
                    {"d": pd.Series([], dtype=df["d"].dtype),
                     "cost": pd.Series([], dtype=np.float64)}
                )
            sub = df[mask]
            sp = np.searchsorted(ns, sub["s"].to_numpy())
            cand = pd.DataFrame(
                {"d": sub["d"].to_numpy(),
                 "cost": cs[sp] + sub["w"].to_numpy().astype(np.float64)}
            )
            return cand.groupby("d", sort=False, as_index=False)["cost"].min()

        tabs = [
            t
            for t in ray.get(
                list(
                    e.map_batches(relax, batch_format="pandas")
                    .materialize()
                    .to_arrow_refs()
                )
            )
            if t.num_rows
        ]
        if not tabs:
            break
        cand = pa.concat_tables(tabs)
        cd = cand["d"].to_numpy(zero_copy_only=False)
        cc = cand["cost"].to_numpy(zero_copy_only=False)
        order = np.argsort(cd, kind="stable")
        cd, cc = cd[order], cc[order]
        uniq, starts = np.unique(cd, return_index=True)
        best = np.minimum.reduceat(cc, starts)

        pos = np.searchsorted(nodes, uniq)
        known = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == uniq)
        improved_known = known & (best < np.where(known, costs[np.minimum(pos, len(nodes) - 1)], np.inf))
        new_mask = ~known
        if improved_known.any():
            costs[pos[improved_known]] = best[improved_known]
        if new_mask.any():
            nodes = np.concatenate([nodes, uniq[new_mask]])
            costs = np.concatenate([costs, best[new_mask]])
            order = np.argsort(nodes, kind="stable")
            nodes, costs = nodes[order], costs[order]
        frontier = np.concatenate([uniq[improved_known], uniq[new_mask]])
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "cost": pa.array(costs, type=pa.float64())})
    )


def _paths_sharded(e, seeds: np.ndarray, max_hops: int, num_shards: int):
    from .join import bucketed_hash_join

    dist = ray.data.from_arrow(
        pa.table(
            {"node": pa.array(seeds),
             "cost": pa.array(np.zeros(len(seeds), dtype=np.float64))}
        )
    ).materialize()
    frontier = dist
    for _ in range(max_hops):
        renamed = e.map_batches(
            lambda b: b.rename_columns(["node", "d", "w"]), batch_format="pyarrow"
        )
        cand = bucketed_hash_join(renamed, frontier, on="node", num_buckets=num_shards)

        def as_cand(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"node": df["d"].to_numpy(),
                 "cost": df["w"].to_numpy().astype(np.float64)
                 + df["cost"].to_numpy()}
            )
            return out.groupby("node", sort=False, as_index=False)["cost"].min()

        cand = cand.map_batches(as_cand, batch_format="pandas")

        def min_fold(df: pd.DataFrame) -> pd.DataFrame:
            # old distances carry old=1/old_cost; candidates old=0/inf —
            # one grouped pass yields the new minimum AND the improved flag
            g = df.groupby("node", sort=False, as_index=False).agg(
                cost=("cost", "min"), had_old=("old", "max"),
                old_cost=("old_cost", "min"),
            )
            g["improved"] = (g["had_old"] == 0) | (g["cost"] < g["old_cost"])
            return g[["node", "cost", "improved"]]

        def tag_old(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {"node": batch["node"], "cost": batch["cost"],
                 "old": pa.array(np.ones(n, dtype=np.int64)),
                 "old_cost": batch["cost"]}
            )

        def tag_new(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["old"] = np.int64(0)
            df["old_cost"] = np.float64(np.inf)
            return df

        merged = sharded_groupby_apply(
            dist.map_batches(tag_old, batch_format="pyarrow").union(
                cand.map_batches(tag_new, batch_format="pandas")
            ),
            ["node"],
            min_fold,
            num_shards,
        ).materialize()

        def only_improved(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["improved"]][["node", "cost"]]

        frontier = merged.map_batches(
            only_improved, batch_format="pandas"
        ).materialize()
        dist = merged.map_batches(
            lambda df: df[["node", "cost"]], batch_format="pandas"
        ).materialize()
        if not frontier.count():
            break
    return dist


def bounded_shortest_paths(
    edges: "ray.data.Dataset",
    seeds: Sequence,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_hops: int = 3,
    directed: bool = False,
    engine: str = "broadcast",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """``(node, cost)`` = min total weight over paths of <= ``max_hops``
    edges from any seed (non-negative weights assumed, as in Dijkstra)."""
    e = _directed_view(edges, src, dst, weight, directed).materialize()
    seed_arr = np.unique(np.asarray(list(seeds)))
    if engine == "broadcast":
        return _paths_broadcast(e, seed_arr, max_hops)
    if engine == "sharded":
        return _paths_sharded(e, seed_arr, max_hops, num_shards)
    raise ValueError(f"unknown engine: {engine}")
