"""Level-synchronous BFS: minimum hop count from a seed set.

``khop_min_hops`` returns ``(node, hops)`` for every node reachable
within ``max_hops`` edges of any seed (seeds themselves at hops=0; each
node appears once with its MINIMUM hop count).

Two engines, pinned equal by test — the same tradeoff as
`ops/pagerank.py`'s broadcast vs sharded split:

- **broadcast** (default): per level, the frontier ships once via
  ``ray.put`` as a sorted id array; every edge batch marks members
  with one vectorized ``searchsorted`` and returns its DISTINCT new
  endpoints (per-batch dedup bounds the collect).  Visited state lives
  as one id array — node-state-scale, not corpus-scale.  Right
  whenever ``|V|`` fits one heap (the same regime where PageRank's
  broadcast engine wins); the edge table itself is only ever streamed,
  ``max_hops`` passes total.
- **sharded**: frontier and visited stay Datasets end-to-end.  Per
  level one bucketed hash join expands ``frontier ⋈ edges`` and one
  node-sharded exchange drops already-visited nodes and min-reduces
  duplicates.  2 exchanges/level — the >10M-node fallback where no
  single array may hold the node set.

The reference plugin has no graph traversal; this extends the KG layer
alongside `ops/pagerank.py` / `ops/components.py` / `ops/triangles.py`.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply


def _directed_view(edges, src, dst, directed):
    def both(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"s": batch[src], "d": batch[dst]})
        if directed:
            return fwd
        rev = pa.table({"s": batch[dst], "d": batch[src]})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    return edges.select_columns([src, dst]).map_batches(both, batch_format="pyarrow")


def _khop_broadcast(e, seeds: np.ndarray, max_hops: int) -> "ray.data.Dataset":
    visited = np.sort(seeds)
    hops = np.zeros(len(visited), dtype=np.int64)
    frontier = visited
    for level in range(1, max_hops + 1):
        if not len(frontier):
            break
        ref = ray.put(np.sort(frontier))

        def expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(fr, s), len(fr) - 1)
            mask = fr[pos] == s
            d = batch["d"].to_numpy(zero_copy_only=False)[mask]
            return pa.table({"d": np.unique(d)})

        tabs = [
            t
            for t in ray.get(
                list(e.map_batches(expand, batch_format="pyarrow")
                     .materialize().to_arrow_refs())
            )
            if t.num_rows
        ]
        if not tabs:
            break
        cand = np.unique(
            pa.concat_tables(tabs)["d"].to_numpy(zero_copy_only=False)
        )
        new = np.setdiff1d(cand, visited, assume_unique=False)
        if not len(new):
            break
        visited = np.concatenate([visited, new])
        hops = np.concatenate([hops, np.full(len(new), level, dtype=np.int64)])
        frontier = new
    return ray.data.from_arrow(
        pa.table({"node": pa.array(visited), "hops": pa.array(hops, type=pa.int64())})
    )


def _khop_sharded(e, seeds: np.ndarray, max_hops: int, num_shards: int):
    visited = ray.data.from_arrow(
        pa.table(
            {"node": pa.array(seeds), "hops": pa.array(np.zeros(len(seeds), dtype=np.int64))}
        )
    )
    frontier = visited
    from .join import bucketed_hash_join

    for level in range(1, max_hops + 1):
        fr = frontier.select_columns(["node"])
        renamed = e.map_batches(
            lambda b: b.rename_columns(["node", "d"]), batch_format="pyarrow"
        )
        cand = bucketed_hash_join(renamed, fr, on="node", num_buckets=num_shards)

        def as_nodes(batch: pa.Table, lvl=level) -> pa.Table:
            t = pa.table({"node": batch["d"]})
            t = t.group_by(["node"]).aggregate([])
            return t.append_column(
                "hops", pa.array(np.full(t.num_rows, lvl, dtype=np.int64))
            )

        cand = cand.map_batches(as_nodes, batch_format="pyarrow")

        def min_unvisited(df: pd.DataFrame, lvl=level) -> pd.DataFrame:
            g = df.groupby("node", sort=False, as_index=False)["hops"].min()
            return g[g["hops"] == lvl]

        new = sharded_groupby_apply(
            visited.union(cand), ["node"], min_unvisited, num_shards
        ).materialize()
        if not new.count():
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


def khop_min_hops(
    edges: "ray.data.Dataset",
    seeds: Sequence,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    directed: bool = False,
    engine: str = "broadcast",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Minimum-hops table ``(node, hops)`` within ``max_hops`` of any seed."""
    e = _directed_view(edges, src, dst, directed).materialize()
    seed_arr = np.unique(np.asarray(list(seeds)))
    if engine == "broadcast":
        return _khop_broadcast(e, seed_arr, max_hops)
    if engine == "sharded":
        return _khop_sharded(e, seed_arr, max_hops, num_shards)
    raise ValueError(f"unknown engine: {engine}")


def _multi_broadcast(e, seeds: np.ndarray, max_hops: int) -> "ray.data.Dataset":
    # per-seed (sorted visited array, hops array); k is landmark-sized by
    # contract, so k searchsorted passes per batch is the whole cost
    visited = {int(s): np.array([s], dtype=np.int64) for s in seeds}
    hops = {int(s): np.zeros(1, dtype=np.int64) for s in seeds}
    frontier = {int(s): np.array([s], dtype=np.int64) for s in seeds}
    for level in range(1, max_hops + 1):
        live = {s: np.sort(f) for s, f in frontier.items() if len(f)}
        if not live:
            break
        ref = ray.put(live)

        def expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(ref)
            s_col = batch["s"].to_numpy(zero_copy_only=False)
            d_col = batch["d"].to_numpy(zero_copy_only=False)
            seeds_out, nodes_out = [], []
            for sd, f in fr.items():
                pos = np.minimum(np.searchsorted(f, s_col), len(f) - 1)
                mask = f[pos] == s_col
                if mask.any():
                    d = np.unique(d_col[mask])
                    seeds_out.append(np.full(len(d), sd, dtype=np.int64))
                    nodes_out.append(d)
            if not seeds_out:
                return pa.table(
                    {"seed": pa.array([], type=pa.int64()),
                     "d": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"seed": np.concatenate(seeds_out), "d": np.concatenate(nodes_out)}
            )

        tabs = [
            t
            for t in ray.get(
                list(e.map_batches(expand, batch_format="pyarrow")
                     .materialize().to_arrow_refs())
            )
            if t.num_rows
        ]
        frontier = {}
        if not tabs:
            break
        cand = pa.concat_tables(tabs)
        cs = cand["seed"].to_numpy(zero_copy_only=False)
        cd = cand["d"].to_numpy(zero_copy_only=False)
        for sd in live:
            new = np.setdiff1d(cd[cs == sd], visited[sd], assume_unique=False)
            if len(new):
                visited[sd] = np.concatenate([visited[sd], new])
                hops[sd] = np.concatenate(
                    [hops[sd], np.full(len(new), level, dtype=np.int64)]
                )
                frontier[sd] = new
    out_seed = np.concatenate(
        [np.full(len(visited[s]), s, dtype=np.int64) for s in visited]
    )
    out_node = np.concatenate([visited[s] for s in visited])
    out_hops = np.concatenate([hops[s] for s in visited])
    return ray.data.from_arrow(
        pa.table(
            {"seed": pa.array(out_seed), "node": pa.array(out_node),
             "hops": pa.array(out_hops, type=pa.int64())}
        )
    )


def _multi_sharded(e, seeds: np.ndarray, max_hops: int, num_shards: int):
    from .join import bucketed_hash_join

    visited = ray.data.from_arrow(
        pa.table(
            {"seed": pa.array(seeds, type=pa.int64()),
             "node": pa.array(seeds, type=pa.int64()),
             "hops": pa.array(np.zeros(len(seeds), dtype=np.int64))}
        )
    )
    frontier = visited
    for level in range(1, max_hops + 1):
        fr = frontier.select_columns(["seed", "node"])
        renamed = e.map_batches(
            lambda b: b.rename_columns(["node", "d"]), batch_format="pyarrow"
        )
        cand = bucketed_hash_join(renamed, fr, on="node", num_buckets=num_shards)

        def as_pairs(batch: pa.Table, lvl=level) -> pa.Table:
            t = pa.table({"seed": batch["seed"], "node": batch["d"]})
            t = t.group_by(["seed", "node"]).aggregate([])
            return t.append_column(
                "hops", pa.array(np.full(t.num_rows, lvl, dtype=np.int64))
            )

        cand = cand.map_batches(as_pairs, batch_format="pyarrow")

        def min_unvisited(df: pd.DataFrame, lvl=level) -> pd.DataFrame:
            g = df.groupby(["seed", "node"], sort=False, as_index=False)["hops"].min()
            return g[g["hops"] == lvl]

        new = sharded_groupby_apply(
            visited.union(cand), ["seed", "node"], min_unvisited, num_shards
        ).materialize()
        if not new.count():
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


def multi_source_hops(
    edges: "ray.data.Dataset",
    seeds: Sequence,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    directed: bool = False,
    engine: str = "broadcast",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Per-SEED minimum-hops table ``(seed, node, hops)`` — level-
    synchronous BFS that tracks which source reached each node, the
    landmark-distance primitive behind closeness/harmonic-centrality
    estimation and distance-labeling features.

    ``khop_min_hops`` folds the seed set into one frontier (min over ANY
    seed); this keeps k independent distance fields in one edge-table
    pass per level.  ``seeds`` is landmark-sized by contract (a sampled
    handful, k <= ~64): the broadcast engine ships {seed: sorted
    frontier} once per level and pays k vectorized searchsorted per edge
    batch; the sharded engine keys the visited/frontier state on
    ``(seed, node)`` — node-state times k, never corpus-scale — with the
    same 2-exchanges-per-level shape as ``_khop_sharded``.  Engines
    pinned equal by test."""
    e = _directed_view(edges, src, dst, directed).materialize()
    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if engine == "broadcast":
        return _multi_broadcast(e, seed_arr, max_hops)
    if engine == "sharded":
        return _multi_sharded(e, seed_arr, max_hops, num_shards)
    raise ValueError(f"unknown engine: {engine}")
