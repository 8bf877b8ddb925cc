"""k-source, depth-truncated betweenness centrality (Brandes estimate).

Exact Brandes dependency accumulation (Brandes 2001) run from K
deterministic seed sources (smallest md5(node) — the repo's md5
sampling contract, reproducible in SQL), with BFS truncated at
``max_depth`` levels: the standard bounded-betweenness estimator for
corpora where full all-pairs Brandes (O(V·E)) is unpayable.

Engine shape — the ``ops/pagerank.py`` / ``ops/bfs.py`` BROADCAST
regime (node-scale driver state, edge table only ever streamed):

- forward: per level one streaming ``map_batches`` pass over the
  symmetrized edge table emits per-batch partial path-count
  contributions ((node, source) cells, pre-summed per batch); the
  driver folds them into dist/σ matrices (|V| × K ints) and ships the
  new state via ``ray.put``.  σ sums are exact integers below 2^53.
- backward: per level one streaming pass accumulates Brandes
  dependencies δ(v) = σ(v) · Σ_succ (1+δ(w))/σ(w) the same way —
  only the final δ is float, with one fixed evaluation tree shared
  with the SQL mirror.
- 2·max_depth edge passes total, NO all-to-all exchange anywhere.

At >10M nodes the |V|×K driver state outgrows one heap — the
documented fallback is the sharded-frontier engine of ``ops/bfs.py``
(frontier and state as Datasets, 2 exchanges/level), same split as
PageRank's broadcast/sharded pair.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .triangles import canonical_edges


def betweenness_ksources(
    edges: "ray.data.Dataset",
    u: str = "u",
    v: str = "v",
    k_sources: int = 8,
    max_depth: int = 4,
) -> pa.Table:
    """Table [node, bc] — Brandes dependency sums over BFS trees of the
    ``k_sources`` smallest-md5 nodes, truncated at ``max_depth``;
    endpoints excluded per the standard definition, rows with bc == 0
    dropped (structurally zero on both engines)."""
    canon = canonical_edges(edges, u, v, num_shards=32)

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": pa.concat_arrays(
                    [batch["u"].combine_chunks(),
                     batch["v"].combine_chunks()]
                ),
                "d": pa.concat_arrays(
                    [batch["v"].combine_chunks(),
                     batch["u"].combine_chunks()]
                ),
            }
        )

    adj = canon.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # node set: per-block distinct partials -> driver (node-scale state,
    # the broadcast regime's contract)
    def distinct_nodes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"n": pc.unique(batch["s"])})

    node_tabs = [
        t
        for t in ray.get(
            list(
                adj.map_batches(distinct_nodes, batch_format="pyarrow")
                .to_arrow_refs()
            )
        )
        if t.num_rows
    ]
    nodes = np.unique(
        pa.concat_tables(node_tabs)["n"].to_numpy(zero_copy_only=False)
    )
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], type=pa.string()),
                         "bc": pa.array([], type=pa.float64())})
    digests = np.array(
        [hashlib.md5(str(x).encode("utf-8")).hexdigest() for x in nodes]
    )
    order = np.lexsort((nodes, digests))
    src_idx = order[: min(k_sources, n)]
    k = len(src_idx)

    NEG = np.int64(-1)
    dist = np.full((n, k), NEG, dtype=np.int64)
    sig = np.zeros((n, k), dtype=np.float64)  # integer-valued, < 2^53
    dist[src_idx, np.arange(k)] = 0
    sig[src_idx, np.arange(k)] = 1.0

    def fold(parts, mat_update):
        for t in parts:
            if t.num_rows == 0 or "key" not in t.column_names:
                continue
            key = t["key"].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            mat_update(key // k, key % k, c)

    max_level = 0
    for lvl in range(max_depth):
        st = ray.put((nodes, dist, sig, lvl, k))

        def expand(batch: pa.Table) -> pa.Table:
            ns, dm, sm, level, kk = ray.get(st)
            si = np.searchsorted(ns, batch["s"].to_numpy(zero_copy_only=False))
            di = np.searchsorted(ns, batch["d"].to_numpy(zero_copy_only=False))
            m = (dm[si, :] == level) & (dm[di, :] < 0)
            rows, cols = np.nonzero(m)
            if not len(rows):
                return pa.table({"key": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.float64())})
            key = di[rows] * kk + cols
            uk, inv = np.unique(key, return_inverse=True)
            c = np.bincount(inv, weights=sm[si[rows], cols])
            return pa.table({"key": pa.array(uk, type=pa.int64()),
                             "c": pa.array(c, type=pa.float64())})

        parts = ray.get(
            list(
                adj.map_batches(expand, batch_format="pyarrow")
                .to_arrow_refs()
            )
        )
        new_sig = np.zeros_like(sig)

        def upd(r, c, w, _m=new_sig):
            np.add.at(_m, (r, c), w)

        fold(parts, upd)
        newly = (new_sig > 0) & (dist < 0)
        if not newly.any():
            break
        dist[newly] = lvl + 1
        sig[newly] = new_sig[newly]
        max_level = lvl + 1

    delta = np.zeros((n, k), dtype=np.float64)
    for lvl in range(max_level - 1, -1, -1):
        st = ray.put((nodes, dist, sig, delta, lvl, k))

        def back(batch: pa.Table) -> pa.Table:
            ns, dm, sm, dl, level, kk = ray.get(st)
            si = np.searchsorted(ns, batch["s"].to_numpy(zero_copy_only=False))
            di = np.searchsorted(ns, batch["d"].to_numpy(zero_copy_only=False))
            m = (dm[si, :] == level) & (dm[di, :] == level + 1)
            rows, cols = np.nonzero(m)
            if not len(rows):
                return pa.table({"key": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.float64())})
            w = (1.0 + dl[di[rows], cols]) / sm[di[rows], cols]
            key = si[rows] * kk + cols
            uk, inv = np.unique(key, return_inverse=True)
            c = np.bincount(inv, weights=w)
            return pa.table({"key": pa.array(uk, type=pa.int64()),
                             "c": pa.array(c, type=pa.float64())})

        parts = ray.get(
            list(adj.map_batches(back, batch_format="pyarrow").to_arrow_refs())
        )
        acc = np.zeros_like(delta)

        def upd(r, c, w, _m=acc):
            np.add.at(_m, (r, c), w)

        fold(parts, upd)
        lvl_mask = dist == lvl
        delta[lvl_mask] += (sig * acc)[lvl_mask]

    delta[src_idx, np.arange(k)] = 0.0  # endpoints excluded
    bc = delta.sum(axis=1)
    keep = bc > 0
    return pa.table(
        {
            "node": pa.array(nodes[keep].astype(str), type=pa.string()),
            "bc": pa.array(np.round(bc[keep], 6), type=pa.float64()),
        }
    )
