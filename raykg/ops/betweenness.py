"""k-source, depth-truncated betweenness centrality (Brandes estimate).

Exact Brandes dependency accumulation (Brandes 2001) run from K
deterministic seed sources (smallest md5(node) — the repo's md5
sampling contract, reproducible in SQL), with BFS truncated at
``max_depth`` levels: the standard bounded-betweenness estimator for
corpora where full all-pairs Brandes (O(V·E)) is unpayable.

Engine shape — the ``ops/pagerank.py`` / ``ops/bfs.py`` BROADCAST
regime (node-scale driver state, edge table only ever streamed):

- the symmetrized edge table is materialized ONCE; every level is a
  raw-task pass over its block refs (the ``ops/rank.py`` documented
  raw-``ray.remote`` exception — re-wrapping each pass as a Dataset
  would re-run schema probes and churn the object store 2·depth times);
- forward: per level each block task emits pre-summed ((node, source)
  → path-count) cells; the driver folds them into dist/σ matrices
  (|V| × K) and re-broadcasts one state ref.  σ sums are exact
  integers below 2^53.
- backward: per level the same pass shape accumulates Brandes
  dependencies δ(v) = σ(v) · Σ_succ (1+δ(w))/σ(w) — only δ is float,
  with one fixed evaluation tree shared with the SQL mirror.
- 2·max_depth block passes total, NO all-to-all exchange anywhere.

At >10M nodes the |V|×K driver state outgrows one heap — the
documented fallback is the sharded-frontier engine of ``ops/bfs.py``
(frontier and state as Datasets, 2 exchanges/level), same split as
PageRank's broadcast/sharded pair.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .triangles import canonical_edges


def _as_table(block) -> pa.Table:
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_arrow()


@ray.remote
def _block_nodes(block):
    t = _as_table(block)
    if t.num_rows == 0 or "s" not in t.column_names:
        return np.array([], dtype=object)
    return np.unique(t["s"].to_numpy(zero_copy_only=False))


@ray.remote
def _block_pass(block, state, backward: bool):
    """One Brandes pass over one edge block: pre-summed (node·K + src)
    cells — σ contributions forward, (1+δ(w))/σ(w) terms backward."""
    t = _as_table(block)
    empty = pa.table({"key": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.float64())})
    if t.num_rows == 0 or "s" not in t.column_names:
        return empty
    ns, dm, sm, dl, level, k = state
    si = np.searchsorted(ns, t["s"].to_numpy(zero_copy_only=False))
    di = np.searchsorted(ns, t["d"].to_numpy(zero_copy_only=False))
    if backward:
        m = (dm[si, :] == level) & (dm[di, :] == level + 1)
    else:
        m = (dm[si, :] == level) & (dm[di, :] < 0)
    rows, cols = np.nonzero(m)
    if not len(rows):
        return empty
    if backward:
        w = (1.0 + dl[di[rows], cols]) / sm[di[rows], cols]
        key = si[rows] * k + cols
    else:
        w = sm[si[rows], cols]
        key = di[rows] * k + cols
    uk, inv = np.unique(key, return_inverse=True)
    c = np.bincount(inv, weights=w)
    return pa.table({"key": pa.array(uk, type=pa.int64()),
                     "c": pa.array(c, type=pa.float64())})


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
    refs = [
        ref
        for bundle in adj.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    if not refs:
        return pa.table({"node": pa.array([], type=pa.string()),
                         "bc": pa.array([], type=pa.float64())})

    parts = ray.get([_block_nodes.remote(r) for r in refs])
    parts = [p for p in parts if len(p)]
    if not parts:
        return pa.table({"node": pa.array([], type=pa.string()),
                         "bc": pa.array([], type=pa.float64())})
    nodes = np.unique(np.concatenate(parts))
    n = len(nodes)
    digests = np.array(
        [hashlib.md5(str(x).encode("utf-8")).hexdigest() for x in nodes]
    )
    order = np.lexsort((nodes, digests))
    src_idx = order[: min(k_sources, n)]
    k = len(src_idx)

    dist = np.full((n, k), np.int64(-1), dtype=np.int64)
    sig = np.zeros((n, k), dtype=np.float64)  # integer-valued, < 2^53
    dist[src_idx, np.arange(k)] = 0
    sig[src_idx, np.arange(k)] = 1.0
    delta = np.zeros((n, k), dtype=np.float64)

    def run_pass(level: int, backward: bool) -> np.ndarray:
        st = ray.put((nodes, dist, sig, delta, level, k))
        acc = np.zeros((n, k), dtype=np.float64)
        for t in ray.get(
            [_block_pass.remote(r, st, backward) for r in refs]
        ):
            if t.num_rows:
                key = t["key"].to_numpy(zero_copy_only=False)
                c = t["c"].to_numpy(zero_copy_only=False)
                np.add.at(acc, (key // k, key % k), c)
        return acc

    max_level = 0
    for lvl in range(max_depth):
        new_sig = run_pass(lvl, backward=False)
        newly = (new_sig > 0) & (dist < 0)
        if not newly.any():
            break
        dist[newly] = lvl + 1
        sig[newly] = new_sig[newly]
        max_level = lvl + 1

    for lvl in range(max_level - 1, -1, -1):
        acc = run_pass(lvl, backward=True)
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
