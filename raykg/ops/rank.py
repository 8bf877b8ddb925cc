"""Tie-averaged rank transform (``avgrank``) via rank-by-sort.

Appends a float64 column of SQL-style average ranks
(``RANK() + (tie_count - 1)/2`` — every member of a tie group gets the
mean of the positions the group occupies) to every row, with ONE
range-partitioned sort as the only exchange:

1. ``ds.sort(col)`` — Ray's sort leaves materialized blocks in global
   key order;
2. blocks are ranked by their own ``(first_key, last_key)`` tuples
   (first key alone can tie when a value spans blocks; the last key
   breaks it in the only order consistent with the range partitioning),
   a driver pass over O(num_blocks) metadata computes offsets;
3. one raw Ray task per block assigns tie-group ranks locally —
   ``avgrank = (p + q)/2 + 1`` for a run occupying 0-based positions
   ``p..q`` — with runs touching a block edge (they may continue into a
   neighbor) resolved by a tiny driver-merged ``{value: avgrank}`` map
   (≤ 2 entries per block) shipped back via ``ray.put``.

This replaces the distinct-count + prefix-scan + bucketed-join-back
plan (three exchanges, two of them over near-row-cardinality rank
tables for continuous columns) with a single sort; ``ops/spearman.py``
and ``ops/ranktest.py`` build on it.  Like ``zip_with_index`` this is a
documented raw-``ray.remote`` exception: no batch knows its block's
global rank.  Null sort keys fail loudly (a null has no rank).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _block_edges(block, col: str):
    """(n, nulls, first, last, head_run_len, tail_run_len) for ordering
    blocks and merging tie runs that span block boundaries."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    if t.num_rows == 0 or col not in t.column_names:
        return 0, 0, None, None, 0, 0
    c = t[col]
    if c.null_count:
        return t.num_rows, c.null_count, None, None, 0, 0
    v = c.to_numpy(zero_copy_only=False)
    head = int(np.searchsorted(v, v[0], side="right"))
    tail = int(len(v) - np.searchsorted(v, v[-1], side="left"))
    return t.num_rows, 0, v[0], v[-1], head, tail


@ray.remote
def _block_ranks(block, col: str, out: str, offset: int, edge_ranks):
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    v = t[col].to_numpy(zero_copy_only=False)
    n = len(v)
    starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1])
    ends = np.concatenate([starts[1:], [n]])  # exclusive
    # run occupying local p..q-1 -> global (offset+p .. offset+q-1)
    avg = (2.0 * offset + starts + ends - 1.0) / 2.0 + 1.0
    ranks = np.repeat(avg, ends - starts)
    # edge runs may continue into neighbor blocks: take the merged rank
    if v[0] in edge_ranks:
        ranks[: ends[0]] = edge_ranks[v[0]]
    if v[-1] in edge_ranks:
        ranks[starts[-1]:] = edge_ranks[v[-1]]
    return t.append_column(out, pa.array(ranks, type=pa.float64()))


def with_avg_ranks(
    ds: "ray.data.Dataset", col: str, out: str
) -> "ray.data.Dataset":
    """``ds`` with ``out`` = tie-averaged rank of ``col`` appended."""
    try:
        m = ds.sort(col).materialize()
    except Exception as err:
        raise ValueError(
            f"with_avg_ranks: sort on {col!r} failed — a null or "
            "mixed-type rank column is the usual cause"
        ) from err
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    if not refs:
        return m
    infos = ray.get([_block_edges.remote(r, col) for r in refs])
    if any(nulls for _n, nulls, *_ in infos):
        raise ValueError(
            f"with_avg_ranks: rank column {col!r} contains nulls; a null "
            "has no rank — filter or fill the column first"
        )
    keyed = sorted(
        (
            (first, last, n, head, tail, r)
            for (n, _nu, first, last, head, tail), r in zip(infos, refs)
            if n > 0
        ),
        key=lambda t: (t[0], t[1]),
    )
    if not keyed:
        return m
    counts = np.array([k[2] for k in keyed], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)])
    # merge edge runs across blocks: (value, global p, global q) segments
    segs = []  # consecutive-contiguous by construction
    for (first, last, n, head, tail, _r), o in zip(keyed, offsets):
        if first == last:  # whole block one value
            segs.append([first, int(o), int(o + n - 1)])
        else:
            segs.append([first, int(o), int(o + head - 1)])
            segs.append([last, int(o + n - tail), int(o + n - 1)])
    merged = []
    for val, p, q in segs:
        if merged and merged[-1][0] == val and merged[-1][2] + 1 == p:
            merged[-1][2] = q
        else:
            merged.append([val, p, q])
    edge_ranks = {val: (p + q) / 2.0 + 1.0 for val, p, q in merged}
    edge_ref = ray.put(edge_ranks)
    out_refs = [
        _block_ranks.remote(r, col, out, int(o), edge_ref)
        for (_f, _l, _n, _h, _t, r), o in zip(keyed, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)
