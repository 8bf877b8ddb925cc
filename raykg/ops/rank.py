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


@ray.remote
def _block_key_edges(block, key_cols: list, sort_cols: list):
    """(n, null_count, first_sort_tuple, last_sort_tuple, head_run_len,
    tail_run_len) where head/tail runs are by KEY columns only — the
    per-PARTITION analogue of :func:`_block_edges`."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    if t.num_rows == 0:
        return 0, 0, None, None, 0, 0
    nulls = sum(t[c].null_count for c in sort_cols)
    if nulls:
        return t.num_rows, nulls, None, None, 0, 0
    n = t.num_rows
    first = tuple(t[c][0].as_py() for c in sort_cols)
    last = tuple(t[c][n - 1].as_py() for c in sort_cols)
    kv = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
    same_first = np.ones(n, dtype=bool)
    same_last = np.ones(n, dtype=bool)
    for v in kv:
        same_first &= v == v[0]
        same_last &= v == v[-1]
    brk = np.flatnonzero(~same_first)
    head = int(brk[0]) if len(brk) else n
    brk = np.flatnonzero(~same_last[::-1])
    tail = int(brk[0]) if len(brk) else n
    return n, 0, first, last, head, tail


@ray.remote
def _block_keyed_ranks(block, key_cols: list, specs: list, edge_info: dict):
    """Append rank columns per-key within one sorted block.

    ``edge_info`` maps a key tuple (only the ≤2 keys touching this
    block's edges can appear) to ``(rn_offset, n_total)`` — the number
    of that key's rows in earlier blocks and its corpus-wide count."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    n = t.num_rows
    kv = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
    change = np.zeros(max(n - 1, 0), dtype=bool)
    for v in kv:
        change |= v[1:] != v[:-1]
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    lens = ends - starts
    # 1-based row number within the key, then per-run offset/total fixes
    rn = np.arange(1, n + 1, dtype=np.int64) - np.repeat(starts, lens)
    n_of = np.repeat(lens, lens).astype(np.int64)
    for run_idx in {0, len(starts) - 1}:  # only edge runs can span blocks
        key = tuple(v[starts[run_idx]].item() if hasattr(v[starts[run_idx]], "item")
                    else v[starts[run_idx]] for v in kv)
        if key in edge_info:
            off, total = edge_info[key]
            sl = slice(starts[run_idx], ends[run_idx])
            rn[sl] += off
            n_of[sl] = total
    for kind, out, param in specs:
        if kind == "row_number":
            t = t.append_column(out, pa.array(rn, type=pa.int64()))
        elif kind == "percent_rank":
            pr = np.where(n_of > 1, (rn - 1) / np.maximum(n_of - 1, 1), 0.0)
            t = t.append_column(out, pa.array(pr, type=pa.float64()))
        elif kind == "ntile":
            k = int(param)
            q, r = n_of // k, n_of % k
            big = (q + 1) * r  # rows covered by the larger buckets
            tile = np.where(
                rn <= big,
                (rn + q) // (q + 1),
                np.where(q > 0, r + (rn - big + q - 1) // np.maximum(q, 1), r),
            ).astype(np.int64)
            t = t.append_column(out, pa.array(tile, type=pa.int64()))
        else:
            raise ValueError(f"with_keyed_ranks: unknown kind {kind!r}")
    return t


def with_keyed_ranks(
    ds: "ray.data.Dataset",
    keys: list,
    order_by: list,
    specs: list,
) -> "ray.data.Dataset":
    """SQL rank windows ``OVER (PARTITION BY keys ORDER BY order_by)``
    with ONE range-partitioned sort as the only exchange — the keyed
    generalization of :func:`with_avg_ranks`.

    ``specs`` is ``[(kind, out_column, param)]`` with kind in
    ``row_number`` / ``percent_rank`` / ``ntile`` (param = k).  The plan
    sorts on ``(*keys, *order_by)``, derives each key's global row count
    and per-block offsets from O(num_blocks) edge metadata on the driver
    (a key spans blocks only at block edges, so ≤2 merge entries per
    block), then one raw Ray task per block assigns ranks locally.
    Unlike ``sharded_groupby_apply``-based windows, NO worker ever holds
    one key's full row set — a single giant key (one language at 100 TB)
    range-partitions across blocks like any other data.  Determinism
    contract: ``order_by`` must be a total order within each key.  Null
    sort keys fail loudly."""
    sort_cols = list(keys) + list(order_by)
    try:
        m = ds.sort(sort_cols).materialize()
    except Exception as err:
        raise ValueError(
            f"with_keyed_ranks: sort on {sort_cols!r} failed — a null or "
            "mixed-type sort column is the usual cause"
        ) from err
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    if not refs:
        return m
    infos = ray.get(
        [_block_key_edges.remote(r, list(keys), sort_cols) for r in refs]
    )
    if any(nulls for _n, nulls, *_ in infos):
        raise ValueError(
            f"with_keyed_ranks: a sort column of {sort_cols!r} contains "
            "nulls; filter or fill the column first"
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
    nk = len(keys)
    # per-block (key, count) edge segments in global order; merge runs of
    # the same key that continue across block boundaries
    segs = []  # [key_tuple, block_idx, count]
    for i, (first, last, n, head, tail, _r) in enumerate(keyed):
        fk, lk = first[:nk], last[:nk]
        if fk == lk:  # whole block one key
            segs.append([fk, i, n])
        else:
            segs.append([fk, i, head])
            segs.append([lk, i, tail])
    merged = []  # [key, [(block_idx, count), ...]]
    for key, bi, cnt in segs:
        if merged and merged[-1][0] == key:
            merged[-1][1].append((bi, cnt))
        else:
            merged.append([key, [(bi, cnt)]])
    # ship per-block {key: (rn_offset, n_total)} for spanning keys only
    per_block: dict = {i: {} for i in range(len(keyed))}
    for key, parts in merged:
        if len(parts) == 1:
            continue  # fully inside one block: local math is exact
        total = sum(c for _bi, c in parts)
        off = 0
        for bi, cnt in parts:
            per_block[bi][key] = (off, total)
            off += cnt
    spec3 = [(k, out, p) for k, _src, out, p in specs] if specs and len(
        specs[0]
    ) == 4 else list(specs)
    out_refs = [
        _block_keyed_ranks.remote(r, list(keys), spec3, per_block[i])
        for i, (_f, _l, _n, _h, _t, r) in enumerate(keyed)
    ]
    return ray.data.from_arrow_refs(out_refs)


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
