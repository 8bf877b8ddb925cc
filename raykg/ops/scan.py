"""Global ordered prefix scan — running aggregates over a TOTAL order.

SQL ``SUM(x) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)``: the
per-key windowed form lives in `ops/window.py` (rows of one key fit one
shard); THIS is the keyless global form, where every row's result
depends on every earlier row of the whole table, so no per-shard kernel
can finish the job.  It powers running balances, interval-concurrency
sweeps (max simultaneous sessions), and global quota cutoffs ("take
documents until the token budget is spent").

Scale shape — the classic two-phase block scan (Blelloch 1990):

1. ``ds.sort(keys)`` — ONE range exchange; Ray's sort leaves the
   materialized blocks range-partitioned in global key order;
2. one tiny task per block returns (first-row key, int64 partial sum)
   (O(num_blocks) scalars, never rows, return to the driver);
3. the driver ranks the blocks BY THEIR OWN first keys (bundle
   iteration order is not a contract — it was observed to vary under
   load) and computes the exclusive cumsum — O(num_blocks) work;
4. one task per block adds its offset to the block-local ``cumsum``.

Like `ops/index.zip_with_index` this is the repo's documented
raw-``ray.remote`` exception: the Dataset API cannot express "my
block's rank in the global order".  Blocks stay in the object store as
Arrow throughout; only the int64 partials cross the driver.

Determinism contract: ``value`` must be an integer column (int64 sums
are exact and associative; float running sums would depend on block
boundaries) and ``sort_keys`` must be a total order (unique key tuples)
for per-row oracle parity — with ties, rows of one tie group may swap
run positions, which is fine only for order-insensitive consumers
(e.g. MAX over the run, the concurrency sweep).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _block_sum(block, value_col: str, sort_keys):
    """(first-row sort-key tuple, block sum) — the key tuple, not bundle
    iteration order, ranks the block: Ray's sort leaves blocks range-
    partitioned, so first keys order blocks totally, and the executor's
    bundle-yield order (observed to vary under load) stops mattering."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    # Sort can emit empty blocks with an EMPTY (zero-column) schema at
    # larger block counts — treat any block without the column as empty.
    if t.num_rows == 0 or value_col not in t.column_names:
        return None, 0
    v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    first = tuple(t[k][0].as_py() for k in sort_keys)
    return first, int(v.sum())


@ray.remote
def _with_running(block, offset: int, value_col: str, out_col: str):
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    run = np.cumsum(v, dtype=np.int64) + np.int64(offset)
    return t.append_column(out_col, pa.array(run, type=pa.int64()))


def prefix_sum(
    ds: "ray.data.Dataset",
    value_column: str,
    sort_keys: Sequence[str],
    out_column: str = "run_total",
) -> "ray.data.Dataset":
    """Append ``out_column`` = running int64 sum of ``value_column`` in
    global ``sort_keys`` order (inclusive scan: row i gets the sum of
    rows 0..i)."""
    sort_keys = list(sort_keys)
    m = ds.sort(sort_keys).materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    if not refs:
        return m
    partials = ray.get(
        [_block_sum.remote(r, value_column, sort_keys) for r in refs]
    )
    nonempty = [
        (first, s, r) for (first, s), r in zip(partials, refs)
        if first is not None
    ]
    if not nonempty:
        return m
    nonempty.sort(key=lambda t: t[0])  # rank blocks by their own keys
    sums = np.array([s for _f, s, _r in nonempty], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums[:-1], dtype=np.int64)])
    out = [
        _with_running.remote(r, int(o), value_column, out_column)
        for (_f, _s, r), o in zip(nonempty, offsets)
    ]
    return ray.data.from_arrow_refs(out)
