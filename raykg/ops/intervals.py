"""Per-key interval algebra: union coverage (merged-island sweep).

`interval_union` answers "how much time does each key actually have
covered, counting overlaps once?" — the complement of
`queries/events.q_max_concurrent`'s peak-concurrency scan.  Semantics
match the standard islands-and-gaps formulation:

- intervals sort by (start, end) within a key;
- a new island starts when `start > running_max(end)` of all earlier
  intervals (touching intervals — start == previous end — MERGE);
- covered = sum over islands of (island_max_end - island_start).

Distribution: ONE hash exchange (`groupby(key).map_groups`) and a fully
vectorized per-group kernel (lexsort + cumulative max + boundary
subtraction — no per-interval Python loop).  Partitioning assumption:
one key's intervals fit in a worker (the usual per-user/session-key
cardinality shape); a hot key would need pre-merging per block with a
sorted-run combine, which `skyline`-style two-pass composition also
supports.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def union_stats(starts: np.ndarray, ends: np.ndarray):
    """(covered, n_islands) of the interval union; int64 in, exact out."""
    if len(starts) == 0:
        return 0, 0
    order = np.lexsort((ends, starts))
    s, e = starts[order], ends[order]
    cmax = np.maximum.accumulate(e)
    prev = np.empty_like(cmax)
    prev[0] = np.iinfo(np.int64).min
    prev[1:] = cmax[:-1]
    new = s > prev
    last = np.nonzero(np.append(new[1:], True))[0]
    lens = cmax[last] - s[new]
    return int(lens.sum()), int(new.sum())


def interval_union(ds, key: str, start_col: str, end_col: str):
    """Per-key union coverage of [start, end) int64 intervals.

    Returns one row per key: `covered` (summed island lengths, exact
    integer) and `n_islands` (merged interval count)."""

    def per_key(group: pa.Table) -> pa.Table:
        s = group[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = group[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        covered, n_islands = union_stats(s, e)
        return pa.table(
            {
                key: group[key][:1],
                "covered": pa.array([covered], type=pa.int64()),
                "n_islands": pa.array([n_islands], type=pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")
