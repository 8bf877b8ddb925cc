"""Two-sample Kolmogorov-Smirnov test, integer-exact and distributed.

D = max_x |F_a(x) - F_b(x)| over the pooled sample is computed as an
INTEGER numerator: at every tie-run end of the pooled sorted values,
dev = |n_b * cum_a - n_a * cum_b|  (cum_* = rows of each group seen so
far, both whole tie groups included);  D = max(dev) / (n_a * n_b).
Keeping the numerator integral makes the statistic bit-exact against a
SQL window mirror — no float ECDF subtraction anywhere.

Distribution (the ``ops/rank.py`` rank-by-sort pattern, ONE exchange):

1. flag rows a/b in ``map_batches`` (others dropped), sort by value —
   Ray's range-partitioned sort leaves blocks in global key order;
2. a metadata pass over O(num_blocks) tasks returns per-block
   (rows, sum_a, sum_b, first, last) — the driver orders blocks by
   (first, last), prefix-sums the a/b counts, and notes each block's
   successor's first value;
3. one task per block evaluates dev at its LOCAL tie-run ends
   (vectorized cumsum + boundary mask; the final position only counts
   when the successor block starts a new value) and returns its max —
   the driver folds block maxima, breaking ties toward the smallest
   attaining value.

int64 bound: dev <= n_a * n_b, exact while n_a * n_b < 2^63 (~3e9 rows
per side); beyond that the numerator column must widen to float128 /
decimal — documented, not silently wrong, via an explicit guard.

Parity anchor: the classical statistic as in scipy.stats.ks_2samp
(public API), re-derived for tie-run evaluation points.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _block_meta(block, a: str, b: str, v: str):
    """(rows, sum_a, sum_b, first, last) — empty/zero-schema blocks
    (Ray's sort emits them at larger block counts) collapse to zeros."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    if t.num_rows == 0 or v not in t.column_names:
        return 0, 0, 0, None, None
    vals = t[v].to_numpy(zero_copy_only=False)
    return (
        t.num_rows,
        int(t[a].to_numpy(zero_copy_only=False).sum()),
        int(t[b].to_numpy(zero_copy_only=False).sum()),
        vals[0],
        vals[-1],
    )


@ray.remote
def _block_dev(block, a: str, b: str, v: str, pref_a: int, pref_b: int,
               n_a: int, n_b: int, next_first):
    """(max_dev, value at max) over this block's valid tie-run ends;
    (-1, None) when the block contributes no evaluation point."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    vals = t[v].to_numpy(zero_copy_only=False)
    ca = t[a].to_numpy(zero_copy_only=False).cumsum() + np.int64(pref_a)
    cb = t[b].to_numpy(zero_copy_only=False).cumsum() + np.int64(pref_b)
    ends = np.zeros(len(vals), dtype=bool)
    ends[:-1] = vals[1:] != vals[:-1]
    ends[-1] = next_first is None or next_first != vals[-1]
    if not ends.any():
        return -1, None
    dev = np.abs(np.int64(n_b) * ca - np.int64(n_a) * cb)[ends]
    ev = vals[ends]
    best = int(dev.max())
    # smallest attaining value — deterministic across block layouts
    return best, ev[dev == best].min()


def ks_2sample(ds: "ray.data.Dataset", value: str, group: str,
               group_a, group_b) -> pa.Table:
    """One-row table {n_a, n_b, d_num, d, d_loc} — the two-sample KS
    statistic of `value` between rows whose `group` equals `group_a`
    vs `group_b` (all other rows ignored; null values dropped)."""

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.is_valid(batch[value]),
            pc.is_in(batch[group], value_set=pa.array([group_a, group_b])),
        )
        t = batch.filter(keep)
        is_a = pc.cast(pc.equal(t[group], pa.scalar(group_a)), pa.int64())
        return pa.table(
            {
                "__v": t[value],
                "__a": is_a,
                "__b": pc.subtract(pa.scalar(1, type=pa.int64()), is_a),
            }
        )

    m = ds.map_batches(flag, batch_format="pyarrow").sort("__v").materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    metas = ray.get([_block_meta.remote(r, "__a", "__b", "__v") for r in refs])
    keyed = sorted(
        (
            (first, last, n, sa, sb, r)
            for (n, sa, sb, first, last), r in zip(metas, refs)
            if n > 0
        ),
        key=lambda t: (t[0], t[1]),
    )
    n_a = sum(k[3] for k in keyed)
    n_b = sum(k[4] for k in keyed)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"ks_2sample: group {group_a!r} has {n_a} rows and {group_b!r} "
            f"has {n_b} — both sides need data"
        )
    if n_a * n_b >= 2**63:
        raise ValueError(
            "ks_2sample: n_a*n_b overflows the int64 numerator — widen "
            "the dev column before running at this scale"
        )
    tasks = []
    pref_a = pref_b = 0
    for i, (_f, _l, _n, sa, sb, r) in enumerate(keyed):
        nxt = keyed[i + 1][0] if i + 1 < len(keyed) else None
        tasks.append(
            _block_dev.remote(r, "__a", "__b", "__v", pref_a, pref_b,
                              n_a, n_b, nxt)
        )
        pref_a += sa
        pref_b += sb
    results = [x for x in ray.get(tasks) if x[0] >= 0]
    d_num = max(x[0] for x in results)
    d_loc = min(loc for dev, loc in results if dev == d_num)
    # D in parts-per-million as EXACT integer round-half-up arithmetic —
    # a rounded float here can land on a .5e-6 boundary (n_a*n_b is a
    # round number) where Python half-even and SQL half-away disagree.
    d_ppm = (d_num * 2_000_000 + n_a * n_b) // (2 * n_a * n_b)
    return pa.table(
        {
            "n_a": pa.array([n_a], type=pa.int64()),
            "n_b": pa.array([n_b], type=pa.int64()),
            "d_num": pa.array([d_num], type=pa.int64()),
            "d_ppm": pa.array([d_ppm], type=pa.int64()),
            "d_loc": pa.array([float(d_loc)], type=pa.float64()),
        }
    )
