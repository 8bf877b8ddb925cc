"""Exact Kendall tau-b, distributed, for a bounded-cardinality x side.

    tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2))
    n0 = n(n−1)/2,  n1 = Σ_x tx(tx−1)/2,  n2 = Σ_y ty(ty−1)/2

The classic O(n log n) inversion count does not distribute (cross-block
pair resolution is all-to-all in the general case), but when one column
is bounded-cardinality categorical (the operator's documented contract —
priorities, nations, buckets; cap 4096 distinct, loud error above), C
and D reduce to a prefix scan over a K-dim x-histogram in global y
order:

1. ``sort(y)`` — the ONLY exchange; blocks ordered by (first, last) key
   exactly as in ``ops/rank.py``;
2. pass 1, one task per block: sparse x-histograms of the whole block
   and of its head/tail y-tie runs, plus interior y-tie pair counts;
3. driver (O(blocks·K)): global x ids, per-block prefix histograms,
   y-tie groups that SPAN blocks merged from the head/tail histograms —
   both for n2 and for the head-run correction (rows tied in y must not
   count each other as concordant);
4. pass 2, one task per block: walk local y-tie runs, C += run_count[k]
   · (#earlier rows with x < k), D += run_count[k] · (#earlier with
   x > k), all vectorized bincounts and cumsums.

Pairs tied in x only, y only, or both are excluded from C and D by
construction (strict < / > against the histogram).  C/D accumulate in
float64 — exact below 2^53 pairs.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MAX_X_DISTINCT = 4096


def _sparse_hist(xv: np.ndarray):
    vals, counts = np.unique(xv, return_counts=True)
    return vals, counts.astype(np.int64)


@ray.remote
def _block_scan1(block, x: str, y: str):
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    if t.num_rows == 0 or y not in t.column_names:
        return None
    yc, xc = t[y], t[x]
    if yc.null_count or xc.null_count:
        raise ValueError("kendall_tau: null in x or y — filter first")
    yv = yc.to_numpy(zero_copy_only=False)
    xv = xc.to_numpy(zero_copy_only=False)
    n = len(yv)
    head = int(np.searchsorted(yv, yv[0], side="right"))
    tail = int(n - np.searchsorted(yv, yv[-1], side="left"))
    starts = np.concatenate([[0], np.flatnonzero(yv[1:] != yv[:-1]) + 1])
    ends = np.concatenate([starts[1:], [n]])
    runs = ends - starts
    interior = runs[1:-1] if len(runs) > 2 else runs[:0]
    interior_ties = float((interior * (interior - 1) // 2).sum())
    return {
        "first": yv[0],
        "last": yv[-1],
        "n": n,
        "full": _sparse_hist(xv),
        "head": _sparse_hist(xv[:head]),
        "tail": _sparse_hist(xv[n - tail:]),
        "interior_ties": interior_ties,
    }


@ray.remote
def _block_scan2(block, x: str, y: str, xs, prefix, correction):
    """(C, D) partials: prefix = dense K-hist of all earlier blocks,
    correction = dense K-hist of earlier-block rows tied with this
    block's first y value (excluded — tied pairs are neither C nor D)."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    yv = t[y].to_numpy(zero_copy_only=False)
    xv = t[x].to_numpy(zero_copy_only=False)
    ids = np.searchsorted(xs, xv)
    K = len(xs)
    n = len(yv)
    starts = np.concatenate([[0], np.flatnonzero(yv[1:] != yv[:-1]) + 1])
    ends = np.concatenate([starts[1:], [n]])
    cum = prefix.astype(np.float64).copy()
    C = D = 0.0
    for r, (p, q) in enumerate(zip(starts, ends)):
        rc = np.bincount(ids[p:q], minlength=K).astype(np.float64)
        before = cum - correction if r == 0 else cum
        lt = np.concatenate([[0.0], np.cumsum(before)[:-1]])  # x' < k
        gt = before.sum() - lt - before  # x' > k
        C += float((rc * lt).sum())
        D += float((rc * gt).sum())
        cum += rc
    return C, D


def kendall_tau(ds, x: str, y: str) -> pa.Table:
    """One row {concordant, discordant, kendall_tau (6 digits)} over the
    x (bounded categorical) / y columns of `ds`."""
    rows = ds.select_columns([x, y]).map_batches(
        lambda t: t.drop_null(), batch_format="pyarrow"
    )
    try:
        m = rows.sort(y).materialize()
    except Exception as err:
        raise ValueError(
            f"kendall_tau: sort on {y!r} failed — null or mixed-type "
            "column is the usual cause"
        ) from err
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    raw = ray.get([_block_scan1.remote(r, x, y) for r in refs])
    pairs = [(i, r) for i, r in zip(raw, refs) if i is not None]
    pairs.sort(key=lambda t: (t[0]["first"], t[0]["last"]))
    infos = [p[0] for p in pairs]
    live = [p[1] for p in pairs]
    if not infos:
        return pa.table(
            {
                "concordant": pa.array([0], type=pa.int64()),
                "discordant": pa.array([0], type=pa.int64()),
                "kendall_tau": pa.array([None], type=pa.float64()),
            }
        )

    xs = np.unique(np.concatenate([i["full"][0] for i in infos]))
    if len(xs) > _MAX_X_DISTINCT:
        raise ValueError(
            f"kendall_tau: x column {x!r} has {len(xs)} distinct values; "
            f"the histogram-prefix algorithm requires a bounded "
            f"categorical side (≤ {_MAX_X_DISTINCT})"
        )
    K = len(xs)

    def dense(sparse) -> np.ndarray:
        vals, counts = sparse
        out = np.zeros(K, dtype=np.int64)
        out[np.searchsorted(xs, vals)] = counts
        return out

    fulls = [dense(i["full"]) for i in infos]
    n_total = int(sum(i["n"] for i in infos))

    # n1: ties in x, from the global x histogram
    tx = np.sum(fulls, axis=0).astype(np.float64)
    n1 = float((tx * (tx - 1.0) / 2.0).sum())

    # n2: ties in y — interior runs per block + boundary groups merged
    # across blocks ((value, count-hist) segments, same walk as rank.py)
    n2 = sum(i["interior_ties"] for i in infos)
    segs = []
    for i in infos:
        if i["first"] == i["last"]:
            segs.append([i["first"], dense(i["full"])])
        else:
            segs.append([i["first"], dense(i["head"])])
            segs.append([i["last"], dense(i["tail"])])
    merged = []
    for val, h in segs:
        if merged and merged[-1][0] == val:
            merged[-1][1] = merged[-1][1] + h
        else:
            merged.append([val, h])
    for _val, h in merged:
        c = float(h.sum())
        n2 += c * (c - 1.0) / 2.0

    # per-block prefix histogram + head-run tie correction
    prefixes, corrections = [], []
    run_hist = np.zeros(K, dtype=np.int64)  # earlier blocks' prefix
    for b, i in enumerate(infos):
        prefixes.append(run_hist.copy())
        corr = np.zeros(K, dtype=np.int64)
        bb = b - 1
        while bb >= 0:
            prev = infos[bb]
            if prev["last"] != i["first"]:
                break
            if prev["first"] == prev["last"]:
                corr += dense(prev["full"])
                bb -= 1  # whole block tied: keep walking back
            else:
                corr += dense(prev["tail"])
                break
        corrections.append(corr)
        run_hist = run_hist + fulls[b]

    parts = ray.get(
        [
            _block_scan2.remote(r, x, y, xs, p, c)
            for r, p, c in zip(live, prefixes, corrections)
        ]
    )
    C = sum(p[0] for p in parts)
    D = sum(p[1] for p in parts)
    n0 = n_total * (n_total - 1.0) / 2.0
    den = np.sqrt((n0 - n1) * (n0 - n2))
    tau = float((C - D) / den) if den > 0 else float("nan")
    return pa.table(
        {
            "concordant": pa.array([int(C)], type=pa.int64()),
            "discordant": pa.array([int(D)], type=pa.int64()),
            "kendall_tau": pa.array([round(tau, 6)], type=pa.float64()),
        }
    )
