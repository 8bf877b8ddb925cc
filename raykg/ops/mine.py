"""Bitext-style pair mining over an embedding table: mutual nearest
neighbors with a margin gap.

The ratio-margin criterion of Artetxe & Schwenk (2019, "Margin-based
Parallel Corpus Mining") mines aligned pairs as mutual nearest
neighbors whose similarity clears a margin over the local neighborhood.
This op implements its EXACT-INTEGER variant on the repo's fixed-point
grid (the ``embed_cov`` / ``silhouette`` pattern): vectors quantize to
``floor(x * 1024)`` int64, squared euclidean distances are exact int64,
"best" breaks ties by smaller id, and the margin is the absolute gap
``d2(second-best) - d2(best) >= min_gap`` required on BOTH sides — so
the SQL mirror matches hash-for-hash with no float anywhere.

Sides are the even / odd ``id_column`` rows (the two "languages" of the
synthetic table).  Both side matrices broadcast once via ``ray.put``
and each side streams through one ``map_batches`` pass against the
other — at corpus scale the broadcast side becomes IVF-bucketed
candidate generation (``ops/similarity.py``); the mutual check is a
bucketed hash join on the A id, never a driver-side join.

A row with no second-best candidate on either side (a side of size 1)
has no defined gap and is dropped, matching the SQL mirror's NULL
comparison semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .join import bucketed_hash_join

_Q = 1024


def _collect_sides(ds, id_column, embedding_column):
    """One streaming pass -> both side matrices, rows id-ascending (the
    ascending order makes np.argmin's first-minimum the id tiebreak)."""
    ids, vecs = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids.append(b[id_column].to_numpy(zero_copy_only=False).astype(np.int64))
        vecs.append(np.asarray(b[embedding_column].to_pylist(), np.float64))
    if not ids:
        e = np.array([], np.int64), np.zeros((0, 1), np.int64)
        return e, e
    i = np.concatenate(ids)
    q = np.floor(np.concatenate(vecs) * _Q).astype(np.int64)
    order = np.argsort(i, kind="stable")
    i, q = i[order], q[order]
    even = (i % 2) == 0
    return (i[even], q[even]), (i[~even], q[~even])


def _best_and_gap(qb: np.ndarray, other_q: np.ndarray):
    """For each row of qb: (index of best other row, d2 best, gap to the
    second best) under (d2, id-ascending) order; other_q rows are already
    id-ascending so np.argmin's first-minimum IS the tiebreak."""
    d2 = (
        (qb * qb).sum(axis=1)[:, None]
        + (other_q * other_q).sum(axis=1)[None, :]
        - 2 * (qb @ other_q.T)
    )
    best = d2.argmin(axis=1)
    rows = np.arange(len(qb))
    dbest = d2[rows, best]
    d2[rows, best] = np.iinfo(np.int64).max
    dsecond = d2.min(axis=1)
    return best, dbest, dsecond - dbest


def mutual_nn_pairs(
    ds: "ray.data.Dataset",
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    min_gap: int = 1,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """(id_a, id_b, d2, gap_a, gap_b) for mutually-nearest even/odd pairs
    whose margin gap clears ``min_gap`` on both sides."""
    (a_ids, a_q), (b_ids, b_q) = _collect_sides(ds, id_column, embedding_column)
    if len(a_ids) < 2 or len(b_ids) < 2:
        return ray.data.from_arrow(pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "d2": pa.array([], pa.int64()), "gap_a": pa.array([], pa.int64()),
             "gap_b": pa.array([], pa.int64())}))
    a_ref = ray.put((a_ids, a_q))
    b_ref = ray.put((b_ids, b_q))

    def b_pass(batch: pa.Table) -> pa.Table:
        ai, aq = ray.get(a_ref)
        i = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (i % 2) == 1
        if not keep.any():
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64()),
                             "gap_b": pa.array([], pa.int64())})
        qb = np.floor(
            np.asarray(batch[embedding_column].to_pylist(), np.float64)[keep]
            * _Q
        ).astype(np.int64)
        best, dbest, gap = _best_and_gap(qb, aq)
        return pa.table(
            {"id_a": pa.array(ai[best], pa.int64()),
             "id_b": pa.array(i[keep], pa.int64()),
             "d2": pa.array(dbest, pa.int64()),
             "gap_b": pa.array(gap, pa.int64())}
        )

    def a_pass(batch: pa.Table) -> pa.Table:
        bi, bq = ray.get(b_ref)
        i = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (i % 2) == 0
        if not keep.any():
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "b_best": pa.array([], pa.int64()),
                             "gap_a": pa.array([], pa.int64())})
        qa = np.floor(
            np.asarray(batch[embedding_column].to_pylist(), np.float64)[keep]
            * _Q
        ).astype(np.int64)
        best, _dbest, gap = _best_and_gap(qa, bq)
        return pa.table(
            {"id_a": pa.array(i[keep], pa.int64()),
             "b_best": pa.array(bi[best], pa.int64()),
             "gap_a": pa.array(gap, pa.int64())}
        )

    tb = ds.map_batches(b_pass, batch_format="pyarrow")
    ta = ds.map_batches(a_pass, batch_format="pyarrow")
    joined = bucketed_hash_join(tb, ta, on="id_a", num_buckets=num_buckets)

    def mutual(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "d2": pa.array([], pa.int64()), "gap_a": pa.array([], pa.int64()),
                 "gap_b": pa.array([], pa.int64())})
        ib = batch["id_b"].to_numpy(zero_copy_only=False)
        bb = batch["b_best"].to_numpy(zero_copy_only=False)
        ga = batch["gap_a"].to_numpy(zero_copy_only=False)
        gb = batch["gap_b"].to_numpy(zero_copy_only=False)
        keep = (ib == bb) & (ga >= min_gap) & (gb >= min_gap)
        t = batch.filter(pa.array(keep))
        return pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "d2": t["d2"],
             "gap_a": t["gap_a"], "gap_b": t["gap_b"]}
        )

    return joined.map_batches(mutual, batch_format="pyarrow")
