"""Whole-graph summary statistics as exact integer rationals.

``degree_assortativity`` computes Newman's degree-correlation
coefficient r over an undirected graph, returned as the EXACT integer
pair ``(num, den)`` with ``r = num / den``:

    over the directed both-ways edge view (each undirected edge twice),
    with j = deg(src), k = deg(dst):
        num = m * sum(j*k) - (sum(j))^2
        den = m * sum(j*j) - (sum(j))^2

(the symmetric view makes sum(j) = sum(k) and sum(j^2) = sum(k^2), so
the textbook formula collapses to one pair of sums).  Keeping the
rational avoids the float-division ordering question entirely — the
same exact-parity idiom as `ops/pca.covariance_fixedpoint`.

Scale shape: canonical edges + degrees reuse `ops/triangles.py` (one
node-sharded exchange); degrees broadcast once via ``ray.put`` and are
attached per batch with ``searchsorted``; the four scalar sums
``(m, S1, S2, S3)`` fold from per-batch partials — the collect is one
tiny row per batch, nothing corpus-scale.

``degree_histogram`` buckets the degree table into powers of two —
``(bucket, n_nodes)`` with bucket = floor(log2(deg)) — a node-sharded
count on an already node-sized table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply
from .triangles import _degrees, canonical_edges


def degree_assortativity(
    edges: "ray.data.Dataset",
    u: str = "u",
    v: str = "v",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """One row ``(m, num, den)``: directed-edge count and the exact
    rational numerator/denominator of Newman's assortativity."""
    canon = canonical_edges(edges, u, v, num_shards).materialize()
    degrees = _degrees(canon, num_shards).materialize()

    tabs = [t for t in ray.get(list(degrees.to_arrow_refs())) if t.num_rows]
    dt = pa.concat_tables(tabs)
    nodes = dt["node"].to_numpy(zero_copy_only=False)
    degs = dt["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes, kind="stable")
    ref = ray.put((nodes[order], degs[order]))

    def partial(batch: pa.Table) -> pa.Table:
        ns, ds_ = ray.get(ref)
        a = batch["u"].to_numpy(zero_copy_only=False)
        b = batch["v"].to_numpy(zero_copy_only=False)
        ju = ds_[np.searchsorted(ns, a)]
        jv = ds_[np.searchsorted(ns, b)]
        # both directions of every canonical edge
        m = 2 * len(a)
        s1 = int(ju.sum() + jv.sum())
        s2 = int(2 * (ju * jv).sum())
        s3 = int((ju * ju).sum() + (jv * jv).sum())
        return pa.table(
            {"m": pa.array([m], type=pa.int64()),
             "s1": pa.array([s1], type=pa.int64()),
             "s2": pa.array([s2], type=pa.int64()),
             "s3": pa.array([s3], type=pa.int64())}
        )

    parts = canon.map_batches(partial, batch_format="pyarrow").take_all()
    m = sum(int(p["m"]) for p in parts)
    s1 = sum(int(p["s1"]) for p in parts)
    s2 = sum(int(p["s2"]) for p in parts)
    s3 = sum(int(p["s3"]) for p in parts)
    return ray.data.from_arrow(
        pa.table(
            {"m": pa.array([m], type=pa.int64()),
             "num": pa.array([m * s2 - s1 * s1], type=pa.int64()),
             "den": pa.array([m * s3 - s1 * s1], type=pa.int64())}
        )
    )


def degree_histogram(
    edges: "ray.data.Dataset",
    u: str = "u",
    v: str = "v",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """``(bucket, n_nodes)`` with bucket = floor(log2(deg)) over the
    distinct-neighbor degree table."""
    canon = canonical_edges(edges, u, v, num_shards)
    degrees = _degrees(canon, num_shards)

    def bucketize(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.floor(np.log2(d)).astype(np.int64)
        vc = pd.Series(b).value_counts()
        return pa.table(
            {"bucket": pa.array(vc.index.to_numpy(), type=pa.int64()),
             "n": pa.array(vc.to_numpy(), type=pa.int64())}
        )

    return sharded_groupby_apply(
        degrees.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"],
        lambda df: df.groupby("bucket", sort=False, as_index=False)["n"].sum(),
        min(num_shards, 8),
    )


def kcore_bounded(
    edges: "ray.data.Dataset",
    k: int,
    rounds: int,
    u: str = "u",
    v: str = "v",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Bounded-round k-core peeling: ``rounds`` synchronous passes of
    "drop every node with degree < k, keep edges between survivors",
    returning the surviving ``(node, deg)`` table (degrees within the
    surviving subgraph).  With enough rounds this is the k-core
    fixed point; bounding the rounds keeps the loop deterministic and
    SQL-mirrorable (one unrolled CTE block per round) — the same
    bounded-iteration contract as `ops/bfs.py` / `ops/paths.py`.

    Per round: one node-sharded degree exchange + one broadcast of the
    surviving node ids (sorted array via ``ray.put``, searchsorted
    filter per batch).  The edge set only ever shrinks; node state is
    node-table-scale, never corpus-scale.
    """
    cur = canonical_edges(edges, u, v, num_shards).materialize()
    deg = _degrees(cur, num_shards).materialize()
    node_type = pa.int64()

    def empty_result():
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], type=node_type),
                 "deg": pa.array([], type=pa.int64())}
            )
        )

    for _ in range(rounds):
        tabs = [t for t in ray.get(list(deg.to_arrow_refs())) if t.num_rows]
        if not tabs:
            return empty_result()
        node_type = tabs[0]["node"].type
        dt = pa.concat_tables(tabs)
        nodes = dt["node"].to_numpy(zero_copy_only=False)
        degs = dt["deg"].to_numpy(zero_copy_only=False)
        keep = np.sort(nodes[degs >= k])
        if len(keep) == len(nodes):
            break  # fixed point reached early — identical to more rounds
        ref = ray.put(keep)

        def filt(batch: pa.Table) -> pa.Table:
            kp = ray.get(ref)
            a = batch["u"].to_numpy(zero_copy_only=False)
            b = batch["v"].to_numpy(zero_copy_only=False)
            if not len(kp):
                return batch.slice(0, 0)
            pa_ = np.minimum(np.searchsorted(kp, a), len(kp) - 1)
            pb_ = np.minimum(np.searchsorted(kp, b), len(kp) - 1)
            mask = (kp[pa_] == a) & (kp[pb_] == b)
            return batch.filter(pa.array(mask))

        cur = cur.map_batches(filt, batch_format="pyarrow").materialize()
        deg = _degrees(cur, num_shards).materialize()
    if not deg.count():
        return empty_result()
    return deg
