"""Deterministic random-walk generation (DeepWalk-style corpus prep).

Graph-embedding pipelines (DeepWalk / node2vec — public methods) train
on walk sequences sampled from the graph.  At corpus scale the sampling
must be REPRODUCIBLE — a retried task has to emit the same walks — so
the "randomness" here is the repo's md5 corpus-auditability idiom: at
step ``s`` a walk at node ``u`` moves to

    nbrs(u)[ md5(f"{walk_id}:{s}") % deg(u) ]

with ``nbrs(u)`` in sorted order.  Fully deterministic given the edge
set, identical across partitionings AND in a SQL mirror (row_number
over sorted neighbors + the same md5-mod pick).

Scale shape: the adjacency is built once (canonical edges symmetrized,
neighbor-sharded); each step is ONE bucketed join of the frontier
``(walk_id, node)`` against the sharded adjacency — inside a shard the
pick is vectorized (searchsorted into the shard's CSR-style neighbor
layout).  ``L`` steps = ``L`` exchanges of walk-id-width rows; walks
never sit on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply
from .triangles import canonical_edges


def _pick_hash(walk_ids: np.ndarray, step: int) -> np.ndarray:
    return np.fromiter(
        (
            int(hashlib.md5(f"{w}:{step}".encode()).hexdigest()[:15], 16)
            for w in walk_ids
        ),
        dtype=np.int64,
        count=len(walk_ids),
    )


def _walks_broadcast(adj, length, num_shards):
    """Adjacency as one broadcast CSR (sorted nodes, indptr, sorted
    neighbor array — 16 bytes/directed edge): each step is a STATELESS
    map over the frontier, zero per-step exchanges.  Right whenever the
    edge set fits a worker heap — the same regime as the triangle
    closure's packed-edge-set broadcast; the sharded join engine below
    is the corpus-scale fallback."""
    tabs = [
        t
        for t in ray.get(list(adj.materialize().to_arrow_refs()))
        if t.num_rows
    ]
    at = pa.concat_tables(tabs)
    an = at["node"].to_numpy(zero_copy_only=False)
    ab = at["nbr"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ab, an))
    an, ab = an[order], ab[order]
    nodes, indptr_start = np.unique(an, return_index=True)
    indptr = np.append(indptr_start, len(an))
    ref = ray.put((nodes, indptr, ab))

    start = ray.data.from_arrow(
        pa.table({"walk_id": pa.array(nodes), "node": pa.array(nodes)})
    )

    out = [
        start.map_batches(
            lambda df, s=0: df.assign(step=np.int64(s)),
            batch_format="pandas",
        )
    ]
    frontier = start
    for s in range(1, length + 1):

        def step(df: pd.DataFrame, s=s) -> pd.DataFrame:
            ns, ip, nb = ray.get(ref)
            pos = np.searchsorted(ns, df["node"].to_numpy())
            deg = ip[pos + 1] - ip[pos]
            h = _pick_hash(df["walk_id"].to_numpy(), s)
            idx = ip[pos] + (h % deg)
            return pd.DataFrame(
                {"walk_id": df["walk_id"].to_numpy(), "node": nb[idx]}
            )

        frontier = frontier.map_batches(step, batch_format="pandas")
        out.append(
            frontier.map_batches(
                lambda df, s=s: df.assign(step=np.int64(s)),
                batch_format="pandas",
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res.map_batches(
        lambda df: df[["walk_id", "step", "node"]], batch_format="pandas"
    )


def random_walks(
    edges: "ray.data.Dataset",
    u: str = "u",
    v: str = "v",
    length: int = 3,
    num_shards: int = 32,
    engine: str = "auto",
    broadcast_max_edges: int = 50_000_000,
) -> "ray.data.Dataset":
    """One walk per node (walk_id = start node), ``length`` steps over
    the undirected graph: long-form output ``(walk_id, step, node)``
    with step 0 = the start.  Deterministic md5 neighbor picks.

    ``engine``: 'broadcast' ships the CSR adjacency once and walks with
    stateless maps; 'sharded' keeps the adjacency a Dataset and does one
    bucketed frontier ⋈ adjacency exchange per step; 'auto' broadcasts
    when the directed edge count fits ``broadcast_max_edges``.  Engines
    are pinned equal by test (the pick is deterministic)."""
    canon = canonical_edges(edges, u, v, num_shards).materialize()

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch["u"].combine_chunks(), batch["v"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [batch["v"].combine_chunks(), batch["u"].combine_chunks()]
                ),
            }
        )

    adj = canon.map_batches(symmetrize, batch_format="pyarrow")

    if engine == "auto":
        n_edges = canon.count() * 2
        engine = "broadcast" if n_edges <= broadcast_max_edges else "sharded"
    if engine == "broadcast":
        return _walks_broadcast(adj, length, num_shards)

    adj = adj.materialize()

    # frontier step s: (walk_id, node); start = every node walks
    def starts(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["node"].drop_duplicates()
        return pd.DataFrame({"walk_id": nodes, "node": nodes})

    frontier = sharded_groupby_apply(adj, ["node"], starts, num_shards)
    out = [
        frontier.map_batches(
            lambda df, s=0: df.assign(step=np.int64(s)),
            batch_format="pandas",
        )
    ]
    for s in range(1, length + 1):

        def step_join(df: pd.DataFrame, s=s) -> pd.DataFrame:
            """One shard: all adjacency rows + frontier rows of its nodes."""
            a = df[df["__role"] == 0]
            f = df[df["__role"] == 1]
            if not len(f) or not len(a):
                return pd.DataFrame({"walk_id": [], "node": []})
            # CSR-ish layout: neighbors sorted per node
            a = a.sort_values(["node", "nbr"], kind="stable")
            nodes, starts_ = np.unique(
                a["node"].to_numpy(), return_index=True
            )
            counts = np.diff(np.append(starts_, len(a)))
            pos = np.searchsorted(nodes, f["node"].to_numpy())
            ok = (pos < len(nodes)) & (
                nodes[np.minimum(pos, len(nodes) - 1)] == f["node"].to_numpy()
            )
            f = f[ok]
            pos = pos[ok]
            h = _pick_hash(f["walk_id"].to_numpy(), s)
            idx = starts_[pos] + (h % counts[pos])
            return pd.DataFrame(
                {
                    "walk_id": f["walk_id"].to_numpy(),
                    "node": a["nbr"].to_numpy()[idx],
                }
            )

        tagged = adj.map_batches(
            # walk_id is unused on adjacency rows; filled with the node to
            # keep the union schema aligned and typed
            lambda df: df.assign(walk_id=df["node"], __role=np.int8(0)),
            batch_format="pandas",
        ).union(
            frontier.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["node"], "nbr": df["node"],
                     "walk_id": df["walk_id"]}
                ).assign(__role=np.int8(1)),
                batch_format="pandas",
            )
        )
        frontier = sharded_groupby_apply(
            tagged, ["node"], step_join, num_shards
        ).materialize()
        out.append(
            frontier.map_batches(
                lambda df, s=s: df.assign(step=np.int64(s)),
                batch_format="pandas",
            )
        )

    res = out[0]
    for o in out[1:]:
        res = res.union(o)

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df[["walk_id", "step", "node"]]

    return res.map_batches(typed, batch_format="pandas")
