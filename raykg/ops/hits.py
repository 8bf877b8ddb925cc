"""HITS hub/authority scores as EXACT alternating-path counts.

Kleinberg's HITS without the per-iteration normalization: starting from
``h_0 = 1`` on every node,

    a_k(v) = sum over edges (u -> v) of h_{k-1}(u)
    h_k(u) = sum over edges (u -> v) of a_k(v)

After k rounds ``a_k`` / ``h_k`` count the alternating forward/backward
paths of the classic iteration — the same ranking the normalized
variant converges to, but INTEGER-exact at every bounded step, so the
distributed result is bit-equal to an unrolled SQL join chain (the same
bounded-iteration oracle contract as `ops/pagerank.py` /
`ops/paths.py`; normalized HITS would put a float sqrt between the
engines).  Counts grow ~ deg^(2k): int64 holds k=3 on graphs with
average degree into the hundreds — callers with denser graphs lower
``iters``.

Scale shape: the node-state vectors (h, a) broadcast once per
half-iteration via ``ray.put`` (sorted node array + int64 values);
every edge batch emits pre-grouped ``(node, partial)`` contribution
rows; one node-sharded sum per half-iteration folds them back to node
state.  Edges stream ``2 * iters`` times; nothing corpus-scale ever
sits on the driver — node state is node-table-scale by definition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply


def _node_universe(e, src, dst, num_shards):
    def both(batch: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [batch[src].combine_chunks(), batch[dst].combine_chunks()]
        )
        return pa.table({"node": arr}).group_by(["node"]).aggregate([])

    d = sharded_groupby_apply(
        e.map_batches(both, batch_format="pyarrow"),
        ["node"],
        lambda df: df.drop_duplicates(["node"]),
        num_shards,
    )
    tabs = [t for t in ray.get(list(d.materialize().to_arrow_refs())) if t.num_rows]
    nodes = (
        pa.concat_tables(tabs)["node"].to_numpy(zero_copy_only=False)
        if tabs
        else np.array([])
    )
    return np.sort(nodes)


def _propagate(e, nodes, vals, from_col, to_col, num_shards):
    """out[v] = sum over edges (from -> to) of vals[from]."""
    ref = ray.put((nodes, vals))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        ns, vs = ray.get(ref)
        contrib = vs[np.searchsorted(ns, df[from_col].to_numpy())]
        out = pd.DataFrame({"node": df[to_col].to_numpy(), "c": contrib})
        return out.groupby("node", sort=False, as_index=False)["c"].sum()

    rows = sharded_groupby_apply(
        e.map_batches(part, batch_format="pandas"),
        ["node"],
        lambda df: df.groupby("node", sort=False, as_index=False)["c"].sum(),
        num_shards,
    ).to_pandas()
    out = np.zeros(len(nodes), dtype=np.int64)
    if len(rows):
        out[np.searchsorted(nodes, rows["node"].to_numpy())] = rows[
            "c"
        ].to_numpy()
    return out


def hits_path_counts(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """``(node, hub, auth)`` after ``iters`` unnormalized HITS rounds —
    exact int64 alternating-path counts over the DIRECTED edge list
    (parallel edges count with multiplicity, as in the matrix form)."""
    e = edges.select_columns([src, dst]).materialize()
    nodes = _node_universe(e, src, dst, num_shards)
    h = np.ones(len(nodes), dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        a = _propagate(e, nodes, h, src, dst, num_shards)
        h = _propagate(e, nodes, a, dst, src, num_shards)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes),
                "hub": pa.array(h, type=pa.int64()),
                "auth": pa.array(a, type=pa.int64()),
            }
        )
    )


def katz_path_scores(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    base: int = 4,
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Katz centrality (Katz 1953) over bounded path lengths as EXACT
    scaled integers: with attenuation ``beta = 1/base``,

        katz(v) = sum_{l=1..iters} n_l(v) * beta^l

    where ``n_l(v)`` counts directed paths of length l ending at v
    (``n_1 = indeg``, ``n_l(v) = sum over u->v of n_{l-1}(u)``).  The
    returned ``katz`` column is that sum scaled by ``base**iters`` —
    ``sum n_l * base**(iters-l)`` — so it is int64-exact and bit-equal
    to an unrolled SQL join chain; ranking is unchanged by the scaling.
    Counts grow ~ deg^iters: int64 holds iters=3 up to ~2M average
    degree — same bound class as :func:`hits_path_counts`.

    Scale shape identical to HITS: one broadcast + one node-sharded
    contribution fold per length step; edges stream ``iters`` times.
    """
    e = edges.select_columns([src, dst]).materialize()
    nodes = _node_universe(e, src, dst, num_shards)
    vals = np.ones(len(nodes), dtype=np.int64)
    score = np.zeros(len(nodes), dtype=np.int64)
    for l in range(1, iters + 1):
        vals = _propagate(e, nodes, vals, src, dst, num_shards)
        score = score + vals * np.int64(base ** (iters - l))
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes),
                "katz": pa.array(score, type=pa.int64()),
            }
        )
    )
