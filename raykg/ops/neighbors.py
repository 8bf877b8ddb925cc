"""Common-neighbor counts and adjacency-Jaccard scores (link prediction).

For every unordered node pair ``(u, v)`` with at least ``min_common``
shared neighbors in an undirected graph, emit::

    u, v, common, jaccard, is_edge

where ``jaccard = common / (deg(u) + deg(v) - common)`` (the Jaccard
similarity of the two adjacency sets) and ``is_edge`` flags pairs that
are already connected — link prediction keeps ``is_edge = 0`` rows
(``exclude_edges=True``), dedup/clustering keeps both.

Scale shape (all exchanges move id-width rows, never payloads):

1. **canonical edges + degrees** — reused from `ops/triangles.py`
   (per-batch dedup partials, one node-sharded sum).
2. **wedge expansion** — adjacency sharded by the CENTER node; inside a
   shard each center's neighbor list expands with ``np.triu_indices``
   and pairs are pre-counted per shard (``value_counts`` on the packed
   pair) before they travel, so the pair exchange carries per-shard
   partials, not raw wedges.
3. **pair reduce** — wedge partials and canonical edges co-sharded by
   the ``(u, v)`` pair; one vectorized groupby-sum per shard yields the
   common count and the ``is_edge`` flag together (no separate join).
4. **degree attach** — the ``(node, deg)`` arrays ship once via
   ``ray.put`` and are probed with ``searchsorted`` per batch (the
   same broadcast-vs-bucketed tradeoff as triangle orientation; at
   corpus scale swap for two `bucketed_hash_join` passes).

Exact common-neighbor counting is inherently Θ(Σ deg(center)²) in
emitted wedges; ``max_center_degree`` optionally skips super-hub
centers (standard practice in link prediction — a hub shared by
everyone carries no signal), documented as an approximation and OFF by
default.

The reference plugin has no graph layer; this extends the KG side
(`pipeline/graph.py`) like `ops/pagerank.py` / `ops/triangles.py` do.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply
from .triangles import _degrees, canonical_edges


def common_neighbor_scores(
    edges: "ray.data.Dataset",
    u: str = "u",
    v: str = "v",
    num_shards: int = 32,
    min_common: int = 1,
    exclude_edges: bool = False,
    max_center_degree: Optional[int] = None,
    with_aa: bool = False,
) -> "ray.data.Dataset":
    """``(u, v, common, jaccard, is_edge)`` for node pairs sharing
    ``>= min_common`` neighbors; ``exclude_edges=True`` keeps only
    non-adjacent pairs (link-prediction candidates).

    ``with_aa=True`` appends the Adamic-Adar score — each shared
    neighbor w contributes 1/ln(deg(w)) (Adamic & Adar 2003, the
    standard inverse-log-degree link predictor).  The center's FULL
    degree is its in-shard neighbor count (all rows of a center share
    a shard), so the weight rides the existing wedge partials: still
    one pair exchange, no extra pass."""
    canon = canonical_edges(edges, u, v, num_shards).materialize()
    degrees = _degrees(canon, num_shards).materialize()

    deg_tabs = [
        t for t in ray.get(list(degrees.to_arrow_refs())) if t.num_rows
    ]
    dt = (
        pa.concat_tables(deg_tabs)
        if deg_tabs
        else pa.table({"node": [], "deg": []})
    )
    nodes = dt["node"].to_numpy(zero_copy_only=False)
    degs = dt["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes, kind="stable")
    deg_ref = ray.put((nodes[order], degs[order]))

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch["u"].combine_chunks(),
                        batch["v"].combine_chunks(),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        batch["v"].combine_chunks(),
                        batch["u"].combine_chunks(),
                    ]
                ),
            }
        )

    adj = canon.map_batches(symmetrize, batch_format="pyarrow")

    def wedge_partials(df: pd.DataFrame) -> pd.DataFrame:
        """Per-center pair expansion + in-shard partial count."""
        u_out: List[np.ndarray] = []
        v_out: List[np.ndarray] = []
        w_out: List[np.ndarray] = []
        for _, vals in df.groupby("node", sort=False)["nbr"]:
            d = np.sort(vals.to_numpy())
            k = len(d)
            if k < 2 or (max_center_degree is not None and k > max_center_degree):
                continue
            ii, jj = np.triu_indices(k, 1)
            u_out.append(d[ii])
            v_out.append(d[jj])
            if with_aa:
                w_out.append(np.full(len(ii), 1.0 / np.log(k)))
        if not u_out:
            cols = {
                "u": pd.Series([], dtype=df["nbr"].dtype),
                "v": pd.Series([], dtype=df["nbr"].dtype),
                "cnt": pd.Series([], dtype=np.int64),
                "edge": pd.Series([], dtype=np.int64),
            }
            if with_aa:
                cols["aa"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        part = pd.DataFrame(
            {"u": np.concatenate(u_out), "v": np.concatenate(v_out)}
        )
        if with_aa:
            part["w"] = np.concatenate(w_out)
            part = part.groupby(["u", "v"], sort=False, as_index=False).agg(
                cnt=("w", "size"), aa=("w", "sum")
            )
        else:
            part = part.groupby(["u", "v"], sort=False, as_index=False).size()
            part = part.rename(columns={"size": "cnt"})
        part["edge"] = np.int64(0)
        return part

    wedges = sharded_groupby_apply(adj, ["node"], wedge_partials, num_shards)

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "u": batch["u"],
            "v": batch["v"],
            "cnt": pa.array(np.zeros(n, dtype=np.int64)),
            "edge": pa.array(np.ones(n, dtype=np.int64)),
        }
        if with_aa:
            cols["aa"] = pa.array(np.zeros(n, dtype=np.float64))
        return pa.table(cols)

    tagged = canon.map_batches(tag_edges, batch_format="pyarrow")

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        aggs = dict(common=("cnt", "sum"), is_edge=("edge", "max"))
        if with_aa:
            aggs["aa"] = ("aa", "sum")
        g = df.groupby(["u", "v"], sort=False, as_index=False).agg(**aggs)
        g = g[g["common"] >= min_common]
        if exclude_edges:
            g = g[g["is_edge"] == 0]
        return g

    pairs = sharded_groupby_apply(
        wedges.union(tagged), ["u", "v"], reduce_pairs, num_shards
    )

    def attach_jaccard(df: pd.DataFrame) -> pd.DataFrame:
        ns, ds_ = ray.get(deg_ref)
        du = ds_[np.searchsorted(ns, df["u"].to_numpy())]
        dv = ds_[np.searchsorted(ns, df["v"].to_numpy())]
        common = df["common"].to_numpy().astype(np.int64)
        df = df.copy()
        df["common"] = common
        df["jaccard"] = common / (du + dv - common)
        df["is_edge"] = df["is_edge"].to_numpy().astype(np.int64)
        cols = ["u", "v", "common", "jaccard", "is_edge"]
        if with_aa:
            cols.append("aa")
        return df[cols]

    return pairs.map_batches(attach_jaccard, batch_format="pandas")
