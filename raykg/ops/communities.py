"""Community detection — synchronous majority label propagation.

Connected components (`ops/components.py`) answers "which nodes touch at
all"; community detection answers "which nodes cluster densely" — for a KG,
concept neighborhoods / topic groups.  Classic async label propagation
(Raghavan et al. 2007) is visit-order dependent; this is the SYNCHRONOUS,
fixed-round variant with a deterministic tie-break, so the result is
partition-invariant and a DuckDB oracle can unroll the rounds exactly:

- labels init to the node's own id;
- one round: ``label(v) <- argmax_l |{u in N(v) : label(u) = l}|``, ties
  resolved to the SMALLEST label, all nodes updated simultaneously;
- a fixed ``rounds`` count (like the BFS/Bellman-Ford/k-core families,
  bounded iterations keep it SQL-mirrorable).

Scale shape: the distinct symmetric edge list is materialized once (one
exchange, edge-volume sized); each round is one label attach (broadcast
lookup under ``_BROADCAST_MAX_LABELS`` nodes, bucketed hash join above —
the same threshold-gated house pattern as components/pagerank/walks) plus
one edge-volume exchange sharded by destination, whose in-shard kernel is
one vectorized pandas groupby-count + drop_duplicates.  Nothing
node- or edge-sized ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply

_BROADCAST_MAX_LABELS = 2_000_000


def label_propagation(
    pairs: "ray.data.Dataset",
    id_a: str = "u",
    id_b: str = "v",
    rounds: int = 2,
    num_shards: int = 32,
    num_buckets: int = 32,
    max_broadcast_nodes: int | None = None,
    return_edges: bool = False,
) -> "ray.data.Dataset":
    """(u, v) pair Dataset -> (node, community) after ``rounds`` synchronous
    majority-label updates (module docstring).  ``return_edges=True``
    additionally returns the internally-deduped SYMMETRIZED (s, d) edge
    Dataset as ``(labels, edges)`` so downstream passes (e.g.
    :func:`modularity`) reuse it instead of re-paying the dedup
    exchange."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[id_a].to_pylist(), dtype=np.int64)
        b = np.asarray(batch[id_b].to_pylist(), dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "s": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "d": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["s", "d"])

    # distinct edges, materialized once and reused every round (pair sources
    # like group_pairs emit one copy per co-occurrence group)
    edges = sharded_groupby_apply(
        pairs.map_batches(symmetrize, batch_format="pyarrow"),
        ["s", "d"],
        distinct,
        num_shards=num_shards,
    ).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        s = batch["s"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"node": pa.array(s, type=pa.int64()), "label": pa.array(s, type=pa.int64())}
        )

    def distinct_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["node"])

    labels = sharded_groupby_apply(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        ["node"],
        distinct_nodes,
        num_shards=num_shards,
    )

    def mode_per_node(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["node", "nb_label"], sort=False)
            .size()
            .reset_index(name="c")
            .sort_values(
                ["node", "c", "nb_label"],
                ascending=[True, False, True],
                kind="stable",
            )
            .drop_duplicates("node")
        )
        return pd.DataFrame(
            {
                "node": g["node"].to_numpy(dtype=np.int64),
                "label": g["nb_label"].to_numpy(dtype=np.int64),
            }
        )

    bcast_max = _BROADCAST_MAX_LABELS if max_broadcast_nodes is None else max_broadcast_nodes
    for _ in range(rounds):
        labels = labels.materialize()  # consumed by the attach below
        n_nodes = labels.count()
        if n_nodes <= bcast_max:
            refs = labels.to_arrow_refs()
            cache: dict = {}

            def attach(batch: pa.Table, refs=refs, cache=cache) -> pa.Table:
                if "lut" not in cache:
                    tabs = [t for t in ray.get(list(refs)) if t.num_rows]
                    full = pa.concat_tables(tabs)
                    k = full["node"].combine_chunks().to_numpy(zero_copy_only=False)
                    v = full["label"].combine_chunks().to_numpy(zero_copy_only=False)
                    order = np.argsort(k)
                    cache["lut"] = (k[order], v[order])
                k, v = cache["lut"]
                s = batch["s"].combine_chunks().to_numpy(zero_copy_only=False)
                # every s is a node (labels were initialized from edge
                # endpoints and every round relabels every node)
                lab = v[np.searchsorted(k, s)]
                return pa.Table.from_pydict(
                    {
                        "node": batch["d"],
                        "nb_label": pa.array(lab, type=pa.int64()),
                    }
                )

            relabeled = edges.map_batches(attach, batch_format="pyarrow")
        else:
            from .join import bucketed_hash_join

            renamed = labels.map_batches(
                lambda b: b.rename_columns(["s", "s_label"]),
                batch_format="pyarrow",
            )
            joined = bucketed_hash_join(edges, renamed, on="s", num_buckets=num_buckets)
            relabeled = joined.map_batches(
                lambda b: pa.Table.from_pydict(
                    {"node": b["d"], "nb_label": b["s_label"]}
                ),
                batch_format="pyarrow",
            )

        labels = sharded_groupby_apply(
            relabeled, ["node"], mode_per_node, num_shards=num_shards
        )

    out = labels.map_batches(
        lambda b: b.rename_columns(["node", "community"]), batch_format="pyarrow"
    )
    return (out, edges) if return_edges else out


def modularity(
    pairs: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    id_a: str = "u",
    id_b: str = "v",
    num_shards: int = 32,
    num_buckets: int = 32,
    max_broadcast_nodes: int | None = None,
    assume_deduped: bool = False,
) -> pa.Table:
    """Newman modularity of a (node, community) partition over the
    undirected simple graph induced by ``pairs``, as EXACT INTEGERS:

        Q = q_num / (4 m²),   q_num = Σ_c (4·m·in_c − deg_c²)

    One row {n_comms, m_edges, q_num} — no float division to reconcile
    with an oracle.  Edges dedup through one hash(u,v) exchange — or
    zero when ``assume_deduped=True`` (the caller passes an
    already-distinct pair set, e.g. the symmetrized edges
    ``label_propagation(return_edges=True)`` built: the u<v filter is a
    stateless map, no exchange); the community lookup broadcasts under
    the LPA gate (bucketed hash joins above it); per-batch
    (community, in_c, deg) cells make the final exchange
    community-domain-sized."""
    from .agg import sharded_groupby_apply

    def norm(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[id_a].to_pylist(), dtype=np.int64)
        b = np.asarray(batch[id_b].to_pylist(), dtype=np.int64)
        keep = a != b  # guard: self-loops carry no modularity semantics here
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if assume_deduped:
            keep2 = a < b  # symmetrized input: keep one direction
            lo, hi = a[keep2], b[keep2]
        return pa.Table.from_pydict(
            {
                "u": pa.array(lo, type=pa.int64()),
                "v": pa.array(hi, type=pa.int64()),
            }
        )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"])

    normed = pairs.map_batches(norm, batch_format="pyarrow")
    edges = (
        normed.materialize()
        if assume_deduped
        else sharded_groupby_apply(
            normed, ["u", "v"], distinct, num_shards=num_shards
        ).materialize()
    )
    m = edges.count()

    labels = labels.materialize()
    n_nodes = labels.count()
    bcast_max = (
        _BROADCAST_MAX_LABELS if max_broadcast_nodes is None else max_broadcast_nodes
    )
    if n_nodes <= bcast_max:
        refs = labels.to_arrow_refs()
        cache: dict = {}

        def with_comms(batch: pa.Table, refs=refs, cache=cache) -> pa.Table:
            if "lut" not in cache:
                tabs = [t for t in ray.get(list(refs)) if t.num_rows]
                full = pa.concat_tables(tabs)
                k = full["node"].combine_chunks().to_numpy(zero_copy_only=False)
                v = full["community"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                order = np.argsort(k)
                cache["lut"] = (k[order], v[order])
            k, lv = cache["lut"]
            uu = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
            vv = batch["v"].combine_chunks().to_numpy(zero_copy_only=False)
            # bounds-checked lookup: an edge endpoint missing from `labels`
            # must raise loudly, not index past the array or land on the
            # nearest label (and the bucketed path's inner join would drop
            # it — keep both plans' degenerate behavior identical).
            pu = np.minimum(np.searchsorted(k, uu), len(k) - 1)
            pv = np.minimum(np.searchsorted(k, vv), len(k) - 1)
            if len(k) == 0 or not (np.all(k[pu] == uu) and np.all(k[pv] == vv)):
                missing = np.concatenate([uu[k[pu] != uu], vv[k[pv] != vv]]) if len(k) else np.concatenate([uu, vv])
                raise ValueError(
                    "modularity: edge endpoints missing from `labels` "
                    f"(e.g. node {missing[0]!r}); every node incident to an "
                    "edge must carry a community label"
                )
            return pa.Table.from_pydict(
                {
                    "cu": pa.array(lv[pu], type=pa.int64()),
                    "cv": pa.array(lv[pv], type=pa.int64()),
                }
            )

        tagged = edges.map_batches(with_comms, batch_format="pyarrow")
    else:
        from .join import bucketed_hash_join

        lab_u = labels.map_batches(
            lambda b: b.rename_columns(["u", "cu"]), batch_format="pyarrow"
        )
        lab_v = labels.map_batches(
            lambda b: b.rename_columns(["v", "cv"]), batch_format="pyarrow"
        )
        tagged = bucketed_hash_join(
            bucketed_hash_join(edges, lab_u, on="u", num_buckets=num_buckets),
            lab_v,
            on="v",
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: b.select(["cu", "cv"]), batch_format="pyarrow"
        ).materialize()
        # inner joins silently drop edges whose endpoint has no label; fail
        # loudly instead so both plans agree with the broadcast path.
        if tagged.count() != m:
            raise ValueError(
                f"modularity: {m - tagged.count()} of {m} edges have an "
                "endpoint missing from `labels`; every node incident to an "
                "edge must carry a community label"
            )

    def cells(batch: pa.Table) -> pa.Table:
        cu = batch["cu"].to_numpy(zero_copy_only=False)
        cv = batch["cv"].to_numpy(zero_copy_only=False)
        ends = np.concatenate([cu, cv])
        uniq, deg = np.unique(ends, return_counts=True)
        same = cu[cu == cv]
        in_map = dict(zip(*np.unique(same, return_counts=True)))
        in_c = np.array([in_map.get(c, 0) for c in uniq], dtype=np.int64)
        return pa.table(
            {
                "c": pa.array(uniq, type=pa.int64()),
                "in_c": pa.array(in_c, type=pa.int64()),
                "deg": pa.array(deg.astype(np.int64), type=pa.int64()),
            }
        )

    folded = (
        tagged.map_batches(cells, batch_format="pyarrow")
        .groupby("c")
        .sum(["in_c", "deg"])
        .to_pandas()
    )
    in_c = folded["sum(in_c)"].to_numpy(np.int64)
    deg = folded["sum(deg)"].to_numpy(np.int64)
    q_num = int((4 * m * in_c - deg * deg).sum())
    return pa.table(
        {
            "n_comms": pa.array([len(folded)], type=pa.int64()),
            "m_edges": pa.array([m], type=pa.int64()),
            "q_num": pa.array([q_num], type=pa.int64()),
        }
    )
