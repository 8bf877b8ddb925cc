"""Strongly connected components of a DIRECTED graph — FW-BW-MIN coloring.

The undirected clustering in `ops/components.py` cannot see direction;
KG edge tables are directed (conv -> turn -> tool, mention -> concept),
and cycle groups (mutual-reference clusters, synonym rings, redirect
loops) are SCCs.  This implements the distributed coloring algorithm
(Orzan 2004; McLendon et al. 2005 "FW-BW-Trim" family) with min-label
propagation as the reachability primitive:

Per peel round, on the remaining subgraph:

1. ``fwd(v)`` = min id over v's ANCESTOR closure (incl. self): BSP
   min-label propagation along edge direction until fixpoint;
2. ``bwd(v)`` = min id over v's DESCENDANT closure: same on the
   reversed edges;
3. ancestor and descendant closures are SCC-invariant, so both labels
   are constant per SCC; ``fwd(v) == bwd(v) == m`` proves ``m`` is both
   an ancestor and a descendant of ``v`` — i.e. ``m`` is in ``v``'s SCC
   and (being the min of a superset) is its minimum id.  Those nodes
   RESOLVE with ``scc_id = m``;
4. unresolved nodes keep only edges between themselves; repeat.

Every peel round resolves at least every SCC containing the minimum id
of its reach neighborhood; adversarial id orderings (a descending DAG
chain) need O(chain) rounds, so ``max_peel_rounds`` fails loudly rather
than looping — real KG graphs with hash-assigned ids resolve in a few
rounds.

Scale shape: edges are (int64, int64) pairs, deduped and materialized
once per peel round; one propagation step = attach-label (broadcast
lookup under ``_BROADCAST_MAX_LABELS`` nodes, bucketed hash join above)
+ one dst-sharded vectorized min — the `ops/components.py` pattern,
directed.  The convergence witness is the strictly-decreasing label
sum.  Nothing node-set-sized lands on the driver above the broadcast
threshold; below it, only the int64 (node, label) pairs do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .agg import sharded_groupby_apply
from .components import _BROADCAST_MAX_LABELS
from .join import bucketed_hash_join
from .setops import distinct_rows

_EMPTY = pa.Table.from_pydict(
    {
        "node": pa.array([], type=pa.int64()),
        "scc_id": pa.array([], type=pa.int64()),
    }
)


def _min_propagate(
    edges: "ray.data.Dataset",
    num_shards: int,
    num_buckets: int,
    max_iters: int,
) -> "ray.data.Dataset":
    """min-label propagation ALONG edge direction: label(v) converges to
    the min id of v's ancestor closure.  ``edges`` must be materialized,
    deduped, and contain a self-edge for every node (so every node
    appears as dst and keeps its own label in the fold)."""

    def min_per_dst(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("dst", sort=False)[df.columns[1]].min().reset_index()
        out.columns = ["node", "label"]
        return out

    labels = sharded_groupby_apply(
        edges.map_batches(
            lambda b: pa.table({"dst": b["dst"], "label": b["src"]}),
            batch_format="pyarrow",
        ),
        ["dst"],
        min_per_dst,
        num_shards=num_shards,
    )

    def label_sum(lab):
        row = lab.aggregate(Sum("label", alias_name="s"))
        return None if not row or row["s"] is None else int(row["s"])

    prev = label_sum(labels)
    for _ in range(max_iters):
        labels = labels.materialize()
        n_nodes = labels.count()
        if n_nodes <= _BROADCAST_MAX_LABELS:
            refs = labels.to_arrow_refs()
            cache: dict = {}

            def attach(batch: pa.Table, refs=refs, cache=cache) -> pa.Table:
                if "lut" not in cache:
                    tabs = [t for t in ray.get(list(refs)) if t.num_rows]
                    full = pa.concat_tables(tabs)
                    k = full["node"].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )
                    v = full["label"].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )
                    order = np.argsort(k)
                    cache["lut"] = (k[order], v[order])
                k, v = cache["lut"]
                src = batch["src"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                lab = v[np.searchsorted(k, src)]
                return pa.table(
                    {
                        "dst": batch["dst"],
                        "src_label": pa.array(lab, type=pa.int64()),
                    }
                )

            relabeled = edges.map_batches(attach, batch_format="pyarrow")
        else:
            renamed = labels.map_batches(
                lambda b: b.rename_columns(["src", "src_label"]),
                batch_format="pyarrow",
            )
            relabeled = bucketed_hash_join(
                edges, renamed, on="src", num_buckets=num_buckets
            ).drop_columns(["src"])

        labels = sharded_groupby_apply(
            relabeled, ["dst"], min_per_dst, num_shards=num_shards
        )
        cur = label_sum(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"scc label propagation did not converge in {max_iters} rounds"
    )


def _scc_local(src: np.ndarray, dst: np.ndarray, max_peel_rounds: int):
    """Vectorized driver-side FW-BW-MIN over int64 edge arrays — the
    identical peeling semantics as the distributed loop (pinned equal by
    test), with each propagation a C-kernel ``np.minimum.at`` pass
    instead of a cluster barrier."""
    ids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    alive = np.ones(len(ids), dtype=bool)
    scc = np.full(len(ids), -1, dtype=np.int64)
    ea = np.ones(len(si), dtype=bool)
    for _ in range(max_peel_rounds):
        if not alive.any():
            return ids, scc
        s, d = si[ea], di[ea]

        def prop(frm, to):
            lab = ids.copy()
            while True:
                prev = lab.copy()
                np.minimum.at(lab, to, lab[frm])
                if np.array_equal(lab, prev):
                    return lab

        f = prop(s, d)
        b = prop(d, s)
        done = alive & (f == b)
        scc[done] = f[done]
        alive &= ~done
        ea &= alive[si] & alive[di]
    raise RuntimeError(
        f"scc did not finish in {max_peel_rounds} peel rounds "
        "(adversarial id ordering, e.g. a long descending DAG chain); "
        "raise max_peel_rounds"
    )


def strongly_connected_components(
    edges: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    max_peel_rounds: int = 20,
    max_iters: int = 50,
    num_shards: int = 64,
    num_buckets: int = 32,
    small_graph_max_edges: int = 8_000_000,
) -> "ray.data.Dataset":
    """Directed (src, dst) int64 edge Dataset -> (node, scc_id) with
    scc_id = the component's minimum node id, for every endpoint.

    Small-graph fast path (the `ops/components.py` pattern): each
    FW/BW propagation is O(diameter) cluster barriers, pure fixed cost
    when the deduped edge table is a few MB.  Below
    ``small_graph_max_edges`` distinct edges the identical FW-BW-MIN
    peel runs driver-side in numpy (one ``minimum.at`` C pass per hop);
    above it, the BSP loop runs as before.  Pinned equal by test."""
    e = distinct_rows(
        edges.select_columns([src_column, dst_column]),
        [src_column, dst_column],
        num_shards=num_shards,
    ).map_batches(
        lambda df: pa.table(
            {
                "src": pa.array(
                    df[src_column].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "dst": pa.array(
                    df[dst_column].to_numpy(dtype=np.int64), type=pa.int64()
                ),
            }
        ),
        batch_format="pandas",
    )

    def with_self(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        allv = np.concatenate([s, d])
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, allv]), type=pa.int64()),
                "dst": pa.array(np.concatenate([d, allv]), type=pa.int64()),
            }
        )

    e_dedup = e.materialize()  # already distinct from the projection above
    if e_dedup.count() <= small_graph_max_edges:
        edf = e_dedup.to_pandas()  # bounded by the gate (int64 pairs)
        if edf.empty:
            return ray.data.from_arrow(_EMPTY)
        ids, scc = _scc_local(
            edf["src"].to_numpy(dtype=np.int64),
            edf["dst"].to_numpy(dtype=np.int64),
            max_peel_rounds,
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(ids, type=pa.int64()),
                    "scc_id": pa.array(scc, type=pa.int64()),
                }
            )
        )

    # self-edges keep every node present through propagation AND through
    # the unresolved-subgraph filter; dedup collapses the duplicates
    cur = distinct_rows(
        e_dedup.map_batches(with_self, batch_format="pyarrow"),
        ["src", "dst"],
        num_shards=num_shards,
    ).materialize()

    resolved_parts = []
    for _ in range(max_peel_rounds):
        if cur.count() == 0:
            break
        fwd = _min_propagate(cur, num_shards, num_buckets, max_iters)
        rev = cur.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
            batch_format="pyarrow",
        ).materialize()
        bwd = _min_propagate(rev, num_shards, num_buckets, max_iters)

        def tag(which):
            def f(batch: pa.Table, which=which) -> pa.Table:
                return batch.append_column(
                    "kind", pa.array([which] * batch.num_rows, type=pa.string())
                )

            return f

        def split(df: pd.DataFrame) -> pd.DataFrame:
            w = df.pivot_table(
                index="node", columns="kind", values="label", aggfunc="min"
            ).reset_index()
            done = w["f"].to_numpy() == w["b"].to_numpy()
            return pd.DataFrame(
                {
                    "node": w["node"].to_numpy(),
                    "scc_id": w["f"].to_numpy(),
                    "done": done,
                }
            )

        both = sharded_groupby_apply(
            fwd.map_batches(tag("f"), batch_format="pyarrow").union(
                bwd.map_batches(tag("b"), batch_format="pyarrow")
            ),
            ["node"],
            split,
            num_shards=num_shards,
        ).materialize()

        def take(done_value):
            def f(batch: pa.Table, dv=done_value) -> pa.Table:
                mask = batch["done"].to_numpy(zero_copy_only=False)
                kept = batch.filter(pa.array(mask == dv))
                cols = ["node", "scc_id"] if dv else ["node"]
                return kept.select(cols)

            return f

        resolved_parts.append(
            both.map_batches(take(True), batch_format="pyarrow").materialize()
        )
        unresolved = both.map_batches(
            take(False), batch_format="pyarrow"
        ).materialize()
        n_left = unresolved.count()
        if n_left == 0:
            break

        if n_left <= _BROADCAST_MAX_LABELS:
            keep = np.sort(
                unresolved.to_pandas()["node"].to_numpy(dtype=np.int64)
            )
            keep_ref = ray.put(keep)

            def filt(batch: pa.Table, keep_ref=keep_ref) -> pa.Table:
                ks = ray.get(keep_ref)
                s = batch["src"].to_numpy(zero_copy_only=False)
                d = batch["dst"].to_numpy(zero_copy_only=False)

                def member(x):
                    pos = np.minimum(np.searchsorted(ks, x), len(ks) - 1)
                    return ks[pos] == x

                return batch.filter(pa.array(member(s) & member(d)))

            cur = cur.map_batches(filt, batch_format="pyarrow").materialize()
        else:
            un_s = unresolved.map_batches(
                lambda b: b.rename_columns(["src"]), batch_format="pyarrow"
            )
            un_d = unresolved.map_batches(
                lambda b: b.rename_columns(["dst"]), batch_format="pyarrow"
            )
            cur = bucketed_hash_join(
                bucketed_hash_join(cur, un_s, on="src",
                                   num_buckets=num_buckets),
                un_d,
                on="dst",
                num_buckets=num_buckets,
            ).select_columns(["src", "dst"]).materialize()
    else:
        raise RuntimeError(
            f"scc did not finish in {max_peel_rounds} peel rounds "
            "(adversarial id ordering, e.g. a long descending DAG chain); "
            "raise max_peel_rounds"
        )

    if not resolved_parts:
        return ray.data.from_arrow(_EMPTY)
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda b: pa.table(
            {
                "node": pa.array(
                    b["node"].to_numpy(zero_copy_only=False), type=pa.int64()
                ),
                "scc_id": pa.array(
                    b["scc_id"].to_numpy(zero_copy_only=False),
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def condensation_edges(
    edges: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    num_shards: int = 64,
    num_buckets: int = 32,
    max_broadcast_labels: int = _BROADCAST_MAX_LABELS,
) -> "ray.data.Dataset":
    """Project the edge list onto SCC ids: ``(scc(src), scc(dst))``
    distinct, self-loops dropped — the condensation DAG.  Label attach
    is a broadcast lookup under ``max_broadcast_labels`` nodes (edges
    never shuffle), else two bucketed hash joins."""
    lab = labels.materialize()
    if lab.count() <= max_broadcast_labels:
        tabs = [t for t in ray.get(list(lab.to_arrow_refs())) if t.num_rows]
        full = pa.concat_tables(tabs)
        k = full["node"].combine_chunks().to_numpy(zero_copy_only=False)
        v = full["scc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(k)
        lut_ref = ray.put((k[order], v[order]))

        def relabel(batch: pa.Table, lut_ref=lut_ref) -> pa.Table:
            k, v = ray.get(lut_ref)
            s = v[np.searchsorted(
                k, batch[src_column].to_numpy(zero_copy_only=False)
            )]
            d = v[np.searchsorted(
                k, batch[dst_column].to_numpy(zero_copy_only=False)
            )]
            keep = s != d
            return pa.table(
                {
                    "src": pa.array(s[keep], type=pa.int64()),
                    "dst": pa.array(d[keep], type=pa.int64()),
                }
            )

        ce = edges.map_batches(relabel, batch_format="pyarrow")
    else:
        a = bucketed_hash_join(
            edges.select_columns([src_column, dst_column]),
            lab.map_batches(
                lambda b: pa.table(
                    {src_column: b["node"], "s_lab": b["scc_id"]}
                ),
                batch_format="pyarrow",
            ),
            on=src_column,
            num_buckets=num_buckets,
        )
        b = bucketed_hash_join(
            a,
            lab.map_batches(
                lambda t: pa.table(
                    {dst_column: t["node"], "d_lab": t["scc_id"]}
                ),
                batch_format="pyarrow",
            ),
            on=dst_column,
            num_buckets=num_buckets,
        )
        def drop_self(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.invert(pc.equal(t["s_lab"], t["d_lab"]))
            kept = t.filter(keep)
            return pa.table({"src": kept["s_lab"], "dst": kept["d_lab"]})

        ce = b.map_batches(drop_self, batch_format="pyarrow")
    return distinct_rows(ce, ["src", "dst"], num_shards=num_shards)


def dag_depth(
    edges: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    max_rounds: int = 64,
    num_shards: int = 64,
    num_buckets: int = 32,
    small_graph_max_edges: int = 8_000_000,
) -> int:
    """Longest path length (in edges) of a DAG — the layer count of the
    SCC condensation, schedule depth of a dependency graph.  Returns the
    scalar max depth (0 for an edgeless graph).

    depth(v) = max over in-edges of depth(u) + 1, relaxed level-
    synchronously until fixpoint; the depth sum is a strictly increasing
    convergence witness bounded by the true depth, so a cycle (not a
    DAG) blows past ``max_rounds`` and fails loudly instead of looping.
    Small graphs (the `_scc_local` gate) relax driver-side in numpy;
    above the gate each round is one label attach (broadcast under
    ``_BROADCAST_MAX_LABELS``, bucketed join above) + one dst-sharded
    vectorized max — the `_min_propagate` shape with (max, +1) in place
    of (min, id)."""
    e = distinct_rows(
        edges.select_columns([src_column, dst_column]),
        [src_column, dst_column],
        num_shards=num_shards,
    ).map_batches(
        lambda df: pa.table(
            {
                "src": pa.array(df[src_column].to_numpy(dtype=np.int64)),
                "dst": pa.array(df[dst_column].to_numpy(dtype=np.int64)),
            }
        ),
        batch_format="pandas",
    ).materialize()

    n_edges = e.count()
    if n_edges == 0:
        return 0
    if n_edges <= small_graph_max_edges:
        edf = e.to_pandas()
        s = edf["src"].to_numpy(dtype=np.int64)
        d = edf["dst"].to_numpy(dtype=np.int64)
        ids = np.unique(np.concatenate([s, d]))
        si, di = np.searchsorted(ids, s), np.searchsorted(ids, d)
        depth = np.zeros(len(ids), dtype=np.int64)
        for _ in range(max_rounds):
            prev = depth.copy()
            np.maximum.at(depth, di, depth[si] + 1)
            if np.array_equal(depth, prev):
                return int(depth.max())
        raise RuntimeError(
            f"dag_depth did not converge in {max_rounds} rounds — the "
            "graph has a cycle (condense SCCs first) or is deeper than "
            "the cap"
        )

    # distributed relaxation
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.chunked_array(
                    [
                        batch["src"].combine_chunks(),
                        batch["dst"].combine_chunks(),
                    ]
                )
            }
        )

    labels = distinct_rows(
        e.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        num_shards=num_shards,
    ).map_batches(
        lambda df: pa.table(
            {
                "node": pa.array(df["node"].to_numpy(dtype=np.int64)),
                "label": pa.array(
                    np.zeros(len(df), dtype=np.int64), type=pa.int64()
                ),
            }
        ),
        batch_format="pandas",
    ).materialize()

    def max_per_node(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", sort=False)["label"].max().reset_index()
        return out

    prev_sum = 0
    for _ in range(max_rounds):
        n_nodes = labels.count()
        if n_nodes <= _BROADCAST_MAX_LABELS:
            refs = labels.to_arrow_refs()
            cache: dict = {}

            def attach(batch: pa.Table, refs=refs, cache=cache) -> pa.Table:
                if "lut" not in cache:
                    tabs = [t for t in ray.get(list(refs)) if t.num_rows]
                    full = pa.concat_tables(tabs)
                    k = full["node"].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )
                    v = full["label"].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )
                    order = np.argsort(k)
                    cache["lut"] = (k[order], v[order])
                k, v = cache["lut"]
                s = batch["src"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                return pa.table(
                    {
                        "node": batch["dst"],
                        "label": pa.array(
                            v[np.searchsorted(k, s)] + 1, type=pa.int64()
                        ),
                    }
                )

            contribs = e.map_batches(attach, batch_format="pyarrow")
        else:
            renamed = labels.map_batches(
                lambda b: b.rename_columns(["src", "src_label"]),
                batch_format="pyarrow",
            )
            def plus_one(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table(
                    {"node": t["dst"], "label": pc.add(t["src_label"], 1)}
                )

            contribs = bucketed_hash_join(
                e, renamed, on="src", num_buckets=num_buckets
            ).map_batches(plus_one, batch_format="pyarrow")

        labels = sharded_groupby_apply(
            labels.union(contribs), ["node"], max_per_node,
            num_shards=num_shards,
        ).materialize()
        cur = labels.sum("label") or 0
        if cur == prev_sum:
            return int(labels.max("label") or 0)
        prev_sum = cur
    raise RuntimeError(
        f"dag_depth did not converge in {max_rounds} rounds — the "
        "graph has a cycle (condense SCCs first) or is deeper than "
        "the cap"
    )
