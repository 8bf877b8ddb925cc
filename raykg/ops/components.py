"""Connected components over a pair Dataset — duplicate-cluster formation.

The near-dup operators (``ops/dedup.py``) emit PAIRS; a training-data
pipeline needs CLUSTERS ("these 17 docs are all the same boilerplate; keep
one").  Pairs form an undirected graph; a cluster is a connected component,
canonically labeled by its minimum doc id.

Algorithm: iterative min-label propagation (the standard BSP / Pregel
formulation — label(v) <- min(label(v), min over neighbors' labels) until
fixpoint), expressed in Ray Data:

- the edge list is symmetrized once (+ self-edges) and materialized —
  it is candidate-pair-volume sized, NOT corpus sized;
- one iteration = attach each edge's head label (broadcast lookup for the
  common case, bucketed hash join above ``_BROADCAST_MAX_LABELS`` nodes)
  then ``groupby(src).min`` — a candidate-volume shuffle;
- labels only ever decrease, so ``sum(labels)`` is a strictly decreasing
  convergence witness; iteration stops when it stops changing.  Rounds
  needed = graph diameter; near-dup components are dense (LSH emits most
  of the clique), so 2–3 rounds is typical and the cap is a safety rail.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

_BROADCAST_MAX_LABELS = 2_000_000  # ~32 MB of int64 pairs


def connected_components(
    pairs: "ray.data.Dataset",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    num_buckets: int = 32,
    num_shards: int = 64,
    small_graph_max_edges: int = 8_000_000,
) -> "ray.data.Dataset":
    """(id_a, id_b) pair Dataset -> (doc_id, cluster_id) with cluster_id =
    min doc id of the connected component.  Every id appearing in a pair is
    labeled; singletons (docs in no pair) are absent by construction —
    their cluster is themselves.

    Small-graph fast path: the near-dup pair graph is usually orders of
    magnitude smaller than the corpus (it holds candidate PAIRS, not docs),
    and each BSP round costs two cluster-wide barriers — pure fixed cost
    when the edge table is a few MB.  Below ``small_graph_max_edges``
    symmetrized edges (int64 pairs; 8M ≈ 128 MB) the component labels are
    computed in one driver-side union-find pass over the already
    materialized edge table instead of O(diameter) barrier rounds; above
    it, the BSP min-label loop runs as before.  Both engines produce the
    identical (doc_id, min-id cluster) table — pinned by test."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[id_a].to_pylist(), dtype=np.int64)
        b = np.asarray(batch[id_b].to_pylist(), dtype=np.int64)
        # both directions + self-edges keep every node present and make
        # min-propagation symmetric
        src = np.concatenate([a, b, a, b])
        dst = np.concatenate([b, a, a, b])
        return pa.Table.from_pydict(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    if edges.count() <= small_graph_max_edges:
        edf = edges.to_pandas()  # bounded by the gate (int64 pairs)
        if edf.empty:
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "doc_id": pa.array([], type=pa.int64()),
                        "cluster_id": pa.array([], type=pa.int64()),
                    }
                )
            )
        src = edf["src"].to_numpy(dtype=np.int64)
        dst = edf["dst"].to_numpy(dtype=np.int64)
        ids = np.unique(src)  # symmetrize guarantees every node appears as src
        si = np.searchsorted(ids, src)
        di = np.searchsorted(ids, dst)
        lab = ids.copy()
        # vectorized min-label propagation with pointer jumping: each round
        # is one scatter-min over the edge arrays plus one label-chase, so
        # rounds needed is O(log diameter), all in C kernels
        while True:
            prev = lab.copy()
            np.minimum.at(lab, di, lab[si])
            lab = np.minimum(lab, lab[np.searchsorted(ids, lab)])
            if np.array_equal(lab, prev):
                break
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "cluster_id": pa.array(lab, type=pa.int64()),
                }
            )
        )

    from .agg import sharded_groupby_apply

    def min_per_src(df: pd.DataFrame) -> pd.DataFrame:
        # sharded (ops/agg.py): node count scales with candidate volume, so
        # a key-wise Ray aggregate would pay per-node Python overhead
        out = df.groupby("src", sort=False)[df.columns[1]].min().reset_index()
        out.columns = ["src", "label"]
        return out

    # initial label: min neighbor (self included)
    labels = sharded_groupby_apply(edges, ["src"], min_per_src, num_shards=num_shards)

    def label_sum(lab: "ray.data.Dataset"):
        row = lab.aggregate(Sum("label", alias_name="s"))
        s = row["s"] if row else None
        return None if s is None else int(s)

    prev = label_sum(labels)
    if prev is None:  # no pairs at all -> no clustered docs (empty table)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            )
        )
    converged = False
    for _ in range(max_iters):
        labels = labels.materialize()  # consumed twice: attach + sum
        n_nodes = labels.count()
        if n_nodes <= _BROADCAST_MAX_LABELS:
            refs = labels.to_arrow_refs()
            cache: dict = {}

            def attach(batch: pa.Table, refs=refs, cache=cache) -> pa.Table:
                if "lut" not in cache:
                    tabs = [t for t in ray.get(list(refs)) if t.num_rows]
                    full = pa.concat_tables(tabs)
                    k = full["src"].combine_chunks().to_numpy(zero_copy_only=False)
                    v = full["label"].combine_chunks().to_numpy(zero_copy_only=False)
                    order = np.argsort(k)
                    cache["lut"] = (k[order], v[order])
                k, v = cache["lut"]
                dst = (
                    batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                )
                # every dst is a node (self-edges guarantee presence)
                lab = v[np.searchsorted(k, dst)]
                return pa.Table.from_pydict(
                    {
                        "src": batch["src"],
                        "dst_label": pa.array(lab, type=pa.int64()),
                    }
                )

            relabeled = edges.map_batches(attach, batch_format="pyarrow")
        else:
            from .join import bucketed_hash_join

            renamed = labels.map_batches(
                lambda b: b.rename_columns(["dst", "dst_label"]),
                batch_format="pyarrow",
            )
            relabeled = bucketed_hash_join(
                edges, renamed, on="dst", num_buckets=num_buckets
            ).drop_columns(["dst"])

        labels = sharded_groupby_apply(
            relabeled, ["src"], min_per_src, num_shards=num_shards
        )
        cur = label_sum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur

    if not converged:
        # silent non-convergence would make dedup_survivors keep/drop the
        # wrong docs — fail loudly; diameter > max_iters means a chain
        # component longer than the rail, raise the cap for such graphs
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(a component's diameter exceeds max_iters); raise max_iters"
        )

    return labels.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
    )


def dedup_survivors(
    ds: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Drop every clustered doc except its cluster's canonical (min-id)
    representative; docs in no cluster pass through.  The cluster table is
    near-dup-volume sized, so the drop set ships as one broadcast array."""
    drop = clusters.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "d": pa.compute.filter(
                    b[id_column].combine_chunks(),
                    pa.compute.not_equal(b[id_column], b["cluster_id"]),
                )
            }
        ),
        batch_format="pyarrow",
    )
    drop_ids: set = set()
    for b in drop.iter_batches(batch_format="pyarrow"):
        drop_ids.update(b["d"].to_pylist())
    ref = ray.put(np.asarray(sorted(drop_ids), dtype=np.int64))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = pa.array(ray.get(ref), type=batch[id_column].type)
        return batch.filter(
            pc.invert(pc.is_in(batch[id_column], value_set=bad))
        )

    return ds.map_batches(keep, batch_format="pyarrow")
