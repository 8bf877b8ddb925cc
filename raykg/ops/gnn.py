"""One-hop neighbor feature aggregation — the GNN message-passing primitive.

Graph-embedding / GNN feature pipelines repeatedly need "for every node,
an aggregate of its neighbors' features" (mean/sum/count — one
message-passing layer with sum-pool).  Expressed Ray-Data-first:

1. symmetrize (undirected inputs) in the SAME map pass that reads the
   edge blocks — both directions are emitted per block, so the upstream
   edge-building lineage runs ONCE (a ``Dataset.union`` of a swap would
   re-execute it twice: Ray Data shares no common subexpressions);
2. attach the DESTINATION node's feature: below
   ``broadcast_max_nodes`` the feature table ships once via ``ray.put``
   (two numpy arrays, searchsorted lookup per batch); above it, the
   bucketed hash join handles two genuinely large sides — the same
   threshold-gated broadcast/sharded pairing as pagerank/components;
3. pre-aggregate ``(node, sum, count)`` partials inside each batch, then
   ONE node-sharded exchange folds them — the exchange carries partials
   (bounded by distinct nodes per batch), never raw messages.

The broadcast and join engines are pinned equal by test.

Integer discipline: features are int64 and the mean is floor(sum / n) in
exact integer arithmetic, so results hash-match a SQL oracle bit-for-bit
(``CAST(SUM(f) AS BIGINT) // COUNT(*)`` in DuckDB) with no float drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply
from .join import bucketed_hash_join

# feature rows below this broadcast as two numpy arrays (~32 MB at the
# threshold); above it the attach becomes a bucketed hash join
_BROADCAST_MAX_NODES = 2_000_000


def symmetrize(
    edges: "ray.data.Dataset", u: str = "u", v: str = "v"
) -> "ray.data.Dataset":
    """Directed edge list in BOTH directions from a canonical undirected
    one — one per-block concat pass (NOT a ``union`` of a swapped copy,
    which would execute the upstream edge-building plan twice)."""

    def both(batch: pa.Table) -> pa.Table:
        fwd = pa.table({u: batch[u], v: batch[v]})
        rev = pa.table({u: batch[v], v: batch[u]})
        return pa.concat_tables([fwd, rev])

    return edges.select_columns([u, v]).map_batches(both, batch_format="pyarrow")


def _partial(batch: pd.DataFrame, u: str, feat: str) -> pd.DataFrame:
    g = batch.groupby(u, sort=False)[feat].agg(["sum", "size"])
    return pd.DataFrame(
        {
            "node": g.index.to_numpy(),
            "n": g["size"].to_numpy().astype("int64"),
            "s": g["sum"].to_numpy().astype("int64"),
        }
    )


def neighbor_feature_mean(
    edges: "ray.data.Dataset",
    features: "ray.data.Dataset",
    feat_col: str,
    u: str = "u",
    v: str = "v",
    directed: bool = False,
    num_buckets: int = 64,
    num_shards: int = 64,
    broadcast_max_nodes: int = _BROADCAST_MAX_NODES,
    dedup_pairs: bool = False,
) -> "ray.data.Dataset":
    """Per node ``u``: neighbor count and floor-mean of the neighbors'
    integer feature.

    ``features`` must carry columns ``(v, feat_col)`` — one row per node,
    keyed by the same node id domain as the edge endpoints.  Output:
    ``(node, n_nbrs, mean_feat)``, all int64.  Undirected inputs are the
    canonical ``u < v`` edge list (``triangles.canonical_edges``);
    ``directed=True`` skips the symmetrization and aggregates over
    out-neighbors only.

    ``dedup_pairs=True`` accepts a NON-deduplicated pair stream (e.g.
    raw ``triangles.group_pairs`` output, where the same pair recurs
    across co-occurrence groups) and dedups it INSIDE the node-sharded
    exchange — all copies of ``(u, v)`` hash to the same shard, so one
    in-shard ``drop_duplicates`` replaces ``canonical_edges``' dedicated
    pair exchange, saving a full all-to-all.
    """
    if dedup_pairs:
        return _neighbor_mean_dedup(
            edges, features, feat_col, u, v, directed,
            num_buckets, num_shards, broadcast_max_nodes,
        )
    e = edges if directed else symmetrize(edges, u=u, v=v)

    n_feat = features.count()
    if n_feat <= broadcast_max_nodes:
        # broadcast engine: feature table as (sorted keys, values) arrays
        fdf = features.select_columns([v, feat_col]).to_pandas()
        keys = fdf[v].to_numpy()
        order = np.argsort(keys, kind="stable")
        ref = ray.put(
            (keys[order], fdf[feat_col].to_numpy().astype(np.int64)[order])
        )

        def attach_partial(batch: pa.Table) -> pd.DataFrame:
            ks, fs = ray.get(ref)
            if len(ks) == 0:
                return pd.DataFrame(
                    {"node": pd.Series([], dtype="int64"),
                     "n": pd.Series([], dtype="int64"),
                     "s": pd.Series([], dtype="int64")}
                )
            dst = batch[v].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ks, dst), len(ks) - 1)
            hit = ks[pos] == dst  # inner-join semantics: drop unknown nodes
            df = pd.DataFrame(
                {u: batch[u].to_numpy(zero_copy_only=False)[hit], "f": fs[pos[hit]]}
            )
            return _partial(df, u, "f")

        partials = e.map_batches(attach_partial, batch_format="pyarrow")
    else:
        # two genuinely large sides: bucketed hash join, then the same
        # per-batch partial pre-aggregation before the exchange
        joined = bucketed_hash_join(
            e, features.select_columns([v, feat_col]), on=v, num_buckets=num_buckets
        )
        partials = joined.map_batches(
            lambda df: _partial(df.rename(columns={feat_col: "f"}), u, "f"),
            batch_format="pandas",
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)[["s", "n"]].sum()
        return pd.DataFrame(
            {
                "node": g.index.to_numpy(),
                "n_nbrs": g["n"].to_numpy().astype("int64"),
                # exact integer floor-mean — matches SQL BIGINT // COUNT(*)
                "mean_feat": (
                    g["s"].to_numpy().astype("int64")
                    // g["n"].to_numpy().astype("int64")
                ),
            }
        )

    return sharded_groupby_apply(partials, ["node"], combine, num_shards=num_shards)


def _neighbor_mean_dedup(
    edges: "ray.data.Dataset",
    features: "ray.data.Dataset",
    feat_col: str,
    u: str,
    v: str,
    directed: bool,
    num_buckets: int,
    num_shards: int,
    broadcast_max_nodes: int,
) -> "ray.data.Dataset":
    """`neighbor_feature_mean` over a pair stream with cross-batch
    duplicates.

    Per-batch partials are impossible here — the same ``(u, v)`` pair can
    recur in different batches, so the exchange must carry the raw pairs
    (plus the attached int64 feature) keyed by ``u``.  All copies of a
    pair hash to the same shard, so one in-shard ``drop_duplicates``
    makes the aggregate exact: one all-to-all total, versus two for
    ``canonical_edges`` followed by the partials path.
    """
    e = edges if directed else symmetrize(edges, u=u, v=v)

    n_feat = features.count()
    if n_feat <= broadcast_max_nodes:
        fdf = features.select_columns([v, feat_col]).to_pandas()
        keys = fdf[v].to_numpy()
        order = np.argsort(keys, kind="stable")
        ref = ray.put(
            (keys[order], fdf[feat_col].to_numpy().astype(np.int64)[order])
        )

        def attach(batch: pa.Table) -> pd.DataFrame:
            ks, fs = ray.get(ref)
            if len(ks) == 0:
                return pd.DataFrame(
                    {u: pd.Series([], dtype="int64"),
                     v: pd.Series([], dtype="int64"),
                     "f": pd.Series([], dtype="int64")}
                )
            dst = batch[v].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ks, dst), len(ks) - 1)
            hit = ks[pos] == dst
            return pd.DataFrame(
                {
                    u: batch[u].to_numpy(zero_copy_only=False)[hit],
                    v: dst[hit],
                    "f": fs[pos[hit]],
                }
            )

        pairs = e.map_batches(attach, batch_format="pyarrow")
    else:
        joined = bucketed_hash_join(
            e, features.select_columns([v, feat_col]), on=v, num_buckets=num_buckets
        )
        pairs = joined.map_batches(
            lambda df: df[[u, v, feat_col]].rename(columns={feat_col: "f"}),
            batch_format="pandas",
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([u, v])
        g = d.groupby(u, sort=False)["f"].agg(["sum", "size"])
        return pd.DataFrame(
            {
                "node": g.index.to_numpy(),
                "n_nbrs": g["size"].to_numpy().astype("int64"),
                "mean_feat": (
                    g["sum"].to_numpy().astype("int64")
                    // g["size"].to_numpy().astype("int64")
                ),
            }
        )

    return sharded_groupby_apply(pairs, [u], combine, num_shards=num_shards)
