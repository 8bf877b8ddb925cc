"""One-hop neighbor feature aggregation — the GNN message-passing primitive.

Graph-embedding / GNN feature pipelines repeatedly need "for every node,
an aggregate of its neighbors' features" (mean/sum/count — one
message-passing layer with sum-pool).  Expressed Ray-Data-first this is
exactly two exchanges, both on the house primitives:

1. attach the feature to the DESTINATION of every directed edge via the
   bucketed hash join (two large sides — the edge table and the node
   feature table both scale with the data, so no broadcast);
2. aggregate per SOURCE node via the sharded groupby (O(num_shards)
   engine groups; the per-node sums are one vectorized pandas groupby
   inside each shard).

The undirected case symmetrizes the canonical ``u < v`` edge list with a
column-swap union before step 1 (a rename per block, no shuffle).

Integer discipline: features are int64 and the mean is floor(sum / n) in
exact integer arithmetic, so results hash-match a SQL oracle bit-for-bit
(``CAST(SUM(f) AS BIGINT) // COUNT(*)`` in DuckDB) with no float drift.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .agg import sharded_groupby_apply
from .join import bucketed_hash_join


def symmetrize(
    edges: "ray.data.Dataset", u: str = "u", v: str = "v"
) -> "ray.data.Dataset":
    """Directed edge list in BOTH directions from a canonical undirected
    one — per-block column swap + union, no exchange."""

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({u: batch[v], v: batch[u]})

    return edges.select_columns([u, v]).union(
        edges.map_batches(swap, batch_format="pyarrow")
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
) -> "ray.data.Dataset":
    """Per node ``u``: neighbor count and floor-mean of the neighbors'
    integer feature.

    ``features`` must carry columns ``(v, feat_col)`` — one row per node,
    keyed by the same node id domain as the edge endpoints.  Output:
    ``(node, n_nbrs, mean_feat)``, all int64.  Undirected inputs are the
    canonical ``u < v`` edge list (``triangles.canonical_edges``);
    ``directed=True`` skips the symmetrization and aggregates over
    out-neighbors only.
    """
    e = edges if directed else symmetrize(edges, u=u, v=v)
    joined = bucketed_hash_join(
        e, features.select_columns([v, feat_col]), on=v, num_buckets=num_buckets
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(u, sort=False)[feat_col].agg(["sum", "size"])
        out = pd.DataFrame(
            {
                "node": g.index.to_numpy(),
                "n_nbrs": g["size"].to_numpy().astype("int64"),
                # exact integer floor-mean — matches SQL BIGINT // COUNT(*)
                "mean_feat": (
                    g["sum"].to_numpy().astype("int64")
                    // g["size"].to_numpy().astype("int64")
                ),
            }
        )
        return out

    return sharded_groupby_apply(
        joined.select_columns([u, feat_col]), [u], combine, num_shards=num_shards
    )
