"""Distributed PageRank over an edge Dataset (fixed iteration count).

Parity note: the reference plugin has no graph analytics; this is one of
the KG-construction extras the target engine adds on top of the edge
table it builds (`pipeline/graph.triples_to_edges`).

Semantics (the textbook damped random surfer, Brin & Page 1998):

    pr(v) = (1-d)/N  +  d * dangling_mass/N  +  d * sum_{u->v} pr(u)/outdeg(u)

where ``dangling_mass`` is the total rank sitting on nodes with no
out-edges (redistributed uniformly, so ranks sum to 1 every iteration).
The iteration count is FIXED (not convergence-tested) so the result is
deterministic and exactly mirrorable in unrolled SQL for the oracle.

Scale shape — exactly TWO exchanges per iteration:

1. **Contribution join** — one bucketed hash join attaches the current
   ``(rank, outdeg)`` to the edge table on ``src``; the joined rows carry
   two ids and two doubles — never node payloads.
2. **Fused reduce + fold** — contribution rows (keyed by destination)
   union with the state rows into ONE node-sharded exchange; inside each
   shard a vectorized kernel sums contributions per node, left-aligns
   them onto the state rows, and applies the damping formula.  A separate
   per-dst aggregate followed by a state join would re-shuffle the same
   rows on the same key.

Setup is two more exchanges: parallel-edge dedup, then a single
node-sharded pass over the endpoint rows that derives the node set, the
out-degrees, and the uniform initial ranks together.

The state table ``(node, rank, outdeg)`` is node-set-sized and is
materialized between iterations (the only way to iterate a lazy
Dataset); the edge projection is materialized ONCE and re-read from the
object store each iteration instead of recomputing its upstream
pipeline.  The dangling mass is the only driver-side value — one float
per iteration, reduced via per-batch partials.  Nothing corpus-scale
ever lands on the driver, so the op survives a node set that is itself
sharded across the cluster.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .agg import sharded_groupby_apply
from .join import bucketed_hash_join
from .setops import distinct_rows


def _arrow(ds: "ray.data.Dataset", schema) -> "ray.data.Dataset":
    """Re-block as typed Arrow: the sharded aggregates emit pandas blocks,
    whose numpy-dtype schema the bucketed join (which pads with typed
    nulls) cannot consume."""

    def conv(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {n: pa.array(df[n], type=t, from_pandas=True) for n, t in schema.items()}
        )

    return ds.map_batches(conv, batch_format="pandas")


_STATE_SCHEMA = {"node": pa.string(), "outdeg": pa.float64(), "pr": pa.float64()}


def pagerank(
    edges: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    num_shards: int = 64,
    dedup_edges: bool = True,
) -> "ray.data.Dataset":
    """Rank every node of the directed graph ``(src_column, dst_column)``.

    Returns a Dataset with columns ``node`` (str) and ``pr`` (float64,
    full precision — round at the consumer if hashing).  Parallel edges
    are collapsed to one (``dedup_edges``) so a repeated triple does not
    multiply its endpoint's influence; self-loops count like any edge.
    """
    e = edges.select_columns([src_column, dst_column])
    if dedup_edges:
        e = distinct_rows(e, [src_column, dst_column], num_shards=num_shards)
    e = _arrow(
        e, {src_column: pa.string(), dst_column: pa.string()}
    ).materialize()  # reused every iteration; two-id rows only

    # One node-sharded pass derives node set + out-degree + uniform init:
    # src endpoints carry is_out=1 (e is parallel-edge-free, so the count
    # of out-rows per node IS the out-degree), dst endpoints is_out=0.
    def endpoints(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": pa.chunked_array(
                    [batch[src_column].combine_chunks(), batch[dst_column].combine_chunks()]
                ),
                "is_out": pa.array(
                    np.concatenate([np.ones(n), np.zeros(n)]), type=pa.float64()
                ),
            }
        )

    def degree_shard(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("node", sort=False, as_index=False)["is_out"]
            .sum()
            .rename(columns={"is_out": "outdeg"})
        )

    pre_state = sharded_groupby_apply(
        e.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        degree_shard,
        num_shards=num_shards,
    ).materialize()
    n = pre_state.count()
    if n == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {"node": pd.Series([], dtype=str), "pr": pd.Series([], dtype=float)}
            )
        )

    def init_state(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(df["node"], type=pa.string()),
                "outdeg": pa.array(df["outdeg"], type=pa.float64()),
                "pr": pa.array(np.full(len(df), 1.0 / n), type=pa.float64()),
            }
        )

    state = pre_state.map_batches(init_state, batch_format="pandas").materialize()

    def dangling_partial(batch: pa.Table) -> pa.Table:
        od = batch["outdeg"].to_numpy(zero_copy_only=False)
        pr = batch["pr"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([float(pr[od == 0.0].sum())])})

    def contrib(batch: pa.Table) -> pa.Table:
        pr = batch["pr"].to_numpy(zero_copy_only=False)
        od = batch["outdeg"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch[dst_column],
                "outdeg": pa.nulls(batch.num_rows, type=pa.float64()),
                "pr": pa.array(pr / od, type=pa.float64()),
                "kind": pa.array(["c"] * batch.num_rows),
            }
        )

    def tag_state(batch: pa.Table) -> pa.Table:
        return batch.append_column("kind", pa.array(["s"] * batch.num_rows))

    for _ in range(iters):
        dangling = (
            state.map_batches(dangling_partial, batch_format="pyarrow").sum("s")
            or 0.0
        )
        contribs = bucketed_hash_join(
            e,
            state.map_batches(
                lambda b: pa.table(
                    {src_column: b["node"], "pr": b["pr"], "outdeg": b["outdeg"]}
                ),
                batch_format="pyarrow",
            ),
            on=src_column,
            num_buckets=num_shards,
        ).map_batches(contrib, batch_format="pyarrow")

        base = (1.0 - damping) / n + damping * dangling / n

        def fold_shard(df: pd.DataFrame, base=base) -> pa.Table:
            s = df[df["kind"] == "s"]
            c = df[df["kind"] == "c"].groupby("node", sort=False)["pr"].sum()
            folded = base + damping * s["node"].map(c).fillna(0.0).to_numpy()
            return pa.table(
                {
                    "node": pa.array(s["node"], type=pa.string()),
                    "outdeg": pa.array(s["outdeg"], type=pa.float64()),
                    "pr": pa.array(folded, type=pa.float64()),
                }
            )

        state = sharded_groupby_apply(
            state.map_batches(tag_state, batch_format="pyarrow").union(contribs),
            ["node"],
            fold_shard,
            num_shards=num_shards,
        ).materialize()

    return _arrow(state, _STATE_SCHEMA).select_columns(["node", "pr"])
