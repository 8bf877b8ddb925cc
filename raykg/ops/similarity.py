"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix, batch-local top-k partials, tiny global reduce.
Scale path: IVF-style coarse quantization (k-means-ish centroids from a
seeded sample) restricting the matmul to the probed partitions.

Determinism for oracle comparison: scores are rounded to 6 decimals and
ties break on ascending vec_id, on both the Ray and the SQL side.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor: holds the normalized query matrix; emits batch-local top-k.

    When ``probe_masks`` is given (IVF path), it is a (nq, nlist) boolean
    matrix and batches must carry an ``ivf_list`` column: each query only
    scores rows whose list is in ITS OWN probe set — true per-query IVF
    semantics, not a union over all queries."""

    def __init__(self, queries, query_ids, k: int,
                 embedding_column: str = "embedding", id_column: str = "vec_id",
                 probe_masks=None):
        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        if isinstance(probe_masks, ray.ObjectRef):
            probe_masks = ray.get(probe_masks)
        self.q = _normalize(np.asarray(queries, dtype=np.float64))
        self.query_ids = list(query_ids)
        self.k = k
        self.embedding_column = embedding_column
        self.id_column = id_column
        self.probe_masks = probe_masks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            })
        ids = np.asarray(batch[self.id_column].to_pylist())
        m = _normalize(np.array(batch[self.embedding_column].to_pylist(), dtype=np.float64))
        sims = m @ self.q.T  # (batch, nq)
        lists = (
            np.asarray(batch["ivf_list"].to_pylist(), dtype=np.int64)
            if self.probe_masks is not None
            else None
        )
        out = {"query_id": [], "vec_id": [], "score": []}
        for qi, qid in enumerate(self.query_ids):
            col = np.round(sims[:, qi], 6)
            if lists is not None:
                keep = self.probe_masks[qi][lists]
                if not keep.any():
                    continue
                col = col[keep]
                qids = ids[keep]
            else:
                qids = ids
            k = min(self.k, len(qids))
            # partial top-k within the batch; ties -> lower vec_id
            order = np.lexsort((qids, -col))[:k]
            out["query_id"].extend([qid] * len(order))
            out["vec_id"].extend(qids[order].tolist())
            out["score"].extend(col[order].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )


def topk_cosine(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids,
    k: int = 5,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    concurrency=2,
    probe_masks=None,
) -> "ray.data.Dataset":
    """Global top-k per query: batch-local partials -> groupby(query_id) ->
    exact top-k over the partials (k x num_blocks rows, tiny)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    kwargs = {
        "queries": qref,
        "query_ids": list(query_ids),
        "k": k,
        "embedding_column": embedding_column,
        "id_column": id_column,
    }
    if probe_masks is not None:
        kwargs["probe_masks"] = ray.put(np.asarray(probe_masks, dtype=bool))
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index + 1
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class IVFIndex:
    """IVF-style ANN: coarse centroids from a seeded driver-side sample;
    each vector is assigned to its nearest centroid partition; queries probe
    the ``nprobe`` nearest partitions only.

    The scale path for 100 TB: the assignment is a streaming map, the
    partition column feeds the same hash-partitioned writer as the graph
    tables, and a query touches nprobe/nlist of the data.
    """

    def __init__(self, nlist: int = 16, nprobe: int = 4, seed: int = 42):
        self.nlist = nlist
        self.nprobe = nprobe
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None

    def fit(self, ds: "ray.data.Dataset", embedding_column: str = "embedding",
            sample_rows: int = 4096) -> "IVFIndex":
        sample = ds.limit(sample_rows).to_pandas()
        m = _normalize(np.array(sample[embedding_column].tolist(), dtype=np.float64))
        rng = np.random.RandomState(self.seed)
        # a few rounds of Lloyd's algorithm on the sample
        idx = rng.choice(len(m), size=min(self.nlist, len(m)), replace=False)
        c = m[idx].copy()
        for _ in range(8):
            assign = (m @ c.T).argmax(axis=1)
            for j in range(len(c)):
                members = m[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def fit_distributed(
        self, ds: "ray.data.Dataset", embedding_column: str = "embedding",
        iters: int = 8, sample_rows: int = 4096,
    ) -> "IVFIndex":
        """Centroids from full-data distributed Lloyd passes
        (:func:`raykg.ops.kmeans.kmeans_fit`) instead of a driver-side
        sample — the 100 TB path: per-pass state is one (nlist, d)
        matrix, every vector participates, no driver materialization."""
        from .kmeans import kmeans_fit

        self.centroids = kmeans_fit(
            ds, embedding_column=embedding_column, k=self.nlist,
            iters=iters, seed=self.seed, sample_rows=sample_rows,
        )
        return self

    def assign(self, ds: "ray.data.Dataset", embedding_column: str = "embedding"):
        cref = ray.put(self.centroids)

        def add_list(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _normalize(np.array(batch[embedding_column].to_pylist(), dtype=np.float64))
            lists = (m @ c.T).argmax(axis=1)
            return batch.append_column("ivf_list", pa.array(lists, type=pa.int32()))

        return ds.map_batches(add_list, batch_format="pyarrow")

    def search(
        self,
        assigned: "ray.data.Dataset",
        queries: np.ndarray,
        query_ids,
        k: int = 5,
        embedding_column: str = "embedding",
        id_column: str = "vec_id",
    ) -> "ray.data.Dataset":
        q = _normalize(np.asarray(queries, dtype=np.float64))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, : self.nprobe]
        # union prune first (drops rows in NO query's probe set before the
        # matmul), then per-query probe masks inside the scoring actor so
        # each query scans only ITS nprobe lists — true IVF semantics
        probe_lists = sorted({int(x) for row in probes for x in row})
        nlist = len(self.centroids)
        masks = np.zeros((len(q), nlist), dtype=bool)
        for qi, row in enumerate(probes):
            masks[qi, row] = True

        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.is_in(batch["ivf_list"], pa.array(probe_lists, type=pa.int32()))
            )

        filtered = assigned.map_batches(keep, batch_format="pyarrow")
        return topk_cosine(
            filtered, q, query_ids, k=k,
            embedding_column=embedding_column, id_column=id_column,
            probe_masks=masks,
        )
