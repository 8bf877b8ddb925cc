"""ANN recall harness (round-4 verdict item 10).

Measures IVF recall@k vs brute-force cosine top-k at nprobe < nlist on a
deterministic synthetic embedding table large enough for the coarse
quantizer to matter (the sf tables top out at 2k vectors).  Clustered
Gaussian blobs are the standard recall benchmark shape: IVF recall on
uniform random data is meaningless (no cluster structure to exploit).

Writes one JSON artifact with recall@k per (nlist, nprobe) setting plus
the probed-data fraction, and prints it.

Usage: python scripts/ann_recall.py [--out BENCH/ann_recall_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VECS = 50_000
DIM = 32
N_BLOBS = 64
N_QUERIES = 20
K = 10
SEED = 7


def make_table(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(SEED)
    centers = rng.randn(N_BLOBS, DIM) * 4.0
    labels = rng.randint(0, N_BLOBS, size=N_VECS)
    vecs = centers[labels] + rng.randn(N_VECS, DIM)
    t = pa.Table.from_pydict({
        "vec_id": pa.array(np.arange(N_VECS), type=pa.int64()),
        "embedding": pa.array(vecs.astype(np.float32).tolist(),
                              type=pa.list_(pa.float32())),
    })
    pq.write_table(t, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH/ann_recall_r04.json")
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")

    from raykg.ops.similarity import IVFIndex, topk_cosine

    tmp = os.path.join(tempfile.gettempdir(), "raykg_ann_recall.parquet")
    make_table(tmp)
    emb = ray.data.read_parquet(tmp)

    rng = np.random.RandomState(SEED + 1)
    qidx = rng.choice(N_VECS, size=N_QUERIES, replace=False)
    import pyarrow.parquet as pq
    full = pq.read_table(tmp)
    allvecs = np.array(full["embedding"].to_pylist(), dtype=np.float64)
    queries = allvecs[qidx]
    qids = list(range(N_QUERIES))

    truth = topk_cosine(emb, queries, qids, k=K).to_pandas()
    true_sets = {
        qid: set(g.sort_values("rank")["vec_id"].head(K))
        for qid, g in truth.groupby("query_id")
    }

    results = []
    for nlist, nprobe in [(32, 8), (32, 4), (64, 16), (64, 8)]:
        idx = IVFIndex(nlist=nlist, nprobe=nprobe).fit_distributed(
            emb, iters=6)
        assigned = idx.assign(emb).materialize()
        out = idx.search(assigned, queries, qids, k=K).to_pandas()
        hits = tot = 0
        for qid in qids:
            got = set(out[out["query_id"] == qid]
                      .sort_values("rank")["vec_id"].head(K))
            hits += len(got & true_sets[qid])
            tot += len(true_sets[qid])
        recall = hits / tot
        results.append({
            "nlist": nlist, "nprobe": nprobe,
            "probe_fraction": nprobe / nlist,
            "recall_at_10": round(recall, 4),
        })
        print(f"nlist={nlist} nprobe={nprobe} recall@10={recall:.4f}")

    artifact = {
        "harness": "scripts/ann_recall.py",
        "n_vecs": N_VECS, "dim": DIM, "n_blobs": N_BLOBS,
        "n_queries": N_QUERIES, "k": K, "seed": SEED,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    ray.shutdown()


if __name__ == "__main__":
    main()
