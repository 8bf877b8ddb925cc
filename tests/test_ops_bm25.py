"""BM25 retrieval: brute-force reference parity, ordering, edge cases."""
import numpy as np
import pandas as pd
import ray.data

from raykg.ops.bm25 import bm25_topk

DOCS = [
    "cat dog cat fish",
    "dog dog dog",
    "cat cat cat cat bird",
    "fish",
    "bird bird cat",
    "",
]


def local_bm25(docs, terms, k, k1=1.5, b=0.75):
    toks = [d.split() for d in docs]
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks) / n
    dfs = {t: float(sum(1 for d in toks if t in d)) for t in terms}
    rows = []
    for i, d in enumerate(toks):
        s = 0.0
        hit = False
        for t in terms:
            tf = float(d.count(t))
            if tf == 0:
                continue
            hit = True
            ridf = (n - dfs[t] + 0.5) / (dfs[t] + 0.5)
            s += ridf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (len(d) / avgdl)))
        if hit:
            rows.append((i, round(s, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def run(docs, terms, k, nparts=3):
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ).repartition(nparts)
    out = bm25_topk(ds, terms, k=k, num_shards=4).to_pandas()
    if len(out) == 0:  # ray's to_pandas drops the schema of an empty result
        return []
    return list(zip(out["doc_id"], out["score"]))


def test_matches_reference(ray_session):
    got = run(DOCS, ["cat", "fish"], k=4)
    want = local_bm25(DOCS, ["cat", "fish"], k=4)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == w[1], (g, w)


def test_only_matching_docs_returned(ray_session):
    got = run(DOCS, ["bird"], k=10)
    assert sorted(g[0] for g in got) == [2, 4]


def test_no_hits(ray_session):
    assert run(DOCS, ["zebra"], k=5) == []


def test_partition_invariance(ray_session):
    assert run(DOCS, ["cat", "dog"], k=6, nparts=1) == run(
        DOCS, ["cat", "dog"], k=6, nparts=5
    )
