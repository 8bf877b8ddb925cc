"""Per-doc duplicate-n-gram rate: exact counts, edges, invariance."""

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.novelty import _distinct_gram_hashes, dup_gram_rate

N = 5


def _run(texts, parts=3):
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    return (
        dup_gram_rate(ray.data.from_pandas(df).repartition(parts), n=N)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_exact_rates(ray_session):
    shared = " ".join(f"s{i}" for i in range(20))   # 16 distinct 5-grams
    uniq_a = " ".join(f"a{i}" for i in range(10))   # 6 distinct 5-grams
    out = _run([f"{shared} {uniq_a}", shared, "totally different words here now"])
    d0 = out[out["doc_id"] == 0].iloc[0]
    d1 = out[out["doc_id"] == 1].iloc[0]
    d2 = out[out["doc_id"] == 2].iloc[0]
    # doc1's grams are all inside doc0 -> rate 1.0
    assert d1["dup_grams"] == d1["n_grams"] and d1["dup_rate"] == 1.0
    # doc0 shares exactly doc1's 16 grams (the seam grams mix s/a words
    # and are unique); doc0 has 31 - 4 = 27? compute from the kernel
    h0 = set(_distinct_gram_hashes(f"{shared} {uniq_a}", N).tolist())
    h1 = set(_distinct_gram_hashes(shared, N).tolist())
    assert d0["n_grams"] == len(h0)
    assert d0["dup_grams"] == len(h0 & h1)
    # doc2 shares nothing
    assert d2["dup_grams"] == 0 and d2["dup_rate"] == 0.0


def test_short_and_empty_docs(ray_session):
    out = _run(["", "one two", "one two", "three"])
    assert set(out["doc_id"]) == {1, 2, 3}
    # the two identical short docs are each other's duplicates
    assert out[out["doc_id"] == 1]["dup_rate"].iloc[0] == 1.0
    assert out[out["doc_id"] == 2]["dup_rate"].iloc[0] == 1.0
    assert out[out["doc_id"] == 3]["dup_rate"].iloc[0] == 0.0
    assert (out["n_grams"] == 1).all()


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(17)
    texts = [
        " ".join(f"w{j}" for j in rng.integers(0, 25, 40)) for _ in range(18)
    ]
    a = _run(texts, parts=1)
    b = _run(texts, parts=7)
    pd.testing.assert_frame_equal(a, b)
