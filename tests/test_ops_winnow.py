"""Winnowing fingerprints: the paper's guarantee, edges, pair scoring."""

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.winnow import (
    _gram_hashes,
    _select,
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 4, 5


def _fps(texts, **kw):
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    return winnow_fingerprints(
        ray.data.from_pandas(df).repartition(3), k=K, window=W, **kw
    ).to_pandas()


def test_shared_run_guarantee(ray_session):
    """Any shared word run of >= W + K - 1 words yields a shared
    fingerprint (Schleimer et al. 2003, Theorem: winnowing correctness)."""
    rng = np.random.default_rng(7)
    run = " ".join(f"shared{i}" for i in range(W + K - 1))
    texts = []
    for d in range(12):
        left = " ".join(f"a{d}_{i}" for i in range(rng.integers(0, 30)))
        right = " ".join(f"b{d}_{i}" for i in range(rng.integers(0, 30)))
        texts.append(f"{left} {run} {right}".strip())
    out = _fps(texts)
    sets = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    for a in range(12):
        for b in range(a + 1, 12):
            assert sets[a] & sets[b], (a, b)


def test_fingerprints_are_subset_of_gram_hashes(ray_session):
    text = " ".join(f"w{i % 17}" for i in range(200))
    out = _fps([text])
    h = _gram_hashes(text, K)
    assert set(out["fp"]).issubset(set(h.tolist()))
    # density: expected 2/(w+1) of gram count; allow generous slack
    assert len(out) <= len(h)
    assert len(out) >= len(np.unique(h)) // (W + 1)
    # positions are 1-based gram indices pointing at their own hash
    for pos, fp in zip(out["pos"], out["fp"]):
        assert h[pos - 1] == fp


def test_short_and_empty_docs(ray_session):
    out = _fps(["", "   ", "one two", "a b c d e"])
    # empty/whitespace docs: no rows; a <K-word doc: exactly one
    # whole-text fingerprint at pos 1
    assert set(out["doc_id"]) == {2, 3}
    short = out[out["doc_id"] == 2]
    assert len(short) == 1 and short["pos"].iloc[0] == 1
    assert short["fp"].iloc[0] == _gram_hashes("one two", K)[0]
    # 5 words -> 2 grams < W: one whole-sequence window
    five = out[out["doc_id"] == 3]
    assert len(five) == 1


def test_rightmost_min_tie_break():
    # equal hashes in one window: rightmost index wins
    h = np.array([5, 1, 9, 1, 7], dtype=np.int64)
    sel = _select(h, 5)
    assert sel.tolist() == [3]
    # per-window mins as the window slides
    h2 = np.array([9, 8, 7, 6, 5, 4], dtype=np.int64)
    assert _select(h2, 3).tolist() == [2, 3, 4, 5]


def test_winnow_pairs_threshold_and_counts(ray_session):
    base = " ".join(f"tok{i}" for i in range(60))
    texts = [base, base + " extra trailing words here", "totally different "
             + " ".join(f"z{i}" for i in range(40))]
    df = pd.DataFrame({"doc_id": [10, 20, 30], "text": texts})
    got = winnow_pairs(
        ray.data.from_pandas(df).repartition(2), k=K, window=W, min_shared=2
    ).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == {(10, 20)}
    # shared count equals the distinct-fp intersection
    fps = winnow_fingerprints(
        ray.data.from_pandas(df), k=K, window=W
    ).to_pandas()
    s10 = set(fps[fps["doc_id"] == 10]["fp"])
    s20 = set(fps[fps["doc_id"] == 20]["fp"])
    assert got["shared"].iloc[0] == len(s10 & s20)


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice([f"w{j}" for j in range(30)], 50))
        for _ in range(20)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(20, dtype=np.int64), "text": texts}
    )
    outs = []
    for parts in (1, 7):
        out = (
            winnow_fingerprints(
                ray.data.from_pandas(df).repartition(parts), k=K, window=W
            )
            .to_pandas()
            .sort_values(["doc_id", "pos"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
