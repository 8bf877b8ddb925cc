"""gram_overlap: pure-set-arithmetic parity, pair coverage, mask contract."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.vocab import gram_overlap


def _grams(text, n=3):
    ws = text.split()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _reference(df, n=3):
    vocab = {}
    for s, g in df.groupby("source"):
        vocab[s] = set().union(*(_grams(t, n) for t in g["text"]))
    rows = {}
    keys = sorted(vocab)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                union = len(vocab[a] | vocab[b])
                rows[(a, b)] = (inter, union, round(inter / union, 6))
    return rows


def test_matches_set_arithmetic(ray_session):
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(30)]
    df = pd.DataFrame(
        {
            "source": rng.choice(["s1", "s2", "s3", "s4"], 80),
            "text": [
                " ".join(rng.choice(words, rng.integers(3, 25)))
                for _ in range(80)
            ],
        }
    )
    got = (
        gram_overlap(ray.data.from_pandas(df).repartition(7), "source", "text")
        .to_pandas()
        .set_index(["source_a", "source_b"])
    )
    want = _reference(df)
    assert set(got.index) == set(want)
    for key, (inter, union, jac) in want.items():
        row = got.loc[key]
        assert (row["inter"], row["union_n"]) == (inter, union)
        assert abs(row["jaccard"] - jac) < 1e-9


def test_disjoint_pair_omitted(ray_session):
    df = pd.DataFrame(
        {
            "source": ["a", "b"],
            "text": ["x1 x2 x3 x4", "y1 y2 y3 y4"],
        }
    )
    got = gram_overlap(ray.data.from_pandas(df), "source", "text").to_pandas()
    assert len(got) == 0


def test_too_many_slices_raises(ray_session):
    df = pd.DataFrame(
        {"source": [f"s{i}" for i in range(64)], "text": ["a b c d"] * 64}
    )
    with pytest.raises(ValueError, match="63"):
        gram_overlap(ray.data.from_pandas(df), "source", "text")
