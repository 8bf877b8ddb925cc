"""Token lift pairs: brute-force parity, thresholds, partition invariance."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.assoc import token_lift_pairs


DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "red cat sat",
            "red cat ran",
            "blue cat sat",
            "red dog sat",
            "blue  dog",          # double space -> empty token dropped
            "red cat cat sat",    # in-doc repeat counts once
        ],
    }
)


def _brute(docs, min_df, min_co):
    sets = {r.doc_id: set(t for t in r.text.split(" ") if t)
            for r in docs.itertuples()}
    df: dict = {}
    for s in sets.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    vocab = {t for t, c in df.items() if c >= min_df}
    co: dict = {}
    for s in sets.values():
        for u, v in itertools.combinations(sorted(s & vocab), 2):
            co[(u, v)] = co.get((u, v), 0) + 1
    n = len(docs)
    return {
        k: (c, float(n) * c / (df[k[0]] * df[k[1]]))
        for k, c in co.items()
        if c >= min_co
    }


def _got(ds):
    out = ds.to_pandas()
    return {(r.u, r.v): (r.n_co, r.lift) for r in out.itertuples()}


@pytest.mark.parametrize("min_df,min_co", [(1, 1), (2, 1), (2, 2), (3, 2)])
def test_matches_brute_force(ray_session, min_df, min_co):
    got = _got(
        token_lift_pairs(
            ray.data.from_pandas(DOCS), min_df=min_df, min_co=min_co,
            num_shards=4,
        )
    )
    want = _brute(DOCS, min_df, min_co)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1])


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(31)
    words = ["a", "b", "c", "d", "e", "f", "g"]
    docs = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": [
                " ".join(rng.choice(words, rng.integers(2, 6)))
                for _ in range(60)
            ],
        }
    )
    one = _got(token_lift_pairs(ray.data.from_pandas(docs),
                                min_df=3, min_co=2, num_shards=2))
    many = _got(token_lift_pairs(ray.data.from_pandas(docs).repartition(9),
                                 min_df=3, min_co=2, num_shards=8))
    assert one == many
    assert len(one) > 0
