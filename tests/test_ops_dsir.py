"""ops/dsir: exact pin against a single-process reference implementation,
plus the selection property (target-like docs outrank others)."""

import hashlib

import numpy as np
import pytest

import ray.data

from raykg.ops.dsir import dsir_weights

ROWS = [
    {"doc_id": 0, "lang": "en", "text": "the cat sat on the mat"},
    {"doc_id": 1, "lang": "en", "text": "the dog ate the bone"},
    {"doc_id": 2, "lang": "de", "text": "der hund frisst den knochen"},
    {"doc_id": 3, "lang": "de", "text": "die katze sitzt auf der matte"},
    {"doc_id": 4, "lang": "en", "text": "the cat and the dog"},
]


def _ref_weights(rows, n_buckets=4096):
    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets

    def lq(x):
        return int(np.floor(np.log(float(x)) * 1_000_000))

    ct = np.zeros(n_buckets, np.int64)
    cr = np.zeros(n_buckets, np.int64)
    for r in rows:
        for tok in r["text"].split(" "):
            b = bucket(tok)
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    norm = lq(int(cr.sum()) + n_buckets) - lq(int(ct.sum()) + n_buckets)
    out = {}
    for r in rows:
        toks = r["text"].split(" ")
        w = sum(lq(ct[bucket(t)] + 1) - lq(cr[bucket(t)] + 1) for t in toks)
        out[r["doc_id"]] = w + len(toks) * norm
    return out


@pytest.mark.usefixtures("ray_session")
def test_dsir_matches_reference_and_discriminates():
    ds = ray.data.from_items(ROWS)
    got = (
        dsir_weights(ds, target_column="lang", target_value="en")
        .to_pandas()
        .set_index("doc_id")
    )
    want = _ref_weights(ROWS)
    for doc_id, w in want.items():
        assert int(got.loc[doc_id, "dsir_w"]) == w
    en = got.loc[[0, 1, 4], "dsir_w"].mean()
    de = got.loc[[2, 3], "dsir_w"].mean()
    assert en > de


def test_source_kl_identical_sources_zero_ish(ray_session):
    """Two groups with the same text distribution have (near-)equal
    kl_q; a vocabulary-disjoint group scores strictly higher; the
    statistic matches a direct numpy evaluation."""
    import numpy as np
    import pandas as pd
    import ray.data
    from raykg.ops.dsir import N_BUCKETS, _bucket, _lq, source_kl

    same = "alpha beta gamma delta epsilon " * 5
    other = "zeta eta theta iota kappa " * 5
    df = pd.DataFrame(
        {
            "source": ["a"] * 4 + ["b"] * 4 + ["c"] * 4,
            "text": [same.strip()] * 8 + [other.strip()] * 4,
        }
    )
    got = (
        source_kl(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    assert got.loc["a", "kl_q"] == got.loc["b", "kl_q"]
    assert got.loc["c", "kl_q"] > got.loc["a", "kl_q"]
    # direct reference for group c
    mat = np.zeros((2, N_BUCKETS), dtype=np.int64)
    for tok in (same.strip() + " ").split(" ")[:-1] * 8:
        mat[0, _bucket(tok, N_BUCKETS)] += 1
    for tok in (other.strip() + " ").split(" ")[:-1] * 4:
        mat[1, _bucket(tok, N_BUCKETS)] += 1
    corpus = mat.sum(axis=0)
    row = mat[1]
    want = int(
        (
            (row + 1)
            * (
                _lq(row + 1)
                - int(_lq([int(row.sum()) + N_BUCKETS])[0])
                - _lq(corpus + 1)
                + int(_lq([int(corpus.sum()) + N_BUCKETS])[0])
            )
        ).sum()
    )
    assert got.loc["c", "kl_q"] == want
    assert got.loc["c", "n_tokens"] == row.sum()
