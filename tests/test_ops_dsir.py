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
