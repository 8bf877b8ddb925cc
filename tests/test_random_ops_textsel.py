"""Randomized (seeded) oracles for the text-selection ops added in
round 4: boilerplate_trim and dsir_weights must exactly match
single-process reference implementations on random corpora with
engineered duplication and skewed language mixes, across several seeds
and both physical plans."""

import hashlib
import random

import numpy as np
import pytest

import ray.data

from raykg.ops.boilerplate import boilerplate_trim, _doc_chunks
from raykg.ops.dsir import dsir_weights

VOCAB = ["the", "fast", "key", "sort", "merge", "data", "café", "straße",
         "row", "scan", "alpha", "beta"]


def make_corpus(n, seed, dup_rate=0.3):
    rng = random.Random(seed)
    snippets = [
        " ".join(rng.choice(VOCAB) for _ in range(5)) for _ in range(4)
    ]
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 30))]
        text = " ".join(words)
        if rng.random() < dup_rate:
            # inject a shared snippet at a chunk-aligned position
            k = rng.randrange(0, len(words) // 5 + 1) * 5
            text = " ".join(words[:k] + rng.choice(snippets).split(" ")
                            + words[k:])
        rows.append({"doc_id": i, "text": text,
                     "lang": rng.choice(["en", "en", "de", "zh"])})
    return rows


def ref_boilerplate(rows, chunk_words=5, min_docs=2):
    from collections import Counter

    per_doc = {r["doc_id"]: _doc_chunks(r["text"], chunk_words, False)
               for r in rows}
    counts = Counter()
    for chunks in per_doc.values():
        for c in set(chunks):
            if c.strip():
                counts[c] += 1
    dup = {c for c, k in counts.items() if k >= min_docs}
    out = {}
    for did, chunks in per_doc.items():
        kept = [c for c in chunks if c not in dup]
        out[did] = (" ".join(kept), len(chunks), len(chunks) - len(kept))
    return out


def ref_dsir(rows, n_buckets=4096):
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
@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("gate", [10**9, 0])
def test_boilerplate_random_oracle(seed, gate):
    rows = make_corpus(80, seed)
    want = ref_boilerplate(rows)
    got = (
        boilerplate_trim(ray.data.from_items(rows), broadcast_max=gate)
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(got) == len(rows)
    for did, (clean, nc, nr) in want.items():
        assert got.loc[did, "clean_text"] == clean, (seed, gate, did)
        assert int(got.loc[did, "n_chunks"]) == nc
        assert int(got.loc[did, "n_removed"]) == nr
    # the injected snippets must actually fire
    assert int(got["n_removed"].sum()) > 0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [11, 12])
def test_dsir_random_oracle(seed):
    rows = make_corpus(60, seed)
    want = ref_dsir(rows)
    got = (
        dsir_weights(ray.data.from_items(rows),
                     target_column="lang", target_value="en")
        .to_pandas()
        .set_index("doc_id")
    )
    for did, w in want.items():
        assert int(got.loc[did, "dsir_w"]) == w, (seed, did)
