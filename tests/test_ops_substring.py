"""Exact-substring (duplicate k-gram span) dedup — ops/substring.py
checked against a naive single-process reference on small corpora."""

import numpy as np
import pytest

import ray
import ray.data

from raykg.ops.substring import (
    drop_duplicate_spans,
    duplicate_hits,
    duplicate_span_stats,
)

K = 3


def naive(docs, k=K, min_docs=2):
    """gram-string truth: hits, per-doc stats, cleaned text."""
    toks = {d: (t or "").split() for d, t in docs}
    gram_docs = {}
    for d, ws in toks.items():
        for i in range(len(ws) - k + 1):
            gram_docs.setdefault(tuple(ws[i : i + k]), set()).add(d)
    dup = {g for g, s in gram_docs.items() if len(s) >= min_docs}
    hits = {
        d: [i for i in range(len(ws) - k + 1) if tuple(ws[i : i + k]) in dup]
        for d, ws in toks.items()
    }
    stats = {}
    for d, ps in hits.items():
        if not ps:
            continue
        spans = []
        for p in ps:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        stats[d] = (
            len(ps),
            len(spans),
            sum(e - s for s, e in spans),
        )
    clean = {}
    for d, ws in toks.items():
        covered = set()
        for p in hits[d]:
            covered.update(range(p, p + k))
        clean[d] = " ".join(w for i, w in enumerate(ws) if i not in covered)
    return hits, stats, clean


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown fox jumps far away"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "completely unrelated words here nothing shared at all"),
    (5, "short doc"),
    (6, ""),
    (7, "shared tail ending phrase one two three"),
    (8, "another doc with ending phrase one two three"),
]


def _ds(docs, nparts=4):
    return ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs]
    ).repartition(nparts)


@pytest.mark.usefixtures("ray_session")
class TestSubstringDedup:
    def test_hits_match_naive(self):
        hits_ref, _, _ = naive(DOCS)
        out = duplicate_hits(_ds(DOCS), k=K, num_buckets=8).to_pandas()
        got = {
            d: sorted(g["pos"]) for d, g in out.groupby("doc_id")
        }
        want = {d: ps for d, ps in hits_ref.items() if ps}
        assert got == want

    def test_stats_match_naive(self):
        _, stats_ref, _ = naive(DOCS)
        out = duplicate_span_stats(_ds(DOCS), k=K, num_buckets=8).to_pandas()
        got = {
            int(r.doc_id): (int(r.n_dup_grams), int(r.n_dup_spans), int(r.dup_tokens))
            for r in out.itertuples()
        }
        assert got == stats_ref

    def test_drop_spans_match_naive(self):
        _, _, clean_ref = naive(DOCS)
        out = drop_duplicate_spans(_ds(DOCS), k=K, num_buckets=8).to_pandas()
        got = dict(zip(out["doc_id"].astype(int), out["clean_text"]))
        assert got == clean_ref

    def test_partition_invariance(self):
        a = (
            duplicate_span_stats(_ds(DOCS, 1), k=K, num_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            duplicate_span_stats(_ds(DOCS, 7), k=K, num_buckets=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_in_doc_repeat_needs_two_docs(self):
        # a gram repeated inside ONE doc is not a duplicate (min_docs=2
        # counts distinct docs) ...
        solo = [(1, "x y z w x y z w"), (2, "totally different words here")]
        assert duplicate_span_stats(_ds(solo), k=K, num_buckets=4).count() == 0
        # ... but every occurrence (incl. in-doc repeats) of a gram shared
        # ACROSS docs is flagged
        shared = [(1, "x y z w x y z"), (2, "x y z only once")]
        out = duplicate_hits(_ds(shared), k=K, num_buckets=4).to_pandas()
        assert sorted(out[out["doc_id"] == 1]["pos"]) == [0, 4]

    def test_all_tokens_covered_empty_clean(self):
        docs = [(1, "a b c"), (2, "a b c")]
        out = drop_duplicate_spans(_ds(docs), k=K, num_buckets=4).to_pandas()
        assert set(out["clean_text"]) == {""}

    def test_fuzz_vs_naive(self):
        rng = np.random.default_rng(7)
        vocab = ["w%d" % i for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 30)))))
            for i in range(40)
        ]
        _, stats_ref, clean_ref = naive(docs)
        stats = duplicate_span_stats(_ds(docs, 6), k=K, num_buckets=8).to_pandas()
        got = {
            int(r.doc_id): (int(r.n_dup_grams), int(r.n_dup_spans), int(r.dup_tokens))
            for r in stats.itertuples()
        }
        assert got == stats_ref
        clean = drop_duplicate_spans(_ds(docs, 6), k=K, num_buckets=8).to_pandas()
        assert dict(zip(clean["doc_id"].astype(int), clean["clean_text"])) == clean_ref
