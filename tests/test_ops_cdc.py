"""Content-defined chunking: boundary semantics, edit locality, stats."""

import hashlib

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.cdc import _word_is_boundary, cdc_chunks, cdc_dedup_stats

D = 8


def _chunks(texts, parts=3):
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    return (
        cdc_chunks(ray.data.from_pandas(df).repartition(parts), divisor=D)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def test_boundary_rule_and_coverage(ray_session):
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in rng.integers(0, 200, 300)]
    text = " ".join(words)
    out = _chunks([text])
    # chunks cover the document exactly, in order
    assert out["n_words"].sum() == 300
    assert out["chunk_idx"].tolist() == list(range(1, len(out) + 1))
    # every chunk except possibly the last ends on a boundary word
    bnd = _word_is_boundary(words, D)
    ends = np.cumsum(out["n_words"].to_numpy()) - 1
    assert bnd[ends[:-1]].all()
    # interior words of every chunk are non-boundaries
    starts = np.r_[0, ends[:-1] + 1]
    for s, e in zip(starts, ends):
        assert not bnd[s:e].any()


def test_edit_locality(ray_session):
    """Inserting one word changes only the chunk it lands in — every
    other chunk hash is preserved (the CDC property fixed-size chunking
    lacks)."""
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in rng.integers(0, 500, 400)]
    base = " ".join(words)
    edited = " ".join(words[:200] + ["INSERTED"] + words[200:])
    out = _chunks([base, edited])
    h0 = set(out[out["doc_id"] == 0]["chunk_hash"])
    h1 = set(out[out["doc_id"] == 1]["chunk_hash"])
    # all but at most 2 of the original chunks survive (the touched chunk
    # before and after; 2 if INSERTED is itself a boundary word)
    assert len(h0 - h1) <= 2
    assert len(h1 - h0) <= 2


def test_empty_and_single_word(ray_session):
    out = _chunks(["", "   ", "lonely"])
    assert set(out["doc_id"]) == {2}
    assert out["n_words"].tolist() == [1]
    want = (
        int.from_bytes(hashlib.md5(b"lonely").digest()[:8], "big") >> 1
    )
    assert out["chunk_hash"].iloc[0] == want


def test_dedup_stats_counts(ray_session):
    # two identical docs in src_a, one unique doc in src_b
    rng = np.random.default_rng(9)
    shared = " ".join(f"s{i}" for i in rng.integers(0, 50, 120))
    unique = " ".join(f"u{i}" for i in range(120))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [shared, shared, unique],
            "source": ["src_a", "src_a", "src_b"],
        }
    )
    got = (
        cdc_dedup_stats(
            ray.data.from_pandas(df).repartition(2), divisor=D
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    a = got[got["source"] == "src_a"].iloc[0]
    b = got[got["source"] == "src_b"].iloc[0]
    # every chunk of the duplicated doc is a corpus duplicate
    assert a["dup_chunks"] == a["n_chunks"] and a["n_words"] == 240
    assert a["dup_words"] == 240
    # the unique doc shares nothing (disjoint vocabulary)
    assert b["dup_chunks"] == 0 and b["dup_words"] == 0
    assert b["n_words"] == 120


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{j}" for j in rng.integers(0, 40, 80)) for _ in range(15)
    ]
    outs = [ _chunks(texts, parts=p) for p in (1, 6) ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
