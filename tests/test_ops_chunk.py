"""Token-window chunking: reference parity, overlap, edge docs."""
import pandas as pd
import pytest
import ray.data

from raykg.ops.chunk import chunk_documents


def run(docs, size, overlap=0):
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    return (
        chunk_documents(ds, size=size, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def test_basic_windows(ray_session):
    out = run(["a b c d e f g"], size=5, overlap=2)
    assert out["chunk"].tolist() == ["a b c d e", "d e f g", "g"]
    assert out["tok_start"].tolist() == [0, 3, 6]
    assert out["tok_len"].tolist() == [5, 4, 1]


def test_no_overlap_and_short_doc(ray_session):
    out = run(["a b c", "x"], size=2)
    by_doc = out.groupby("doc_id")["chunk"].apply(list).to_dict()
    assert by_doc == {0: ["a b", "c"], 1: ["x"]}


def test_empty_and_whitespace_docs(ray_session):
    out = run(["", "   ", None, "a"], size=3)
    assert out["doc_id"].tolist() == [3]


def test_whitespace_canonicalized(ray_session):
    out = run(["  a\t\tb \n c  "], size=10)
    assert out["chunk"].tolist() == ["a b c"]


def test_bad_overlap_rejected(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, size=3, overlap=3)
