"""ops/boilerplate: both physical plans equal, and real line-mode semantics
on a synthetic newline corpus."""

import pandas as pd
import pytest

import ray.data

from raykg.ops.boilerplate import boilerplate_trim

SF = "/root/testdata/sf0.001"


def _norm(ds):
    return (
        ds.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"n_chunks": "int64", "n_removed": "int64"})
    )


@pytest.mark.usefixtures("ray_session")
def test_bucketed_fallback_equals_broadcast():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = _norm(boilerplate_trim(docs, chunk_words=5, min_docs=2))
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    b = _norm(boilerplate_trim(docs, chunk_words=5, min_docs=2, broadcast_max=0))
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_removed"] > 0).any()  # the op actually bites on this corpus


@pytest.mark.usefixtures("ray_session")
def test_line_mode_drops_recurring_lines():
    rows = [
        {"doc_id": 0, "text": "unique alpha\ncookie banner\nbody one"},
        {"doc_id": 1, "text": "cookie banner\nbody two"},
        {"doc_id": 2, "text": "body three\ncookie banner"},
        {"doc_id": 3, "text": "all original here"},
    ]
    ds = ray.data.from_items(rows)
    out = _norm(boilerplate_trim(ds, split_lines=True, min_docs=2))
    assert out.loc[0, "clean_text"] == "unique alpha\nbody one"
    assert out.loc[1, "clean_text"] == "body two"
    assert out.loc[2, "clean_text"] == "body three"
    assert out.loc[3, "clean_text"] == "all original here"
    assert out["n_removed"].tolist() == [1, 1, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_doc_fully_boilerplate_survives_as_empty():
    rows = [
        {"doc_id": 0, "text": "spam spam spam spam spam"},
        {"doc_id": 1, "text": "spam spam spam spam spam"},
    ]
    ds = ray.data.from_items(rows)
    for gate in (10**9, 0):
        out = _norm(boilerplate_trim(ds, chunk_words=5, min_docs=2,
                                     broadcast_max=gate))
        assert len(out) == 2
        assert out["clean_text"].tolist() == ["", ""]
        assert out["n_removed"].tolist() == [1, 1]
