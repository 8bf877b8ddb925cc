"""Corpus-statistics language-model fluency scoring (CCNet-style).

Parity note: not in the reference plugin — this is the LM-based quality
signal a training-data pipeline runs next to the rule-based metrics in
`ops/text.py`: documents whose word transitions are rare relative to
the corpus score low and get filtered or down-weighted.

The model is the corpus itself: bigram and unigram counts over the
whitespace tokens.  The score per document is the MEAN CONDITIONAL
BIGRAM PROBABILITY

    score(doc) = mean over bigrams (w1, w2) of  c(w1, w2) / c(w1)

— deliberately NOT log-perplexity: every term is one IEEE-exact integer
division, so a SQL oracle reproduces the scores (libm ``log`` rounding
is engine-dependent; same trade as `ops/tfidf.py` and `ops/bm25.py`).
Because the model is trained on the corpus being scored, every document
bigram exists in the counts — no OOV smoothing branch.

Scale shape — the vocabulary scales with the corpus, so counts stay
DISTRIBUTED end-to-end (never a broadcast dict):

1. **Count pass** — one streaming explode emits per-batch pre-counted
   ``(w1, w2, n)`` partials; a bigram-sharded exchange reduces them.
   Unigram counts fall out of the same table (sum over w2 inside the
   shard) — one corpus read, one exchange, both tables.
2. **Probability join** — per-doc distinct bigram rows (with in-doc
   multiplicity) bucket-join the count tables on the hashed bigram /
   head word; weights and counts, never text bodies, move.
3. **Per-doc reduce** — ``(doc, sum p, n)`` partials co-locate in a
   doc-sharded exchange; the mean is one vectorized pass.
"""
from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .agg import sharded_groupby_apply
from .join import bucketed_hash_join
from .text import WORD_RE


def _bigram_rows(
    docs: "ray.data.Dataset", text_column: str, id_column: str, with_doc: bool
) -> "ray.data.Dataset":
    """(w1, w2, n) pre-counted per batch — or per (doc, w1, w2) when
    ``with_doc`` (scoring side needs the doc key and in-doc multiplicity)."""

    def explode(batch: pa.Table) -> pa.Table:
        counts: dict = {}
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            toks = WORD_RE.findall(t or "")
            for a, b in zip(toks, toks[1:]):
                key = (i, a, b) if with_doc else (a, b)
                counts[key] = counts.get(key, 0) + 1
        if with_doc:
            ids, w1s, w2s = (
                [k[0] for k in counts],
                [k[1] for k in counts],
                [k[2] for k in counts],
            )
            t = {
                id_column: pa.array(
                    ids, type=batch.schema.field(id_column).type
                ),
                "w1": pa.array(w1s, type=pa.string()),
                "w2": pa.array(w2s, type=pa.string()),
            }
        else:
            t = {
                "w1": pa.array([k[0] for k in counts], type=pa.string()),
                "w2": pa.array([k[1] for k in counts], type=pa.string()),
            }
        t["n"] = pa.array(list(counts.values()), type=pa.int64())
        return pa.table(t)

    return docs.map_batches(explode, batch_format="pyarrow")


def lm_score(
    docs: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    num_shards: int = 32,
    round_digits: int = 6,
) -> "ray.data.Dataset":
    """(id, lm_score) per document with >= 1 bigram; ``lm_score`` is the
    mean conditional bigram probability under the corpus's own counts,
    rounded to ``round_digits``.  Docs with < 2 tokens are absent."""

    def reduce_bigrams(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["w1", "w2"], sort=False, as_index=False)["n"].sum()

    bigrams = sharded_groupby_apply(
        _bigram_rows(docs, text_column, id_column, with_doc=False),
        ["w1", "w2"],
        reduce_bigrams,
        num_shards=num_shards,
    )

    def typed_counts(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "w1": pa.array(df["w1"], type=pa.string()),
                "w2": pa.array(df["w2"], type=pa.string()),
                "c12": pa.array(df["n"], type=pa.int64()),
            }
        )

    bigrams = bigrams.map_batches(typed_counts, batch_format="pandas").materialize()

    # unigram HEAD counts fall out of the bigram table: c(w1) as a bigram
    # head = sum over w2 — exactly the denominator the ratio needs
    def reduce_heads(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("w1", sort=False, as_index=False)["c12"].sum()

    heads = sharded_groupby_apply(
        bigrams, ["w1"], reduce_heads, num_shards=num_shards
    ).map_batches(
        lambda df: pa.table(
            {
                "w1": pa.array(df["w1"], type=pa.string()),
                "c1": pa.array(df["c12"], type=pa.int64()),
            }
        ),
        batch_format="pandas",
    )

    doc_rows = _bigram_rows(docs, text_column, id_column, with_doc=True)

    # join order: (doc rows ⋈ bigram counts) on a composite key, then ⋈ head
    # counts on w1 — ids + ints through both exchanges, never text bodies
    def with_key(name):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = pc.binary_join_element_wise(batch["w1"], batch["w2"], "\x1f")
            return batch.append_column(name, key)

        return f

    joined = bucketed_hash_join(
        doc_rows.map_batches(with_key("bg"), batch_format="pyarrow"),
        bigrams.map_batches(with_key("bg"), batch_format="pyarrow").drop_columns(
            ["w1", "w2"]
        ),
        on="bg",
        num_buckets=num_shards,
    ).drop_columns(["bg", "w2"])
    joined = bucketed_hash_join(
        joined, heads, on="w1", num_buckets=num_shards
    )

    def partial_score(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c12 = batch["c12"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = batch["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_column: batch[id_column],
                "s": pa.array(n * (c12 / c1), type=pa.float64()),
                "k": pa.array(n, type=pa.float64()),
            }
        )

    def doc_mean(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_column, sort=False)
        s = g["s"].sum()
        k = g["k"].sum()
        return pd.DataFrame(
            {
                id_column: s.index.to_numpy(),
                "lm_score": np.round(s.to_numpy() / k.to_numpy(), round_digits),
            }
        )

    return sharded_groupby_apply(
        joined.map_batches(partial_score, batch_format="pyarrow"),
        [id_column],
        doc_mean,
        num_shards=num_shards,
    )
