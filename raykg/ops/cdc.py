"""Content-defined chunking (CDC) for storage-level corpus dedup.

Fixed-size chunking breaks on a single inserted word (every later chunk
shifts); content-defined chunking picks boundaries from the CONTENT — a
word is a chunk boundary iff a hash of that word falls in a 1/divisor
slice of the hash space (the word-granular analogue of Rabin/Gear
fingerprint thresholding in LBFS / FastCDC; Muthitacharoen et al. 2001,
"A low-bandwidth network file system").  Insertions and edits only
perturb the chunks they touch, so re-snapshotted or near-duplicate
documents share most chunk hashes — which is what makes chunk-level
dedup work for crawl snapshots of a training corpus.

Boundary rule (deterministic, stateless, SQL-mirrorable): word w ends a
chunk iff ``int(md5(w)[:4 bytes]) % divisor == 0`` — expected chunk
length ``divisor`` words.  The LAST chunk of a document may end without
a boundary word.  Chunk identity is the 63-bit md5 of the
space-rejoined chunk text (the ``ops/dedup._hash_shingles64`` kernel).

Scale shape: chunking is a stateless ``map_batches`` (zero exchanges;
per-batch word-vocabulary memoization keeps md5 calls at vocab size,
the ``simhash_batch`` trick).  Dedup stats are ONE hash-sharded
exchange over (chunk_hash, source) rows — per-shard pandas counting,
then an O(sources) final combine.  No chunk text ever moves: only
hashes and counts.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_WS = re.compile(r"\S+")


def _word_is_boundary(words: List[str], divisor: int) -> np.ndarray:
    """Boolean boundary mask per word: md5-32-bit(word) % divisor == 0."""
    if not words:
        return np.zeros(0, dtype=bool)
    vocab: dict = {}
    for w in words:
        if w not in vocab:
            vocab[w] = (
                int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:4], "big")
                % divisor
                == 0
            )
    return np.fromiter((vocab[w] for w in words), dtype=bool, count=len(words))


def _chunk_hash(text: str) -> int:
    return (
        int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
        >> 1
    )


def cdc_chunks(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    divisor: int = 8,
) -> "ray.data.Dataset":
    """(doc_id, chunk_idx, n_words, chunk_hash) rows — ``chunk_idx`` is
    1-based in document order; expected chunk length is ``divisor``
    words.  Zero exchanges."""

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        texts = batch[text_column].to_pylist()
        out_id, out_ci, out_nw, out_h = [], [], [], []
        for did, txt in zip(ids, texts):
            words = _WS.findall(txt or "")
            if not words:
                continue
            bnd = _word_is_boundary(words, divisor)
            # boundary word ENDS its chunk; starts = positions after bounds
            ends = np.flatnonzero(bnd) + 1
            if not len(ends) or ends[-1] != len(words):
                ends = np.r_[ends, len(words)]
            starts = np.r_[0, ends[:-1]]
            for ci, (s, e) in enumerate(zip(starts, ends), start=1):
                out_id.append(did)
                out_ci.append(ci)
                out_nw.append(int(e - s))
                out_h.append(_chunk_hash(" ".join(words[s:e])))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "chunk_idx": pa.array(out_ci, type=pa.int64()),
                "n_words": pa.array(out_nw, type=pa.int64()),
                "chunk_hash": pa.array(out_h, type=pa.int64()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def cdc_dedup_stats(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    group_column: str = "source",
    divisor: int = 8,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Per-``group_column`` storage-dedup profile over CDC chunks:
    (group, n_chunks, n_words, dup_chunks, dup_words) where a chunk is
    ``dup`` iff its hash occurs MORE THAN ONCE in the whole corpus (the
    chunk store would keep one copy; every other occurrence is saved
    storage).  One hash-sharded exchange; chunk text never moves."""

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        texts = batch[text_column].to_pylist()
        groups = batch[group_column].to_pylist()
        out_g, out_nw, out_h = [], [], []
        for _did, txt, grp in zip(ids, texts, groups):
            words = _WS.findall(txt or "")
            if not words:
                continue
            bnd = _word_is_boundary(words, divisor)
            ends = np.flatnonzero(bnd) + 1
            if not len(ends) or ends[-1] != len(words):
                ends = np.r_[ends, len(words)]
            starts = np.r_[0, ends[:-1]]
            for s, e in zip(starts, ends):
                out_g.append(grp)
                out_nw.append(int(e - s))
                out_h.append(_chunk_hash(" ".join(words[s:e])))
        h = np.asarray(out_h, dtype=np.int64)
        return pa.table(
            {
                "grp": pa.array(out_g, type=pa.string()),
                "n_words": pa.array(out_nw, type=pa.int64()),
                "chunk_hash": pa.array(h),
                "shard": pa.array(
                    (h.astype(np.uint64) % np.uint64(num_shards)).astype(
                        np.int32
                    )
                ),
            }
        )

    def shard_stats(g: pd.DataFrame) -> pd.DataFrame:
        """All occurrences of a hash land in one shard, so corpus-global
        duplication is decidable locally: per-group partial sums."""
        dup = (
            g.groupby("chunk_hash")["chunk_hash"].transform("size") > 1
        ).to_numpy()
        g = g.assign(
            dup=dup.astype(np.int64), dw=g["n_words"].to_numpy() * dup
        )
        agg = g.groupby("grp", sort=False).agg(
            n_chunks=("chunk_hash", "size"),
            n_words=("n_words", "sum"),
            dup_chunks=("dup", "sum"),
            dup_words=("dw", "sum"),
        )
        return agg.reset_index()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby("grp", sort=False)[
                ["n_chunks", "n_words", "dup_chunks", "dup_words"]
            ]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                group_column: agg["grp"],
                "n_chunks": agg["n_chunks"].astype(np.int64),
                "n_words": agg["n_words"].astype(np.int64),
                "dup_chunks": agg["dup_chunks"].astype(np.int64),
                "dup_words": agg["dup_words"].astype(np.int64),
            }
        )

    return (
        ds.map_batches(chunk_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_stats, batch_format="pandas")
        .groupby("grp")
        .map_groups(combine, batch_format="pandas")
    )
