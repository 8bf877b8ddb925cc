"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm).

Each document's word k-grams are hashed (63-bit md5, the same kernel as
``ops/dedup._hash_shingles64`` so the DuckDB oracle mirrors it exactly)
and a sliding window of ``window`` consecutive hashes selects, per
window, the RIGHTMOST minimal hash.  The distinct selected (position,
hash) pairs are the document's fingerprints: any shared substring of at
least ``window + k - 1`` words is guaranteed to contribute at least one
shared fingerprint (the paper's correctness property), while the
expected fingerprint density is only ``2 / (window + 1)`` of the k-gram
count — which is why MOSS-style overlap detection scales where full
inverted shingle indexes (``ops/dedup.ngram_jaccard_pairs``) carry every
k-gram into the exchange.

Scale shape: fingerprint selection is a STATELESS ``map_batches`` — zero
exchanges, every doc handled inside its own batch.  Pair scoring is one
groupby-style exchange over the (already ~(w+1)/2x reduced) fingerprint
rows, bucket-sharded by hash with the same ``max_bucket_members``
stop-word guard as the shingle index.

Short-document edges mirror the jaccard/dup_clusters family: a document
with fewer than ``k`` words contributes ONE k-gram (all its words
joined); an empty/whitespace document contributes none.  When a document
has fewer than ``window`` k-grams the single window is the whole
sequence.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_WS = re.compile(r"\S+")


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """63-bit md5 hashes of the word k-grams of ``text``, in order (NOT
    deduped — winnowing is positional)."""
    words = _WS.findall(text or "")
    if not words:
        return np.zeros(0, dtype=np.int64)
    if len(words) >= k:
        grams = (
            " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
        )
        n = len(words) - k + 1
    else:
        grams = (" ".join(words),)
        n = 1
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
            >> 1
            for g in grams
        ),
        dtype=np.int64,
        count=n,
    )


def _select(h: np.ndarray, window: int) -> np.ndarray:
    """Indices (0-based, sorted, distinct) of the rightmost-minimal hash
    of every length-``min(window, len(h))`` sliding window."""
    n = len(h)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    w = min(window, n)
    # argmin over the REVERSED window = rightmost minimum of the original
    rev = np.lib.stride_tricks.sliding_window_view(h, w)[:, ::-1]
    picked = np.arange(n - w + 1, dtype=np.int64) + (
        w - 1 - np.argmin(rev, axis=1)
    )
    return np.unique(picked)


def winnow_fingerprints(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 4,
    window: int = 5,
) -> "ray.data.Dataset":
    """(doc_id, pos, fp) winnowed fingerprint rows — ``pos`` is the
    1-based k-gram index (1-based to mirror SQL list indexing), ``fp``
    the 63-bit gram hash.  Zero exchanges."""

    def fps(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        texts = batch[text_column].to_pylist()
        out_id, out_pos, out_fp = [], [], []
        for did, txt in zip(ids, texts):
            h = _gram_hashes(txt, k)
            sel = _select(h, window)
            if not len(sel):
                continue
            out_id.append(np.full(len(sel), did, dtype=np.int64))
            out_pos.append(sel + 1)
            out_fp.append(h[sel])
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                    "fp": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "pos": pa.array(np.concatenate(out_pos)),
                "fp": pa.array(np.concatenate(out_fp)),
            }
        )

    return ds.map_batches(fps, batch_format="pyarrow")


def winnow_pairs(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 4,
    window: int = 5,
    min_shared: int = 2,
    num_shards: int = 64,
    max_bucket_members: int = 512,
) -> "ray.data.Dataset":
    """(id_a, id_b, shared) for document pairs sharing at least
    ``min_shared`` DISTINCT winnowed fingerprint hashes — the MOSS
    overlap report.  One exchange, over fingerprint rows only (the
    ~2/(window+1)-density winnowed set, not the full k-gram index); a
    fingerprint hash held by more than ``max_bucket_members`` documents
    is dropped as a stop-gram with the same rationale as the shingle
    index's guard (it would emit O(members^2) pairs while carrying
    almost no identifying signal)."""
    fp_rows = winnow_fingerprints(
        ds, text_column=text_column, id_column=id_column, k=k, window=window
    )

    def shard_of(batch: pa.Table) -> pa.Table:
        # distinct (fp, doc_id) inside the batch; shard by fp value
        t = (
            batch.select(["fp", "doc_id"])
            .group_by(["fp", "doc_id"])
            .aggregate([])
        )
        shard = (
            t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(num_shards)
        ).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    def count_pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        """One row per (id_a, id_b) with this shard's shared-fp partial
        count — the same partial-count + pair-shard combine plan as
        ``ops/dedup.ngram_jaccard_pairs`` (a Ray groupby on pair identity
        would pay per-group Python overhead on every candidate pair)."""
        g = g.sort_values(["fp", "doc_id"], kind="stable").drop_duplicates(
            ["fp", "doc_id"]
        )
        g = g[g.duplicated("fp", keep=False)]
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64"),
                "pshard": pd.Series(dtype="int64"),
            }
        )
        if not len(g):
            return empty
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        fps = g["fp"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, fps[1:] != fps[:-1]])
        ends = np.r_[starts[1:], len(fps)]
        ia_parts, ib_parts = [], []
        for s, e in zip(starts, ends):
            m = int(e - s)
            if m > max_bucket_members:
                continue  # stop-gram: drop, deterministic
            iu, ju = np.triu_indices(m, k=1)
            ia_parts.append(s + iu)
            ib_parts.append(s + ju)
        if not ia_parts:
            return empty
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        out = pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})
        out = out.groupby(["id_a", "id_b"], sort=False).size().reset_index(
            name="c"
        )
        out["pshard"] = (
            (out["id_a"].to_numpy() * np.int64(1_000_003))
            ^ out["id_b"].to_numpy()
        ) % num_shards
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["id_a", "id_b"], sort=False)["c"].sum().reset_index()
        )
        agg = agg[agg["c"] >= min_shared]
        return pd.DataFrame(
            {
                "id_a": agg["id_a"].to_numpy(dtype=np.int64),
                "id_b": agg["id_b"].to_numpy(dtype=np.int64),
                "shared": agg["c"].to_numpy(dtype=np.int64),
            }
        )

    return (
        fp_rows.map_batches(shard_of, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(count_pairs_in_shard, batch_format="pandas")
        .groupby("pshard")
        .map_groups(combine, batch_format="pandas")
    )
