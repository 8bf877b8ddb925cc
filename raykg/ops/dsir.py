"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram (here: unigram) features.

Every document gets an importance log-weight under a bag-of-hashed-tokens
model: tokens hash into ``n_buckets`` (md5, cross-engine reproducible),
add-one-smoothed bucket unigram distributions are estimated for the
TARGET slice and the RAW corpus, and

    w(doc) = sum_tokens [ ln p_target(b(tok)) - ln p_raw(b(tok)) ].

All arithmetic is EXACT int64: the only float is ``ln`` of an integer,
quantized as ``L(x) = floor(ln(x) * 1e6)`` — verified bit-identical
between numpy and DuckDB over 1..2M — so partial sums commute and the
SQL mirror matches hash-for-hash at any scale.

Distributed plan: one ``map_batches`` counting pass with per-batch
(bucket, ct, cr) partials -> ONE ``groupby(bucket)`` exchange of
<= n_buckets cells -> the n_buckets-sized score table broadcasts via
``ray.put`` -> a second streaming pass scores every document with zero
further exchanges.  Driver state is the bucket table only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

N_BUCKETS = 4096
LOG_SCALE = 1_000_000


def _lq(x) -> np.ndarray:
    """floor(ln(x) * 1e6) as int64 — the quantized-log contract shared
    with the SQL mirror."""
    return np.floor(np.log(np.asarray(x, dtype=np.float64)) * LOG_SCALE).astype(
        np.int64
    )


def _bucket(token: str, n_buckets: int) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def dsir_weights(
    docs: "ray.data.Dataset",
    target_column: str,
    target_value: str,
    id_column: str = "doc_id",
    text_column: str = "text",
    n_buckets: int = N_BUCKETS,
) -> "ray.data.Dataset":
    """(id, n_tokens, dsir_w) for every document; higher = more
    target-like.  ``target_*`` selects the target slice (e.g.
    lang == 'en')."""

    def count_partial(batch: pa.Table) -> pa.Table:
        cache = {}
        ct = np.zeros(n_buckets, dtype=np.int64)
        cr = np.zeros(n_buckets, dtype=np.int64)
        for text, tv in zip(
            batch[text_column].to_pylist(), batch[target_column].to_pylist()
        ):
            is_t = tv == target_value
            for tok in (text or "").split(" "):
                b = cache.get(tok)
                if b is None:
                    b = cache[tok] = _bucket(tok, n_buckets)
                cr[b] += 1
                if is_t:
                    ct[b] += 1
        hit = (cr > 0).nonzero()[0]
        return pa.table(
            {"bucket": pa.array(hit, type=pa.int64()),
             "ct": pa.array(ct[hit], type=pa.int64()),
             "cr": pa.array(cr[hit], type=pa.int64())}
        )

    cells = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["ct", "cr"])
    )
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    for b in cells.iter_batches(batch_format="pyarrow"):
        idx = b["bucket"].to_numpy()
        ct[idx] = b["sum(ct)"].to_numpy()
        cr[idx] = b["sum(cr)"].to_numpy()
    # per-token score + per-token normalizer (add-one over n_buckets cells)
    score = _lq(ct + 1) - _lq(cr + 1)
    norm = int(_lq([int(cr.sum()) + n_buckets])[0] - _lq([int(ct.sum()) + n_buckets])[0])
    score_ref = ray.put(score)

    def weigh(batch: pa.Table) -> pa.Table:
        s = ray.get(score_ref)
        cache = {}
        n_out = np.empty(batch.num_rows, dtype=np.int64)
        w_out = np.empty(batch.num_rows, dtype=np.int64)
        for i, text in enumerate(batch[text_column].to_pylist()):
            toks = (text or "").split(" ")
            w = 0
            for tok in toks:
                b = cache.get(tok)
                if b is None:
                    b = cache[tok] = _bucket(tok, n_buckets)
                w += int(s[b])
            n_out[i] = len(toks)
            w_out[i] = w + len(toks) * norm
        return pa.table(
            {id_column: batch[id_column],
             "n_tokens": pa.array(n_out, type=pa.int64()),
             "dsir_w": pa.array(w_out, type=pa.int64())}
        )

    return docs.map_batches(weigh, batch_format="pyarrow")
