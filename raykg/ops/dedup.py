"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shuffle design (ray_guide patterns): every variant pre-aggregates or
pre-hashes inside ``map_batches`` so the groupby exchanges move hashes and
ids, never document bodies.  Exact dedup is hash-partition + per-group
first; near-dup is shingle -> signature -> band -> bucket groupby ->
candidate pairs -> verify.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min, Sum

_WORD_RE = re.compile(r"\S+")
_MERSENNE = (1 << 61) - 1


def _text_hash(t: str) -> str:
    return hashlib.md5((t or "").encode("utf-8")).hexdigest()


# --- exact -----------------------------------------------------------------

def exact_dedup_groups(
    ds: "ray.data.Dataset", text_column: str = "text", id_column: str = "doc_id"
) -> "ray.data.Dataset":
    """One row per distinct text: (doc_id = min id, n_dups).

    Phase 1 pre-aggregates per batch (hash -> min id, count), phase 2 is the
    small groupby over partials — the exchange carries one row per distinct
    hash per block.
    """

    def partial(batch: pa.Table) -> pa.Table:
        agg = {}
        for t, i in zip(
            batch[text_column].to_pylist(), batch[id_column].to_pylist()
        ):
            h = _text_hash(t)
            cur = agg.get(h)
            if cur is None:
                agg[h] = [i, 1]
            else:
                cur[0] = min(cur[0], i)
                cur[1] += 1
        return pa.Table.from_pydict(
            {
                "text_hash": list(agg.keys()),
                "min_id": [v[0] for v in agg.values()],
                "n": [v[1] for v in agg.values()],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("min_id", alias_name="doc_id"), Sum("n", alias_name="n_dups"))
    )
    return out.select_columns(["doc_id", "n_dups"])


def exact_dedup(
    ds: "ray.data.Dataset", text_column: str = "text", id_column: str = "doc_id"
) -> "ray.data.Dataset":
    """Keep the first (min-id) row of every duplicate group, dropping the
    rest. Hash-partition + per-group first (full rows)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = pa.array(
            [_text_hash(t) for t in batch[text_column].to_pylist()], type=pa.string()
        )
        return batch.append_column("__text_hash", hashes)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_column).head(1)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__text_hash")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["__text_hash"])
    )


# --- MinHash + LSH ---------------------------------------------------------

class MinHashActor:
    """Per-batch shingling + MinHash signatures + LSH band rows.

    Permutation parameters are derived from a fixed seed so every actor (and
    every run) agrees.  Emits (band, band_hash, doc_id, sig) rows; the
    band groupby buckets near-duplicate candidates together.
    """

    def __init__(
        self,
        text_column: str = "text",
        id_column: str = "doc_id",
        num_perm: int = 64,
        num_bands: int = 16,
        shingle_k: int = 3,
        seed: int = 42,
    ):
        self.text_column = text_column
        self.id_column = id_column
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self.shingle_k = shingle_k
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        words = _WORD_RE.findall(text or "")
        k = self.shingle_k
        if len(words) < k:
            shingles = {" ".join(words)} if words else {""}
        else:
            shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
        hv = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") & ((1 << 61) - 1)
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )
        # (a*x + b) mod p, vectorized over (perm, shingle) in one shot
        return ((self.a[:, None] * hv[None, :] + self.b[:, None]) % _MERSENNE).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (band, band_hash, doc_id) rows only — signatures never leave
        the actor (at 16 bands a shipped 64-int signature would multiply the
        shuffle volume ~50x; candidates are verified with exact Jaccard in a
        second corpus pass instead)."""
        ids = batch[self.id_column].to_pylist()
        texts = batch[self.text_column].to_pylist()
        band_col: List[int] = []
        bh_col: List[int] = []
        id_col: List[int] = []
        r = self.rows_per_band
        for i, t in zip(ids, texts):
            sig = self.signature(t)
            for band in range(self.num_bands):
                chunk = sig[band * r : (band + 1) * r]
                bh = int.from_bytes(
                    hashlib.md5(chunk.tobytes()).digest()[:8], "big"
                ) >> 1
                band_col.append(band)
                bh_col.append(bh)
                id_col.append(i)
        return pa.Table.from_pydict(
            {
                "band": pa.array(band_col, type=pa.int32()),
                "band_hash": pa.array(bh_col, type=pa.int64()),
                "doc_id": pa.array(id_col, type=pa.int64()),
            }
        )


def _hot_bucket_pairs(bands: "ray.data.Dataset", bucket_keys: List[str],
                      value_cols: List[str]) -> pd.DataFrame:
    """Shared LSH tail: count rows per bucket, keep only buckets with >= 2
    members (the overwhelming majority of buckets are singletons — calling
    Python once per singleton group is what makes a naive
    ``groupby.map_groups`` quadratic-feeling), then emit candidate pairs from
    the hot buckets on the driver (candidate volume == true near-dup volume,
    bounded by construction).

    ``bands`` is materialized so the signature stage runs once, not once per
    consumer."""
    bands = bands.materialize()
    counts = bands.groupby(bucket_keys).aggregate(Count(alias_name="__n"))

    import pyarrow.compute as pc

    hot = counts.map_batches(
        lambda b: b.filter(pc.greater(b["__n"], 1)), batch_format="pyarrow"
    ).to_pandas()  # tiny: one row per non-singleton bucket
    if not len(hot):
        return []
    hot_keys = set(map(tuple, hot[bucket_keys].itertuples(index=False, name=None)))

    def keep_hot(batch: pa.Table) -> pa.Table:
        cols = [batch[k].to_pylist() for k in bucket_keys]
        mask = pa.array([t in hot_keys for t in zip(*cols)])
        return batch.filter(mask)

    members = bands.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    rows = []
    for _, g in members.groupby(bucket_keys):
        g = g.sort_values(value_cols[0]).drop_duplicates(value_cols[0])
        vals = list(g[value_cols].itertuples(index=False, name=None))
        for x in range(len(vals)):
            for y in range(x + 1, len(vals)):
                rows.append((vals[x], vals[y]))
    return rows


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    concurrency=2,
) -> "ray.data.Dataset":
    """Near-duplicate pairs (id_a, id_b, jaccard >= threshold).

    LSH banding proposes candidates (bucket count prefilter -> only hot
    buckets generate pairs); candidates are verified with EXACT n-gram
    Jaccard in a second streaming pass over just those docs."""
    bands = ds.map_batches(
        MinHashActor,
        fn_constructor_kwargs={
            "text_column": text_column,
            "id_column": id_column,
            "num_perm": num_perm,
            "num_bands": num_bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    raw = _hot_bucket_pairs(bands, ["band", "band_hash"], ["doc_id"])
    if not raw:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
        return ray.data.from_pandas(empty)
    cand = pd.DataFrame(
        {"id_a": [a[0] for a, b in raw], "id_b": [b[0] for a, b in raw]}
    ).drop_duplicates()
    verified = ngram_jaccard_verify(
        ds, cand, text_column=text_column, id_column=id_column, shingle_k=shingle_k
    )
    out = verified[verified["jaccard"] >= threshold].reset_index(drop=True)
    return ray.data.from_pandas(out)


# --- SimHash ---------------------------------------------------------------

def _simhash64(words: List[str]) -> int:
    if not words:
        return 0
    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in words:
        h = np.uint64(int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big"))
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits == 1, 1, -1)
    return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)


def simhash_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    sims = [
        _simhash64(_WORD_RE.findall(t or "")) for t in batch[text_column].to_pylist()
    ]
    # store as int64 via two's complement
    as_i64 = [s - (1 << 64) if s >= (1 << 63) else s for s in sims]
    return batch.append_column("simhash", pa.array(as_i64, type=pa.int64()))


def simhash_near_pairs(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash banding: 4 x 16-bit chunks (any pair within
    hamming distance 3 shares at least one exact chunk), verify distance in
    the bucket."""
    hashed = ds.map_batches(
        lambda b: simhash_batch(b, text_column), batch_format="pyarrow"
    ).select_columns([id_column, "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        sims = batch["simhash"].to_pylist()
        out = {"chunk": [], "chunk_val": [], "doc_id": [], "simhash": []}
        for i, s in zip(ids, sims):
            u = s & ((1 << 64) - 1)
            for c in range(4):
                out["chunk"].append(c)
                out["chunk_val"].append((u >> (16 * c)) & 0xFFFF)
                out["doc_id"].append(i)
                out["simhash"].append(s)
        return pa.Table.from_pydict(out)

    bands = hashed.map_batches(explode, batch_format="pyarrow")
    raw = _hot_bucket_pairs(bands, ["chunk", "chunk_val"], ["doc_id", "simhash"])
    rows = []
    seen = set()
    for (ida, sa), (idb, sb) in raw:
        if (ida, idb) in seen:
            continue
        seen.add((ida, idb))
        d = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
        if d <= max_hamming:
            rows.append((ida, idb, d))
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]) if rows else pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "hamming": pd.Series(dtype="int64")}
    )
    return ray.data.from_pandas(out)


# --- exact n-gram Jaccard verification ------------------------------------

def ngram_jaccard_verify(
    ds: "ray.data.Dataset",
    candidate_pairs: pd.DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_k: int = 3,
) -> pd.DataFrame:
    """Exact n-gram Jaccard for a (small) candidate pair set: broadcast the
    candidate id set, collect only those docs' shingle sets, join on the
    driver.  The candidate set is LSH output — orders of magnitude smaller
    than the corpus — so the driver-side join is bounded; at larger candidate
    volumes this becomes a doc_id hash-join (documented scale path)."""
    wanted = set(candidate_pairs["id_a"]) | set(candidate_pairs["id_b"])

    def shingles_of(batch: pa.Table) -> pa.Table:
        out_ids, out_sets = [], []
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            if i in wanted:
                words = _WORD_RE.findall(t or "")
                sh = (
                    {" ".join(words[j : j + shingle_k]) for j in range(len(words) - shingle_k + 1)}
                    if len(words) >= shingle_k
                    else ({" ".join(words)} if words else set())
                )
                out_ids.append(i)
                out_sets.append(sorted(sh))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_ids, type=pa.int64()),
             "shingles": pa.array(out_sets, type=pa.list_(pa.string()))}
        )

    collected = ds.map_batches(shingles_of, batch_format="pyarrow").to_pandas()
    sets = {r.doc_id: set(r.shingles) for r in collected.itertuples()}
    rows = []
    for r in candidate_pairs.itertuples():
        a, b = sets.get(r.id_a, set()), sets.get(r.id_b, set())
        denom = len(a | b)
        rows.append((r.id_a, r.id_b, round(len(a & b) / denom, 6) if denom else 0.0))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


# --- embedding near-dup ----------------------------------------------------

def embedding_near_pairs(
    ds: "ray.data.Dataset",
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH
    buckets, exact cosine verified inside each bucket."""

    def bucketize_factory():
        state = {}

        def bucketize(batch: pa.Table) -> pa.Table:
            embs = np.array(batch[embedding_column].to_pylist(), dtype=np.float64)
            if "planes" not in state:
                rng = np.random.RandomState(seed)
                state["planes"] = rng.randn(embs.shape[1], num_planes)
            bits = (embs @ state["planes"]) > 0
            codes = (bits * (1 << np.arange(num_planes))).sum(axis=1)
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array(codes, type=pa.int64()),
                    id_column: batch[id_column],
                    embedding_column: batch[embedding_column],
                }
            )

        return bucketize

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")})
        g = g.sort_values(id_column)
        ids = g[id_column].tolist()
        m = np.array(g[embedding_column].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sim = m @ m.T
        rows = []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                c = float(sim[x, y])
                if c >= threshold:
                    rows.append((ids[x], ids[y], round(c, 6)))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])

    return (
        ds.map_batches(bucketize_factory(), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
