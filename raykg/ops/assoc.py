"""Token co-occurrence association (PMI-style lift) over a document set.

``token_lift_pairs`` emits, for every unordered pair of vocabulary
tokens co-occurring in at least ``min_co`` documents::

    u, v, n_co, lift = (n_docs * n_co) / (df_u * df_v)

``lift`` is the exponential of PMI — the same ranking, kept as an exact
rational of integer counts so the distributed result and a SQL mirror
agree bit-for-bit (a float ``ln`` may differ by an ulp between libms;
integer-ratio division in IEEE doubles cannot).  Same idiom as BM25's
rational idf in `ops/bm25.py`.

Scale shape:

1. **doc-token set** — per-batch map emits DISTINCT (doc, token) rows
   (set semantics inside the batch; docs never span batches).
2. **document frequency** — token-sharded count, one exchange.
3. **vocabulary broadcast** — tokens with ``df >= min_df`` ship once
   via ``ray.put`` as sorted arrays; every batch filters membership
   with one ``searchsorted``.  The df floor is what bounds the pair
   blow-up: a doc contributes ``C(k, 2)`` pairs only over its
   *vocabulary* tokens.
4. **pair expansion** — doc-sharded triu expansion with per-shard
   partial counts (pairs pre-counted before they travel), then a
   pair-sharded sum with the ``min_co`` floor.
5. **lift attach** — df arrays probed per batch; no further exchange.

The reference plugin computes no corpus statistics; this extends the
text-analysis family in `ops/text.py` / `ops/tfidf.py`.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply


def token_lift_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_df: int = 2,
    min_co: int = 2,
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """``(u, v, n_co, lift)`` for vocabulary token pairs (whitespace
    tokens, document-set semantics)."""

    n_docs = ds.count()

    def doc_tokens(df: pd.DataFrame) -> pd.DataFrame:
        docs: List[np.ndarray] = []
        toks: List[np.ndarray] = []
        for doc, text in zip(df[doc_col], df[text_col]):
            if text is None:
                continue
            ts = np.unique([t for t in text.split(" ") if t])
            if len(ts):
                docs.append(np.full(len(ts), doc))
                toks.append(ts)
        if not docs:
            return pd.DataFrame({"doc": [], "tok": []})
        return pd.DataFrame(
            {"doc": np.concatenate(docs), "tok": np.concatenate(toks)}
        )

    dt = ds.select_columns([doc_col, text_col]).map_batches(
        doc_tokens, batch_format="pandas"
    )

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", sort=False, as_index=False).size()
        return g.rename(columns={"size": "c"})

    dfreq = sharded_groupby_apply(
        dt.map_batches(df_partial, batch_format="pandas"),
        ["tok"],
        lambda d: d.groupby("tok", sort=False, as_index=False)["c"].sum(),
        num_shards,
    ).materialize()

    tabs = [t for t in ray.get(list(dfreq.to_arrow_refs())) if t.num_rows]
    vt = (
        pa.concat_tables(tabs) if tabs else pa.table({"tok": [], "c": []})
    )
    vtok = np.asarray(vt["tok"].to_pylist(), dtype=object)
    vcnt = vt["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = vcnt >= min_df
    vtok, vcnt = vtok[keep], vcnt[keep]
    order = np.argsort(vtok, kind="stable")
    vocab_ref = ray.put((vtok[order], vcnt[order]))

    def in_vocab(df: pd.DataFrame) -> pd.DataFrame:
        vts, _ = ray.get(vocab_ref)
        if not len(vts):
            return df.iloc[:0]
        t = df["tok"].to_numpy()
        pos = np.minimum(np.searchsorted(vts, t), len(vts) - 1)
        return df[vts[pos] == t]

    dt_v = dt.map_batches(in_vocab, batch_format="pandas")

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        u_out: List[np.ndarray] = []
        v_out: List[np.ndarray] = []
        for _, vals in df.groupby("doc", sort=False)["tok"]:
            d = np.sort(vals.to_numpy())
            k = len(d)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            u_out.append(d[ii])
            v_out.append(d[jj])
        if not u_out:
            return pd.DataFrame({"u": [], "v": [], "c": []})
        part = pd.DataFrame(
            {"u": np.concatenate(u_out), "v": np.concatenate(v_out)}
        )
        part = part.groupby(["u", "v"], sort=False, as_index=False).size()
        return part.rename(columns={"size": "c"})

    pair_parts = sharded_groupby_apply(dt_v, ["doc"], pair_partials, num_shards)

    def pair_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u", "v"], sort=False, as_index=False)["c"].sum()
        return g[g["c"] >= min_co]

    pairs = sharded_groupby_apply(pair_parts, ["u", "v"], pair_sum, num_shards)

    def attach_lift(df: pd.DataFrame) -> pd.DataFrame:
        vts, vcs = ray.get(vocab_ref)
        cu = vcs[np.searchsorted(vts, df["u"].to_numpy())]
        cv = vcs[np.searchsorted(vts, df["v"].to_numpy())]
        n_co = df["c"].to_numpy().astype(np.int64)
        out = pd.DataFrame(
            {
                "u": df["u"].to_numpy(),
                "v": df["v"].to_numpy(),
                "n_co": n_co,
                "lift": (float(n_docs) * n_co) / (cu * cv),
            }
        )
        return out

    return pairs.map_batches(attach_lift, batch_format="pandas")
