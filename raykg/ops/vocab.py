"""Pairwise vocabulary overlap between corpus slices (source Jaccard).

Measures lexical drift across corpus slices (sources, snapshots,
languages): the Jaccard of each pair's DISTINCT word-n-gram sets.  The
naive plan — a self-join of (slice, gram) on gram — ships the vocabulary
once per matching pair; this op never joins grams at all:

1. each batch folds its texts into distinct (gram, slice-bitmask) rows
   (slices are a bounded domain, ≤ 63 by contract — one int64 mask);
2. ONE hash(gram) exchange ORs the masks per gram, and each shard emits
   only its (mask, count) histogram — O(distinct masks) ≤ O(2^slices)
   rows, in practice a handful;
3. the driver folds histograms: |A| = Σ count over masks with bit a,
   |A∩B| = Σ over masks with both bits — exact integers, every pairwise
   Jaccard from one vocabulary-sized exchange regardless of pair count.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def gram_overlap(
    ds,
    slice_col: str,
    text_col: str = "text",
    n: int = 3,
    num_shards: int = 64,
) -> pa.Table:
    """(slice_a, slice_b, inter, union_n, jaccard) for every slice pair
    sharing >= 1 distinct word-``n``-gram (words = whitespace split,
    mirroring the ``\\S+`` oracle convention).  ``slice_col`` must have
    <= 63 distinct values (bitmask contract)."""
    from .agg import sharded_groupby_apply

    slices = sorted(ds.unique(slice_col))
    if len(slices) > 63:
        raise ValueError(
            f"gram_overlap: {len(slices)} distinct {slice_col!r} values; "
            "the int64 bitmask plan supports at most 63 slices — bucket "
            "the slice column first"
        )
    bit_of = {s: 1 << i for i, s in enumerate(slices)}

    def gram_masks(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        svals = batch[slice_col].to_pylist()
        acc: dict = {}
        for txt, sl in zip(texts, svals):
            if txt is None:
                continue
            bit = bit_of[sl]
            ws = txt.split()
            for i in range(len(ws) - n + 1):
                g = " ".join(ws[i : i + n])
                acc[g] = acc.get(g, 0) | bit
        return pa.table(
            {
                "gram": pa.array(list(acc.keys()), type=pa.string()),
                "mask": pa.array(list(acc.values()), type=pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        masks = df.groupby("gram", sort=False)["mask"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy(np.int64)))
        )
        hist = masks.value_counts()
        return pd.DataFrame(
            {
                "mask": hist.index.to_numpy(np.int64),
                "cnt": hist.to_numpy(np.int64),
            }
        )

    cells = (
        sharded_groupby_apply(
            ds.select_columns([slice_col, text_col]).map_batches(
                gram_masks, batch_format="pyarrow"
            ),
            ["gram"],
            fold,
            num_shards=num_shards,
        )
        .groupby("mask")
        .sum("cnt")
        .to_pandas()
    )
    mask = cells["mask"].to_numpy(np.int64)
    cnt = cells["sum(cnt)"].to_numpy(np.int64)

    k = len(slices)
    sizes = np.array(
        [int(cnt[(mask >> i) & 1 == 1].sum()) for i in range(k)], dtype=np.int64
    )
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            both = (mask >> i) & 1 & ((mask >> j) & 1)
            inter = int(cnt[both == 1].sum())
            if inter == 0:
                continue
            union = int(sizes[i] + sizes[j] - inter)
            rows.append(
                (slices[i], slices[j], inter, union, round(inter / union, 6))
            )
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], type=pa.string()),
            "source_b": pa.array([r[1] for r in rows], type=pa.string()),
            "inter": pa.array([r[2] for r in rows], type=pa.int64()),
            "union_n": pa.array([r[3] for r in rows], type=pa.int64()),
            "jaccard": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )
