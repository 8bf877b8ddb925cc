"""Entity resolution — blocked fuzzy label matching into canonical clusters.

KG construction needs more than exact concept lookup (the ontology tag
path): free-form entity labels arrive with typos, case variants, and
near-identical spellings that must collapse into ONE canonical node
("entity canonicalization" beyond the reference's exact keyword->concept
map, `/root/reference/python-lib/ontology_tagging/ontology_tagger.py:221-231`).

Classic blocked-ER shape, label-level (the key scale move):

1. **Label distinct** — identical normalized labels are trivially the
   same entity, so resolution runs over the DISTINCT-label table (one
   vocabulary-sized exchange; min entity id per label is its
   representative).  Corpus rows never enter the pairwise stage.
2. **Blocking** — labels shard by a block key (first ``block_prefix``
   chars).  Only same-block labels are compared: standard ER blocking,
   and part of the DOCUMENTED semantics (a typo inside the prefix is not
   found — by both this engine and the SQL oracle, identically).
3. **Within-block pairwise bounded Levenshtein** — per shard, per
   block, every distinct-label pair within ``max_dist`` edits becomes a
   representative pair.  The DP is bounded (early exit past
   ``max_dist``; length-diff prefilter), and the pair count is
   O(distinct-labels-per-block^2), vocabulary- not corpus-scaled.
   ``max_block_labels`` is a deterministic rail for degenerate blocks
   (a block that big is a non-discriminative key; real ER systems drop
   such blocks) — it never binds at oracle scale, so SQL parity mirrors
   the uncapped semantics, same convention as LSH bucket caps.
4. **Components** — representative pairs feed
   :func:`raykg.ops.components.connected_components`; the canonical id
   of a cluster is its minimum entity id (min over representatives =
   min over members, since each representative is the min of its label).
5. **Attach** — the label -> canonical map (vocabulary-sized) is
   broadcast back over the entity table under
   ``_BROADCAST_MAX_LABELS``, bucketed hash join above it.

Output: ``(<id_column>, canonical_id)`` for EVERY input row; singleton
labels canonicalize to their own representative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .agg import sharded_groupby_apply
from .components import connected_components

_BROADCAST_MAX_LABELS = 2_000_000


def bounded_levenshtein(a: str, b: str, k: int) -> int:
    """Unit-cost edit distance, returning ``k + 1`` as soon as the true
    distance provably exceeds ``k`` (row-min early exit).  Semantics match
    DuckDB's ``levenshtein`` (single-character insert/delete/substitute)
    so the SQL oracle can mirror pair decisions exactly."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if a == b:
        return 0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            c = prev[j - 1] if ca == b[j - 1] else prev[j - 1] + 1
            up = prev[j] + 1
            if up < c:
                c = up
            left = cur[j - 1] + 1
            if left < c:
                c = left
            cur[j] = c
            if c < row_min:
                row_min = c
        if row_min > k:
            return k + 1
        prev = cur
    d = prev[lb]
    return d if d <= k else k + 1


def resolve_entities(
    ds: "ray.data.Dataset",
    id_column: str = "ent_id",
    label_column: str = "label",
    block_prefix: int = 4,
    max_dist: int = 2,
    num_shards: int = 32,
    max_block_labels: int = 65536,
) -> "ray.data.Dataset":
    """Blocked fuzzy entity resolution (module docstring).  Returns a
    Dataset of ``(<id_column>, canonical_id)`` covering every input row."""

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: batch[id_column],
                "nm": pc.utf8_lower(pc.cast(batch[label_column], pa.string())),
            }
        )

    ents = ds.map_batches(normalize, batch_format="pyarrow")

    # 1. distinct labels with min-id representative (vocabulary exchange)
    def label_reps(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("nm", sort=False)[id_column].min()
        return pd.DataFrame({"nm": g.index, "rep": g.to_numpy(dtype=np.int64)})

    # materialized once: vocabulary-sized (distinct labels, not corpus rows)
    # and consumed twice — by the pairwise stage and by the final attach
    labels = sharded_groupby_apply(
        ents, ["nm"], label_reps, num_shards=num_shards
    ).materialize()
    n_labels = labels.count()

    # 2+3. block by prefix, pairwise bounded Levenshtein inside each block
    def add_block(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "blk", pc.utf8_slice_codeunits(batch["nm"], 0, block_prefix)
        )

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list[int] = []
        out_b: list[int] = []
        for _, g in df.groupby("blk", sort=False):
            if len(g) < 2 or len(g) > max_block_labels:
                continue
            # sort for deterministic pair order (output is distinct pairs
            # either way; sorting also puts near-equal lengths together)
            g = g.sort_values("nm", kind="stable")
            nms = g["nm"].tolist()
            reps = g["rep"].to_numpy(dtype=np.int64)
            lens = np.fromiter((len(s) for s in nms), dtype=np.int64)
            n = len(nms)
            for i in range(n):
                li = lens[i]
                for j in range(i + 1, n):
                    if abs(int(lens[j]) - int(li)) > max_dist:
                        continue
                    if bounded_levenshtein(nms[i], nms[j], max_dist) <= max_dist:
                        a, b = int(reps[i]), int(reps[j])
                        if a > b:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
            }
        )

    pairs = sharded_groupby_apply(
        labels.map_batches(add_block, batch_format="pyarrow"),
        ["blk"],
        block_pairs,
        num_shards=num_shards,
    )

    # 4. representative pairs -> components (vocabulary-sized graph)
    comp = connected_components(pairs, num_shards=num_shards)

    # 5. label -> canonical map, attached back over the entity table
    if n_labels > _BROADCAST_MAX_LABELS:
        # vocabulary too big to hold on the driver: keep everything as
        # Datasets and attach with two bucketed joins (rep->cluster onto
        # labels, then nm->canonical onto entities)
        from .join import bucketed_hash_join

        comp_renamed = comp.map_batches(
            lambda b: b.rename_columns(["rep", "cluster_id"]),
            batch_format="pyarrow",
        )
        lab_joined = bucketed_hash_join(labels, comp_renamed, on="rep", how="left")

        def finish_label(batch: pd.DataFrame) -> pd.DataFrame:
            canon = batch["cluster_id"].fillna(batch["rep"]).astype(np.int64)
            return pd.DataFrame({"nm": batch["nm"], "canonical_id": canon})

        lab_map = lab_joined.map_batches(finish_label, batch_format="pandas")
        joined = bucketed_hash_join(ents, lab_map, on="nm", how="inner")
        return joined.map_batches(
            lambda b: b.select([id_column, "canonical_id"]),
            batch_format="pyarrow",
        )

    comp_df = comp.to_pandas()  # near-dup-label volume, <= n_labels (gated)
    rep_to_cluster = (
        {}
        if comp_df.empty
        else dict(
            zip(
                comp_df["doc_id"].astype(np.int64),
                comp_df["cluster_id"].astype(np.int64),
            )
        )
    )
    lab_df = labels.to_pandas()
    lab_df["canonical_id"] = (
        lab_df["rep"].map(rep_to_cluster).fillna(lab_df["rep"]).astype(np.int64)
    )
    lab_ref = ray.put(lab_df[["nm", "canonical_id"]])

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch.merge(ray.get(lab_ref), on="nm", how="left")
        return pd.DataFrame(
            {
                id_column: m[id_column].to_numpy(dtype=np.int64),
                "canonical_id": m["canonical_id"].to_numpy(dtype=np.int64),
            }
        )

    return ents.map_batches(attach, batch_format="pandas")
