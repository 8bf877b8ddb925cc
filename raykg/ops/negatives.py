"""Negative sampling for KG-embedding training data.

Link-prediction / KG-embedding trainers (TransE-family) consume each
positive triple together with ``k`` corrupted ("negative") triples whose
object is replaced by a random entity of the same type.  At 100 TB the two
requirements are determinism (the same negatives on every run, resume, and
cluster layout — otherwise training is not reproducible and the driver
cannot audit the set) and zero shuffle (corruption is a per-row rewrite;
nothing about it needs an exchange).

Both are met by the repo's documented md5 contract (``ops/sample.py``):
the ``j``-th negative of a positive with subject ``s`` is the concept at
rank ``md5(s + '|' + j)[:15hex] % C`` of the lexicographically sorted
concept vocabulary — cross-engine reproducible (DuckDB:
``('0x' || substr(md5(subj || '|' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
% C``).  Sampling is *filtered* (the standard setting): a draw that hits
the positive's own object is dropped rather than emitted as a false
negative.  In this KG a mention subject has exactly ONE true object (the
keyword→tag map is functional, last-wins — ``core/ontology.py``), so
filtering against the row's own object IS the full filtered contract, with
no positive-set join.

Scale shape: the concept vocabulary is the ontology — human-curated,
ontology-sized at any corpus scale — so it is broadcast once (``ray.put``)
and the whole operator is one streaming ``map_batches`` with no exchange.
The md5-per-(row, j) loop is the same accepted tradeoff sample.py
documents: one short-string hash per emitted row, in a stage that is
read-bound in practice.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data


def corrupt_tail_negatives(
    mentions: "ray.data.Dataset",
    concept_tags: Sequence[str],
    k: int = 4,
    pred: str = "tagged_as",
) -> "ray.data.Dataset":
    """Per positive mention triple, emit up to ``k`` filtered corrupt-tail
    negatives.

    ``mentions`` must carry ``conv_id, turn_idx, tag, keyword`` (the
    ``extract_mention_counts`` schema); the positive triple is
    ``(conv_id#turn_idx#keyword, pred, concept:tag)`` — the same subjects
    and objects the triple extractor emits (``pipeline/graph.py``).
    Output: ``subj, pred, pos_obj, neg_obj, j`` with one row per surviving
    draw ``j in [0, k)``.
    """
    vocab: List[str] = sorted(set(concept_tags))
    n_vocab = len(vocab)
    if n_vocab == 0:
        raise ValueError("concept vocabulary is empty")
    vocab_ref = ray.put(np.array([f"concept:{t}" for t in vocab], dtype=object))

    def expand(batch: pa.Table) -> pa.Table:
        objs = ray.get(vocab_ref)
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        kw = batch["keyword"].to_pylist()
        tag = batch["tag"].to_pylist()
        subj = [f"{c}#{t}#{w}" for c, t, w in zip(conv, turn, kw)]
        pos = [f"concept:{t}" for t in tag]
        n = len(subj)
        if n == 0:
            return pa.table(
                {
                    "subj": pa.array([], type=pa.string()),
                    "pred": pa.array([], type=pa.string()),
                    "pos_obj": pa.array([], type=pa.string()),
                    "neg_obj": pa.array([], type=pa.string()),
                    "j": pa.array([], type=pa.int64()),
                }
            )
        # rank of draw j for row i: md5(subj|j) first 15 hex chars mod C —
        # the documented cross-engine contract (module docstring)
        ranks = np.empty((n, k), dtype=np.int64)
        for i, s in enumerate(subj):
            base = s.encode("utf-8") + b"|"
            for j in range(k):
                h = hashlib.md5(base + str(j).encode("ascii")).hexdigest()[:15]
                ranks[i, j] = int(h, 16) % n_vocab
        neg = objs[ranks]  # (n, k) object array of concept ids
        keep = neg != np.array(pos, dtype=object)[:, None]  # filtered setting
        ii, jj = np.nonzero(keep)
        return pa.table(
            {
                "subj": pa.array(np.array(subj, dtype=object)[ii], type=pa.string()),
                "pred": pa.array(np.full(len(ii), pred, dtype=object), type=pa.string()),
                "pos_obj": pa.array(np.array(pos, dtype=object)[ii], type=pa.string()),
                "neg_obj": pa.array(neg[ii, jj], type=pa.string()),
                "j": pa.array(jj.astype(np.int64), type=pa.int64()),
            }
        )

    return mentions.map_batches(expand, batch_format="pyarrow")
