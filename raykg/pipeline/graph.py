"""Graph construction: transcripts + ontology -> triples / nodes / edges /
concept scores.

Per the target data model (SURVEY.md §1.2, BASELINE.json north_star):

- ``(subj=turn_id#keyword, pred='tagged_as', obj='concept:'+tag)`` triples
  from deduplicated per-turn mentions,
- structural ``(conv_id, 'utters', turn_id)`` and
  ``(turn_id, 'used_tool', tool)`` edges,
- canonical node table (conversation / turn / concept / mention / tool),
- per-concept mention/conversation counts.

Shuffle design: triple/edge extraction is a pure streaming actor-pool stage
(per-turn dedup happens inside the actor, so no cross-block dedup shuffle is
ever needed); only the node canonicalization and score reduces shuffle, and
both pre-aggregate inside ``map_batches`` first so the all-to-all exchange
moves one row per (key, batch) instead of one per mention.  Hot-conversation
skew is absorbed by that same in-batch partial aggregation (the salt: a hot
conv_id contributes at most one partial row per block, not one per turn).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..core.format import unique_list
from .config import PipelineConfig
from .tag import MentionActor, _broadcast_ontology, resolve_concurrency as _resolve_concurrency

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("weight", pa.float64()),
    ]
)

NODE_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),
        ("node_type", pa.string()),
        ("label", pa.string()),
        ("category", pa.string()),
    ]
)


def turn_id(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}#{turn_idx}"


def concept_id(tag: str) -> str:
    return f"concept:{tag}"


class TripleActor(MentionActor):
    """Transcripts batch -> triples. One streaming pass, no shuffle:

    - per turn, the distinct (tag, keyword) mention set (dedup inside the
      actor — a turn's mentions never span blocks, so this dedup is globally
      exact) -> ``tagged_as`` triples
    - one ``utters`` edge per turn (keys unique by schema)
    - one ``used_tool`` edge per turn with a non-null tool
    """

    def __init__(self, *args, tool_column: str = "tool",
                 include_structural: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.tool_column = tool_column
        self.include_structural = include_structural

    def __call__(self, batch: pa.Table) -> pa.Table:
        fast = self._call_vectorized(batch)
        if fast is not None:
            return fast
        return self._call_general(batch)

    def _call_vectorized(self, batch: pa.Table) -> "pa.Table | None":
        """Arrow-native construction: structural edges via compute kernels,
        tagged_as from the vectorized matcher's (row, pattern) hit arrays —
        no per-triple Python strings.  Rows the kernel can't handle go
        through the general per-row path and are concatenated."""
        import numpy as np
        import pyarrow.compute as pc

        from ..core.vector_match import get_vectorized

        if self.config.multilingual or not self.config.use_vectorized:
            return None
        matcher = self._get_matcher(self.config.language)
        vm = get_vectorized(matcher)
        if vm is None:
            return None
        n = batch.num_rows
        conv_col = batch[self.conv_column]
        if isinstance(conv_col, pa.ChunkedArray):
            conv_col = conv_col.combine_chunks()
        turn_col = batch[self.turn_column]
        if isinstance(turn_col, pa.ChunkedArray):
            turn_col = turn_col.combine_chunks()
        tid = pc.binary_join_element_wise(conv_col, pc.cast(turn_col, pa.string()), "#")
        parts = []

        # constant pred/weight columns: build once per actor at a growing
        # high-water length and zero-copy slice per batch (np.full of Python
        # strings re-encoded every call measured ~10% of the whole stage)
        consts = getattr(self, "_const_cols", None)
        if consts is None:
            consts = self._const_cols = {}

        def const_col(key, m, make):
            arr = consts.get(key)
            if arr is None or len(arr) < m:
                arr = consts[key] = make(max(m, 2 * len(arr) if arr is not None else m))
            return arr.slice(0, m)

        def triple_table(subj, pred, obj, conv, turn):
            m = len(subj)
            return pa.Table.from_arrays(
                [
                    subj,
                    const_col(pred, m, lambda k: pa.array(np.full(k, pred), type=pa.string())),
                    obj,
                    conv,
                    turn,
                    const_col("__w1", m, lambda k: pa.array(np.ones(k), type=pa.float64())),
                ],
                schema=TRIPLE_SCHEMA,
            )

        if self.include_structural:
            parts.append(triple_table(conv_col, "utters", tid, conv_col, turn_col))
            if self.tool_column in batch.schema.names:
                tool_col = batch[self.tool_column]
                if isinstance(tool_col, pa.ChunkedArray):
                    tool_col = tool_col.combine_chunks()
                mask = pc.and_kleene(
                    pc.is_valid(tool_col), pc.not_equal(tool_col, "")
                )
                mask = pc.fill_null(mask, False)
                if pc.any(mask).as_py():
                    parts.append(
                        triple_table(
                            tid.filter(mask),
                            "used_tool",
                            tool_col.filter(mask),
                            conv_col.filter(mask),
                            turn_col.filter(mask),
                        )
                    )

        # pattern metadata, resolved once per matcher
        meta = getattr(matcher, "_triple_meta", None)
        if meta is None:
            kws = matcher.pattern_keywords
            resolved = []
            for pid, (tag, _cat) in enumerate(matcher.patterns):
                if not self.has_category:
                    tag = matcher.keyword_to_tag.get(kws[pid], tag)
                resolved.append(concept_id(tag))
            meta = (pa.array(kws, type=pa.string()), pa.array(resolved, type=pa.string()))
            matcher._triple_meta = meta
        kw_arr, concept_arr = meta

        text_col = batch[self.config.text_column]
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        elig = vm.eligible_rows(text_col)
        elig_idx = np.nonzero(elig)[0]
        if len(elig_idx):
            rows, pids, _counts = vm.batch_hits(
                text_col.take(pa.array(elig_idx, type=pa.int64()))
            )
            if len(rows):
                g = pa.array(elig_idx[rows], type=pa.int64())
                p = pa.array(pids, type=pa.int64())
                sub_tid = tid.take(g)
                subj = pc.binary_join_element_wise(sub_tid, kw_arr.take(p), "#")
                parts.append(
                    triple_table(
                        subj, "tagged_as", concept_arr.take(p),
                        conv_col.take(g), turn_col.take(g),
                    )
                )
        slow_idx = np.nonzero(~elig)[0]
        if len(slow_idx):
            langs = self._row_languages(batch)
            subj_l, obj_l, conv_l, turn_l = [], [], [], []
            convs = conv_col.to_pylist()
            turns = turn_col.to_pylist()
            for i in slow_idx:
                i = int(i)
                mentions = self._doc_mentions(text_col[i].as_py(), langs[i])
                if not mentions:
                    continue
                t_id = turn_id(convs[i], turns[i])
                for tag, keyword in unique_list(
                    [(m.tag, m.keyword) for m in mentions]
                ):
                    subj_l.append(f"{t_id}#{keyword}")
                    obj_l.append(concept_id(tag))
                    conv_l.append(convs[i])
                    turn_l.append(turns[i])
            if subj_l:
                parts.append(
                    triple_table(
                        pa.array(subj_l, type=pa.string()),
                        "tagged_as",
                        pa.array(obj_l, type=pa.string()),
                        pa.array(conv_l, type=pa.string()),
                        pa.array(turn_l, type=pa.int32()),
                    )
                )
        if not parts:
            return pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in TRIPLE_SCHEMA],
                schema=TRIPLE_SCHEMA,
            )
        return pa.concat_tables(parts)

    def _call_general(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.config.text_column].to_pylist()
        langs = self._row_languages(batch)
        convs = batch[self.conv_column].to_pylist()
        turns = batch[self.turn_column].to_pylist()
        tools = (
            batch[self.tool_column].to_pylist()
            if self.include_structural and self.tool_column in batch.schema.names
            else [None] * batch.num_rows
        )
        subj: List[str] = []
        pred: List[str] = []
        obj: List[str] = []
        e_conv: List[str] = []
        e_turn: List[int] = []
        weight: List[float] = []

        def emit(s, p, o, c, t, w=1.0):
            subj.append(s)
            pred.append(p)
            obj.append(o)
            e_conv.append(c)
            e_turn.append(t)
            weight.append(w)

        per_row = self._batch_tag_counts(texts, langs)
        for conv, turn, tool, row in zip(convs, turns, tools, per_row):
            tid = turn_id(conv, turn)
            if self.include_structural:
                emit(conv, "utters", tid, conv, turn)
                if tool is not None and tool == tool and tool != "":
                    emit(tid, "used_tool", str(tool), conv, turn)
            if row:
                for tag, keyword in unique_list(
                    [(t, k) for t, _c, k, _n in row]
                ):
                    emit(f"{tid}#{keyword}", "tagged_as", concept_id(tag), conv, turn)
        return pa.Table.from_arrays(
            [
                pa.array(subj, type=pa.string()),
                pa.array(pred, type=pa.string()),
                pa.array(obj, type=pa.string()),
                pa.array(e_conv, type=pa.string()),
                pa.array(e_turn, type=pa.int32()),
                pa.array(weight, type=pa.float64()),
            ],
            schema=TRIPLE_SCHEMA,
        )


def extract_triples(
    transcripts: "ray.data.Dataset",
    ontology,
    config: PipelineConfig,
    include_structural: bool = True,
) -> "ray.data.Dataset":
    ref = _broadcast_ontology(ontology, config)
    return transcripts.map_batches(
        TripleActor,
        fn_constructor_kwargs={
            "ontology": ref,
            "config": config,
            "include_structural": include_structural,
        },
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=_resolve_concurrency(config),
        num_cpus=config.num_cpus,
    )


def triples_to_edges(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Edge table is the triple table under graph column names."""
    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["src", "rel", "dst", "conv_id", "turn_idx", "weight"])

    return triples.map_batches(rename, batch_format="pyarrow")


# --- nodes ----------------------------------------------------------------

def _batch_nodes(batch: pa.Table) -> pa.Table:
    """Per-batch node rows (turn + mention exact; conversation/tool partial,
    deduped in-batch then reduced globally)."""
    out: Dict[str, List[Optional[str]]] = {
        "node_id": [],
        "node_type": [],
        "label": [],
        "category": [],
    }
    seen: set = set()
    for subj, pred, obj in zip(
        batch["subj"].to_pylist(), batch["pred"].to_pylist(), batch["obj"].to_pylist()
    ):
        if pred == "utters":
            for nid, ntype in ((subj, "conversation"), (obj, "turn")):
                if (nid, ntype) not in seen:
                    seen.add((nid, ntype))
                    out["node_id"].append(nid)
                    out["node_type"].append(ntype)
                    out["label"].append(nid)
                    out["category"].append(None)
        elif pred == "used_tool":
            key = (obj, "tool")
            if key not in seen:
                seen.add(key)
                out["node_id"].append(f"tool:{obj}")
                out["node_type"].append("tool")
                out["label"].append(obj)
                out["category"].append(None)
        elif pred == "tagged_as":
            key = (subj, "mention")
            if key not in seen:
                seen.add(key)
                out["node_id"].append(subj)
                out["node_type"].append("mention")
                out["label"].append(subj.rsplit("#", 1)[-1])
                out["category"].append(None)
    return pa.Table.from_pydict(out, schema=NODE_SCHEMA)


def triples_from_mentions(
    mentions: "ray.data.Dataset",
    transcripts_meta: "ray.data.Dataset",
    conv_column: str = "conv_id",
    turn_column: str = "turn_idx",
    tool_column: str = "tool",
    include_structural: bool = True,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Triples derived from an EXISTING mentions table plus a text-free
    metadata pass — so the matcher (the job's dominant cost) runs once per
    corpus, not once for edges and again for mentions.

    - ``tagged_as``: the per-turn distinct (tag, keyword) set of the
      mentions table (per-batch dedup bounds the exchange, one sharded
      distinct makes it globally exact — mentions of one turn may span
      blocks after a partitioned write/read round trip).
    - ``utters`` / ``used_tool``: vectorized Arrow kernels over a
      (conv_id, turn_idx, tool) projection of the transcripts — columns
      only, the text never leaves storage.

    Pinned equal to :func:`extract_triples` output by test
    (tests/test_pipeline.py)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..ops.setops import distinct_rows

    def tag_kw_triples(batch: pa.Table) -> pa.Table:
        conv = batch[conv_column]
        conv = conv.combine_chunks() if isinstance(conv, pa.ChunkedArray) else conv
        turn = batch[turn_column]
        turn = turn.combine_chunks() if isinstance(turn, pa.ChunkedArray) else turn
        tid = pc.binary_join_element_wise(conv, pc.cast(turn, pa.string()), "#")
        subj = pc.binary_join_element_wise(tid, batch["keyword"], "#")
        tags = batch["tag"]
        tags = tags.combine_chunks() if isinstance(tags, pa.ChunkedArray) else tags
        obj = pc.binary_join_element_wise(pa.array(["concept:"] * len(tags)), tags, "")
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                subj,
                pa.array(np.full(n, "tagged_as"), type=pa.string()),
                obj,
                conv,
                pc.cast(turn, pa.int32()),
                pa.array(np.ones(n), type=pa.float64()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    tagged = distinct_rows(
        mentions.select_columns([conv_column, turn_column, "tag", "keyword"]),
        [conv_column, turn_column, "tag", "keyword"],
        num_shards=num_shards,
    ).map_batches(tag_kw_triples, batch_format="pyarrow")

    if not include_structural:
        return tagged

    def structural(batch: pa.Table) -> pa.Table:
        conv = batch[conv_column]
        conv = conv.combine_chunks() if isinstance(conv, pa.ChunkedArray) else conv
        turn = batch[turn_column]
        turn = turn.combine_chunks() if isinstance(turn, pa.ChunkedArray) else turn
        turn = pc.cast(turn, pa.int32())
        tid = pc.binary_join_element_wise(conv, pc.cast(turn, pa.string()), "#")
        n = batch.num_rows
        parts = [
            pa.Table.from_arrays(
                [
                    conv,
                    pa.array(np.full(n, "utters"), type=pa.string()),
                    tid,
                    conv,
                    turn,
                    pa.array(np.ones(n), type=pa.float64()),
                ],
                schema=TRIPLE_SCHEMA,
            )
        ]
        if tool_column in batch.schema.names:
            tool = batch[tool_column]
            tool = tool.combine_chunks() if isinstance(tool, pa.ChunkedArray) else tool
            mask = pc.fill_null(
                pc.and_kleene(pc.is_valid(tool), pc.not_equal(tool, "")), False
            )
            if pc.any(mask).as_py():
                m = pc.sum(pc.cast(mask, pa.int64())).as_py()
                parts.append(
                    pa.Table.from_arrays(
                        [
                            tid.filter(mask),
                            pa.array(np.full(m, "used_tool"), type=pa.string()),
                            pc.cast(tool.filter(mask), pa.string()),
                            conv.filter(mask),
                            turn.filter(mask),
                            pa.array(np.ones(m), type=pa.float64()),
                        ],
                        schema=TRIPLE_SCHEMA,
                    )
                )
        return pa.concat_tables(parts)

    cols = [conv_column, turn_column]
    if tool_column in transcripts_meta.schema().names:
        cols.append(tool_column)
    struct = transcripts_meta.select_columns(cols).map_batches(
        structural, batch_format="pyarrow"
    )
    return tagged.union(struct)


NODE_GLOBAL_PART_KEY = "__kg_global__"


def with_node_part_key(nodes: "ray.data.Dataset") -> "ray.data.Dataset":
    """Append ``node_part_key``: the routing key that makes the node table
    INCREMENTALLY maintainable.  conversation/turn/mention node ids are
    conv-prefixed ('conv', 'conv#turn', 'conv#turn#kw'), so those rows
    route by their source conversation — a changed conv maps to an exact
    node-partition set; the cross-conversation node types (tool, concept)
    route to one shared ``__kg_global__`` partition that every update
    rebuilds from a column-pruned scan (their cardinality is tool/ontology
    sized, not corpus sized).

    Assumes conv_ids do not contain ``#`` — the id separator the whole
    node-id scheme is built on (`turn_id`)."""
    import pyarrow.compute as pc

    def add(batch: pa.Table) -> pa.Table:
        ids = batch["node_id"]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        types = batch["node_type"]
        conv = pc.list_element(pc.split_pattern(ids, "#"), 0)
        key = pc.if_else(
            pc.is_in(types, value_set=pa.array(["tool", "concept"])),
            pa.scalar(NODE_GLOBAL_PART_KEY),
            conv,
        )
        return batch.append_column("node_part_key", key)

    return nodes.map_batches(add, batch_format="pyarrow")


def tool_nodes_from_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """The global tool-node rows from a column-pruned scan of the edge
    table: distinct ``obj`` of ``used_tool`` edges (tool cardinality —
    tiny — is the exchange volume after per-batch dedup)."""
    from ..ops.setops import distinct_rows

    def just_tools(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(batch["pred"], "used_tool")
        return pa.table({"obj": batch["obj"].filter(keep)})

    tools = distinct_rows(
        edges.select_columns(["pred", "obj"]).map_batches(
            just_tools, batch_format="pyarrow"
        ),
        ["obj"],
        num_shards=16,
    )

    def to_nodes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        obj = batch["obj"]
        obj = obj.combine_chunks() if isinstance(obj, pa.ChunkedArray) else obj
        n = len(obj)
        return pa.Table.from_arrays(
            [
                pc.binary_join_element_wise(
                    pa.array(["tool:"] * n), obj, ""
                ),
                pa.array(["tool"] * n, type=pa.string()),
                pc.cast(obj, pa.string()),
                pa.nulls(n, type=pa.string()),
            ],
            schema=NODE_SCHEMA,
        )

    return tools.map_batches(to_nodes, batch_format="pyarrow")


def build_nodes(
    triples: "ray.data.Dataset", ontology_rows=None
) -> "ray.data.Dataset":
    """Canonical node table from the triple stream.

    Turn and mention node ids are unique by construction (no shuffle needed);
    conversation and tool nodes repeat across blocks, so the stream is
    pre-deduped per batch and then reduced with a groupby — the shuffle moves
    at most (distinct convs x blocks) rows.  Concept nodes come straight from
    the broadcast ontology (driver-side, tiny).
    """
    from ..ops.agg import sharded_groupby_apply

    nodes = triples.map_batches(_batch_nodes, batch_format="pyarrow")

    # duplicate node rows are identical, so "first non-null" per column is a
    # pick-any.  Sharded combine (ops/agg.py): node count scales with the
    # corpus, and BOTH a per-group map_groups (~1.5 ms/group) and a key-wise
    # Ray aggregate (~0.25 ms/group) pay per-node Python overhead — hashing
    # into shards keeps the callback count O(shards) with one vectorized
    # pandas first() per shard.
    def first_per_node(df):
        return (
            df.groupby("node_id", sort=False)
            .first()
            .reset_index()[["node_id", "node_type", "label", "category"]]
        )

    deduped = sharded_groupby_apply(nodes, ["node_id"], first_per_node)

    def to_schema(batch: pa.Table) -> pa.Table:
        # a shard whose category column is all-null comes back as Arrow
        # null type; cast pins every block to NODE_SCHEMA
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [pc.cast(batch[f.name], f.type) for f in NODE_SCHEMA],
            schema=NODE_SCHEMA,
        )

    deduped = deduped.map_batches(to_schema, batch_format="pyarrow")
    if ontology_rows:
        concept_rows = pa.Table.from_pydict(
            {
                "node_id": [concept_id(r.tag) for r in _uniq_tags(ontology_rows)],
                "node_type": ["concept"] * len(_uniq_tags(ontology_rows)),
                "label": [r.tag for r in _uniq_tags(ontology_rows)],
                "category": [r.category for r in _uniq_tags(ontology_rows)],
            },
            schema=NODE_SCHEMA,
        )
        deduped = deduped.union(ray.data.from_arrow(concept_rows))
    return deduped


def _uniq_tags(rows):
    seen = {}
    for r in rows:
        if r.tag not in seen:
            seen[r.tag] = r
    return list(seen.values())


# --- concept scores -------------------------------------------------------

def concept_scores(
    mentions: "ray.data.Dataset", count_column: Optional[str] = None
) -> "ray.data.Dataset":
    """Per-concept reduce: total mention occurrences + distinct conversations.

    Two-phase: in-batch partial counts per (tag, conv_id) — this is the
    skew-salting step; a hot conversation collapses to one row per block —
    then ``groupby(tag, conv_id).sum`` and a final tiny ``groupby(tag)``.
    Input is either the raw mention stream (each row counts 1) or the
    per-turn pre-counted table (pass ``count_column`` — far fewer rows enter
    the exchange).  Output: (tag, concept_id, n_mentions, n_convs).
    """

    def partial(batch: pa.Table) -> pa.Table:
        counts: Dict[tuple, int] = {}
        weights = (
            batch[count_column].to_pylist() if count_column else [1] * batch.num_rows
        )
        for tag, conv, w in zip(
            batch["tag"].to_pylist(), batch["conv_id"].to_pylist(), weights
        ):
            counts[(tag, conv)] = counts.get((tag, conv), 0) + w
        return pa.Table.from_pydict(
            {
                "tag": [k[0] for k in counts],
                "conv_id": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )

    from ..ops.agg import sharded_groupby_apply

    def combine_conv(df):
        # sharded: (tag, conv) count scales with conversations
        return (
            df.groupby(["tag", "conv_id"], sort=False)["n"]
            .sum()
            .reset_index(name="n_mentions_conv")
        )

    per_conv = sharded_groupby_apply(
        mentions.map_batches(partial, batch_format="pyarrow"),
        ["tag", "conv_id"],
        combine_conv,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return batch

    scores = (
        per_conv.map_batches(finalize, batch_format="pyarrow")
        .groupby("tag")
        .aggregate(
            Sum("n_mentions_conv", alias_name="n_mentions"),
            Count(alias_name="n_convs"),
        )
    )

    def add_concept(batch: pa.Table) -> pa.Table:
        cid = pa.array([concept_id(t) for t in batch["tag"].to_pylist()])
        return batch.add_column(1, pa.field("concept_id", pa.string()), cid)

    return scores.map_batches(add_concept, batch_format="pyarrow")


def conversation_stats(
    mentions: "ray.data.Dataset", salt_buckets: int = 16
) -> "ray.data.Dataset":
    """Per-conversation mention/turn/concept counts with an EXPLICIT salted
    two-phase reduce (north_rule: "explicit salting for hot conversations").

    A conversation with millions of turns would make a bare
    ``groupby(conv_id)`` ship every one of its mention rows to a single
    reducer — and shipping per-turn/per-tag LISTS through the exchange
    would still move one list element per turn no matter how the rows are
    salted.  Instead, distinct counting is flattened into a keyed table:

    - phase 0 (in-batch, vectorized pandas): pre-aggregated mention counts
      per ``(conv, salt=turn%k)`` plus the batch-DISTINCT ``(conv, turn)``
      and ``(conv, tag)`` pairs, emitted as tall ``(conv_id, kind, key, n)``
      rows — no lists, and a hot conversation's rows spread over its
      distinct turn/tag keys plus k salt rows;
    - phase 1: ``groupby(conv_id, kind, key).sum(n)`` — one surviving row
      per globally distinct key;
    - phase 2: in-batch partial reduce to ``(conv, n_mentions, n_turns,
      n_tags)`` then a tiny ``groupby(conv_id).sum`` — the final exchange
      carries three ints per conversation per block.

    Output: (conv_id, n_mentions, n_turns, n_tags).
    """
    import pandas as pd

    def phase0(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "tag": batch["tag"],
            }
        ).to_pandas()
        m = (
            df.assign(key=(df["turn_idx"] % salt_buckets).astype(str))
            .groupby(["conv_id", "key"], sort=False)
            .size()
            .reset_index(name="n")
        )
        m["kind"] = "m"
        t = df[["conv_id", "turn_idx"]].drop_duplicates()
        t = pd.DataFrame(
            {"conv_id": t["conv_id"], "key": t["turn_idx"].astype(str),
             "n": 0, "kind": "t"}
        )
        g = df[["conv_id", "tag"]].drop_duplicates()
        g = pd.DataFrame(
            {"conv_id": g["conv_id"], "key": g["tag"], "n": 0, "kind": "g"}
        )
        out = pd.concat([m, t, g], ignore_index=True)
        return pa.Table.from_pydict(
            {
                "conv_id": pa.array(out["conv_id"], type=pa.string()),
                "kind": pa.array(out["kind"], type=pa.string()),
                "key": pa.array(out["key"], type=pa.string()),
                "n": pa.array(out["n"], type=pa.int64()),
            }
        )

    from ..ops.agg import sharded_groupby_apply

    def combine_keyed(df):
        # sharded: the key table has one row per distinct turn/tag per conv
        # — corpus-scaled, so a key-wise aggregate is per-row Python
        return (
            df.groupby(["conv_id", "kind", "key"], sort=False)["n"]
            .sum()
            .reset_index(name="n")
        )

    keyed = sharded_groupby_apply(
        mentions.map_batches(phase0, batch_format="pyarrow"),
        ["conv_id", "kind", "key"],
        combine_keyed,
    )

    def phase2(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        kinds = df["kind"]
        per_conv = pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "n_mentions": df["n"].where(kinds == "m", 0),
                "n_turns": (kinds == "t").astype("int64"),
                "n_tags": (kinds == "g").astype("int64"),
            }
        ).groupby("conv_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(per_conv, preserve_index=False)

    def combine_final(df):
        # sharded: one group per conversation — corpus-scaled
        return (
            df.groupby("conv_id", sort=False)[["n_mentions", "n_turns", "n_tags"]]
            .sum()
            .reset_index()
        )

    return sharded_groupby_apply(
        keyed.map_batches(phase2, batch_format="pyarrow"),
        ["conv_id"],
        combine_final,
    )
