"""The tagging stage: a stateful actor-pool ``map_batches`` transform.

This is the Ray-Data-native re-expression of the reference's driver-side
``Tagger.tag_and_format`` loop (``ontology_tagger.py:94-137`` +
``formatting/*``): instead of one Python process mutating a pandas
DataFrame row by row, the cleaned ontology is broadcast once (``ray.put``)
and a pool of actors compiles per-language token automata in ``__init__`` /
lazily per language, then streams zero-copy Arrow batches through
sentence-split -> normalize -> match -> format.

Output modes: the reference's three formats plus the target-native
``mentions`` long table that feeds the graph layer (SURVEY.md §1.2).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pyarrow as pa

import ray
import ray.data

from ..core.format import (
    TAG_COLUMNS,
    category_column_name,
    format_doc,
    format_doc_json,
    format_match_rows,
    generate_unique_columns,
)
from ..core.ontology import (
    CompiledMatcher,
    OntologyRow,
    clean_ontology,
    compile_matcher,
    process_document,
)
from ..core.tokenize import Tokenizer, check_language
from .config import PipelineConfig

def resolve_concurrency(config: "PipelineConfig"):
    """None -> fixed pool sized to ~3/4 of the cluster's CPUs.

    Fixed pools because Ray 2.49's autoscaling pool was observed pinned at
    min_size under a busy upstream; 3/4 because a pool that reserves every
    CPU starves the read stage into a standstill (observed as a whole-run
    deadlock on a pool == num_cpus)."""
    if config.concurrency is not None:
        return config.concurrency
    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, (ncpu * 3) // 4)


MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("match_start", pa.int32()),
        ("match_end", pa.int32()),
        ("keyword", pa.string()),
        ("tag", pa.string()),
        ("category", pa.string()),
        ("sentence", pa.string()),
    ]
)


def ontology_rows_from_table(table: pa.Table, config: PipelineConfig) -> List[tuple]:
    """Project the ontology table to (tag, keyword[, category]) row tuples."""
    cols = [config.tag_column, config.keyword_column]
    if config.has_category:
        cols.append(config.category_column)
    t = table.select(cols)
    return list(zip(*[t.column(i).to_pylist() for i in range(t.num_columns)]))


class _MentionCountActorBody:
    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self
        texts = batch[m.config.text_column].to_pylist()
        langs = m._row_languages(batch)
        convs = batch[m.conv_column].to_pylist()
        turns = batch[m.turn_column].to_pylist()
        extras = getattr(m, "extra_columns", ())
        extra_vals = {c: batch[c].to_pylist() for c in extras}
        out = {"conv_id": [], "turn_idx": [], "tag": [], "keyword": [], "n_matches": []}
        out_extra: Dict[str, list] = {c: [] for c in extras}
        per_row = m._batch_tag_counts(texts, langs)
        for i, (conv, turn, row) in enumerate(zip(convs, turns, per_row)):
            counts: Dict[tuple, int] = {}
            for tag, _cat, kw, cnt in row:
                counts[(tag, kw)] = counts.get((tag, kw), 0) + cnt
            for (tag, kw), n in counts.items():
                out["conv_id"].append(conv)
                out["turn_idx"].append(turn)
                out["tag"].append(tag)
                out["keyword"].append(kw)
                out["n_matches"].append(n)
                for c in extras:
                    out_extra[c].append(extra_vals[c][i])
        cols = {
            "conv_id": pa.array(out["conv_id"], type=pa.string()),
            "turn_idx": pa.array(out["turn_idx"], type=pa.int32()),
            "tag": pa.array(out["tag"], type=pa.string()),
            "keyword": pa.array(out["keyword"], type=pa.string()),
            "n_matches": pa.array(out["n_matches"], type=pa.int64()),
        }
        for c in extras:
            cols[c] = pa.array(out_extra[c], type=batch.schema.field(c).type)
        return pa.Table.from_pydict(cols)


class _DocTagsActorBody:
    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self
        texts = batch[m.config.text_column].to_pylist()
        langs = m._row_languages(batch)
        convs = batch[m.conv_column].to_pylist()
        turns = batch[m.turn_column].to_pylist()
        out = {"conv_id": [], "turn_idx": [], "tags_sorted": [],
               "keywords_sorted": [], "n_tags": []}
        per_row = m._batch_tag_counts(texts, langs)
        for conv, turn, row in zip(convs, turns, per_row):
            tags = {t for t, _c, _k, _n in row}
            kws = {k for _t, _c, k, _n in row}
            if not tags:
                continue
            out["conv_id"].append(conv)
            out["turn_idx"].append(turn)
            out["tags_sorted"].append(",".join(sorted(tags)))
            out["keywords_sorted"].append(",".join(sorted(kws)))
            out["n_tags"].append(len(tags))
        return pa.Table.from_pydict(
            {
                "conv_id": pa.array(out["conv_id"], type=pa.string()),
                "turn_idx": pa.array(out["turn_idx"], type=pa.int32()),
                "tags_sorted": pa.array(out["tags_sorted"], type=pa.string()),
                "keywords_sorted": pa.array(out["keywords_sorted"], type=pa.string()),
                "n_tags": pa.array(out["n_tags"], type=pa.int64()),
            }
        )


class TagActor:
    """Callable class for ``map_batches``: holds the compiled dictionaries.

    ``ontology`` is either the cleaned row list or an ``ObjectRef`` to it
    (broadcast with ``ray.put`` so N actors share one copy in the object
    store instead of N copies in task specs).
    """

    def __init__(self, ontology, config: PipelineConfig):
        if isinstance(ontology, ray.ObjectRef):
            ontology = ray.get(ontology)
        self.ontology: List[OntologyRow] = ontology
        self.config = config
        self.has_category = config.has_category
        self.all_categories: List[str] = []
        if self.has_category:
            seen = set()
            for r in ontology:
                if r.category not in seen:
                    seen.add(r.category)
                    self.all_categories.append(r.category)
        self._matchers: Dict[str, CompiledMatcher] = {}
        self._sent_tokenizers: Dict[str, Tokenizer] = {}
        if not config.multilingual:
            self._get_matcher(config.language)  # build eagerly for the fixed language

    # -- per-language state -------------------------------------------------

    def _get_matcher(self, language: str) -> CompiledMatcher:
        m = self._matchers.get(language)
        if m is None:
            check_language(language)
            m = compile_matcher(
                self.ontology, language, self.config.match_config, self.has_category
            )
            self._matchers[language] = m
            self._sent_tokenizers[language] = Tokenizer(language)
        return m

    # -- batch processing ---------------------------------------------------

    def _row_languages(self, batch: pa.Table) -> Sequence[Optional[str]]:
        if self.config.multilingual:
            return batch[self.config.language_column].to_pylist()
        return [self.config.language] * batch.num_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmt = self.config.output_format
        if fmt == "one_row_per_match":
            return self._format_by_match(batch)
        if fmt == "one_row_per_doc":
            return self._format_by_doc(batch, json_mode=False)
        if fmt == "one_row_per_doc_json":
            return self._format_by_doc(batch, json_mode=True)
        raise ValueError(f"unknown output format {fmt}")

    def _doc_mentions(self, text: Optional[str], language: Optional[str]):
        matcher = self._get_matcher(language)
        # single-tokenization fast path (falls back to the reference
        # sentencize->normalize->tokenize flow per sentence when
        # normalization is not the identity)
        try:
            return process_document(matcher, text)
        except Exception as e:
            # the reference quotes the offending docs TRUNCATED in its
            # tokenization-error message (spacy_tokenizer.py:428,
            # cleaning_utils.py:24-40) — same log-hygiene contract here
            from ..core.format import truncate_text_list

            raise type(e)(
                f"Tokenization error: {e} for document(s): "
                f"'{truncate_text_list([text or ''])}'"
            ) from e

    def _batch_tag_counts(self, texts, langs):
        """Per row: list of (tag, category, keyword, occurrence_count).

        Rows that are "simple" (ASCII, alnum+single-space only) and a
        matching mode that permits it go through the fully vectorized
        Arrow/numpy kernel (core/vector_match.py) — zero per-token Python
        strings; everything else takes the general per-row path.  Results
        are identical up to within-row ordering (general path: appearance
        order; vectorized: ontology order)."""
        import numpy as np

        from ..core.vector_match import get_vectorized

        n = len(texts)
        result = [None] * n
        vm = None
        matcher = None
        if not self.config.multilingual and self.config.use_vectorized:
            matcher = self._get_matcher(self.config.language)
            vm = get_vectorized(matcher)
        if vm is not None:
            mask = vm.eligible_rows(texts)
            idx = np.nonzero(mask)[0]
            if len(idx):
                counts = vm.batch_counts([texts[i] for i in idx])
                pats = matcher.patterns
                kws = matcher.pattern_keywords
                k2t = matcher.keyword_to_tag
                has_cat = self.has_category
                for pos, i in enumerate(idx):
                    row = []
                    for pid, cnt in counts[pos].items():
                        tag, cat = pats[pid]
                        kw = kws[pid]
                        if not has_cat:
                            tag = k2t.get(kw, tag)
                        row.append((tag, cat, kw, cnt))
                    result[int(i)] = row
        for i in range(n):
            if result[i] is None:
                agg = {}
                order = []
                for m in self._doc_mentions(texts[i], langs[i]):
                    key = (m.tag, m.category, m.keyword)
                    if key not in agg:
                        agg[key] = 0
                        order.append(key)
                    agg[key] += 1
                result[i] = [(t, c, k, agg[(t, c, k)]) for (t, c, k) in order]
        return result

    def _format_by_match(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.config.text_column].to_pylist()
        langs = self._row_languages(batch)
        tag_cols = TAG_COLUMNS["one_row_per_match"][
            "category" if self.has_category else "no_category"
        ]
        out_names = generate_unique_columns(batch.schema.names, tag_cols)
        indices: List[int] = []
        columns: List[List[Optional[str]]] = [[] for _ in out_names]
        for i, (text, lang) in enumerate(zip(texts, langs)):
            rows = format_match_rows(self._doc_mentions(text, lang), self.has_category)
            if rows:
                for row in rows:
                    indices.append(i)
                    for col, val in zip(columns, row):
                        col.append(val)
            else:  # keep unmatched doc with null tag columns
                indices.append(i)
                for col in columns:
                    col.append(None)
        base = batch.take(pa.array(indices, type=pa.int64()))
        return _append_after(
            base,
            self.config.text_column,
            out_names,
            [pa.array(c, type=pa.string()) for c in columns],
        )

    def _format_by_doc(self, batch: pa.Table, json_mode: bool) -> pa.Table:
        texts = batch[self.config.text_column].to_pylist()
        langs = self._row_languages(batch)
        mode = "category" if self.has_category else "no_category"
        if json_mode:
            logical_cols = TAG_COLUMNS["one_row_per_doc_json"][mode]
        elif self.has_category:
            logical_cols = [category_column_name(c) for c in self.all_categories] + [
                "tag_keywords",
                "tag_sentences",
            ]
        else:
            logical_cols = TAG_COLUMNS["one_row_per_doc"][mode]
        out_names = generate_unique_columns(batch.schema.names, logical_cols)
        rename = dict(zip(logical_cols, out_names))
        columns: Dict[str, List[Optional[str]]] = {n: [] for n in out_names}
        for text, lang in zip(texts, langs):
            mentions = self._doc_mentions(text, lang)
            if json_mode:
                values = format_doc_json(mentions, self.has_category)
            else:
                values = format_doc(
                    mentions, self.has_category, all_categories=self.all_categories
                )
            for k, v in values.items():
                columns[rename[k]].append(v)
        return _append_after(
            batch,
            self.config.text_column,
            out_names,
            [pa.array(columns[n], type=pa.string()) for n in out_names],
        )


class MentionActor(TagActor):
    """Emits the long mention table (conv/turn keys + char offsets) that the
    graph layer consumes — no input-row duplication, only matches."""

    def __init__(self, ontology, config: PipelineConfig,
                 conv_column: str = "conv_id", turn_column: str = "turn_idx",
                 extra_columns: Sequence[str] = ()):
        super().__init__(ontology, config)
        self.conv_column = conv_column
        self.turn_column = turn_column
        # per-turn attribute passthrough (e.g. event time for temporal KG
        # queries): each emitted mention row copies its turn's value, so no
        # downstream join is needed to recover turn metadata
        self.extra_columns = tuple(extra_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.config.text_column].to_pylist()
        langs = self._row_languages(batch)
        convs = batch[self.conv_column].to_pylist()
        turns = batch[self.turn_column].to_pylist()
        out = {name: [] for name in MENTION_SCHEMA.names}
        for conv, turn, text, lang in zip(convs, turns, texts, langs):
            for m in self._doc_mentions(text, lang):
                out["conv_id"].append(conv)
                out["turn_idx"].append(turn)
                out["sent_idx"].append(m.sent_idx)
                out["match_start"].append(m.start_char)
                out["match_end"].append(m.end_char)
                out["keyword"].append(m.keyword)
                out["tag"].append(m.tag)
                out["category"].append(m.category)
                out["sentence"].append(m.sentence)
        return pa.Table.from_pydict(out, schema=MENTION_SCHEMA)


class MentionCountActor(_MentionCountActorBody, MentionActor):
    """Per-turn (tag, keyword) occurrence counts with NO shuffle: a turn's
    mentions are all produced inside one actor call, so the count is final
    the moment the turn is processed — a groupby here would be an all-to-all
    exchange at 10^12 turns for nothing."""


class DocTagsActor(_DocTagsActorBody, MentionActor):
    """Per-turn sorted tag/keyword rollup, shuffle-free by the same
    turn-locality argument."""


def _mention_stage(actor_cls, ds, ontology, config, conv_column="conv_id",
                   turn_column="turn_idx", extra_columns=()):
    ref = _broadcast_ontology(ontology, config)
    return ds.map_batches(
        actor_cls,
        fn_constructor_kwargs={
            "ontology": ref,
            "config": config,
            "conv_column": conv_column,
            "turn_column": turn_column,
            "extra_columns": tuple(extra_columns),
        },
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=resolve_concurrency(config),
        num_cpus=config.num_cpus,
    )


def extract_mention_counts(ds, ontology, config, **kw):
    """(conv_id, turn_idx, tag, keyword, n_matches) — streaming, no shuffle."""
    return _mention_stage(MentionCountActor, ds, ontology, config, **kw)


def extract_doc_tags(ds, ontology, config, **kw):
    """(conv_id, turn_idx, tags_sorted, keywords_sorted, n_tags) — streaming,
    no shuffle; only matched turns are emitted."""
    return _mention_stage(DocTagsActor, ds, ontology, config, **kw)


def _append_after(
    base: pa.Table, after_column: str, names: Sequence[str], arrays: Sequence[pa.Array]
) -> pa.Table:
    """Insert new columns immediately after ``after_column``
    (reference ``move_columns_after``, cleaning_utils.py:95-117)."""
    pos = base.schema.names.index(after_column) + 1
    for offset, (name, arr) in enumerate(zip(names, arrays)):
        base = base.add_column(pos + offset, pa.field(name, arr.type), arr)
    return base


def _broadcast_ontology(ontology, config: PipelineConfig):
    if isinstance(ontology, pa.Table):
        rows = ontology_rows_from_table(ontology, config)
    elif hasattr(ontology, "to_dict"):  # pandas
        rows = list(
            ontology[
                [config.tag_column, config.keyword_column]
                + ([config.category_column] if config.has_category else [])
            ].itertuples(index=False, name=None)
        )
    else:
        rows = list(ontology)
    if rows and isinstance(rows[0], OntologyRow):  # already cleaned
        cleaned = rows
    else:
        cleaned = clean_ontology(rows, has_category=config.has_category)
    # small ontologies ride in the actor-constructor args directly (avoids
    # the Ray actor-restart caveat for object-store constructor args,
    # ray issue #53727); big ones are broadcast once via the object store
    if len(cleaned) < 5000:
        return cleaned
    return ray.put(cleaned)


def tag_dataset(
    ds: "ray.data.Dataset", ontology, config: PipelineConfig
) -> "ray.data.Dataset":
    """``OntologyTagPipeline.run``: the formatted-output pipeline.

    The ontology (pyarrow Table / pandas DataFrame / row tuples) is cleaned
    on the driver (reference ``ontology_tagger.py:145-160``), broadcast once,
    and applied by an autoscaling actor pool.
    """
    ref = _broadcast_ontology(ontology, config)
    return ds.map_batches(
        TagActor,
        fn_constructor_kwargs={"ontology": ref, "config": config},
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=resolve_concurrency(config),
        num_cpus=config.num_cpus,
    )


def extract_mentions(
    ds: "ray.data.Dataset",
    ontology,
    config: PipelineConfig,
    conv_column: str = "conv_id",
    turn_column: str = "turn_idx",
) -> "ray.data.Dataset":
    """Transcripts -> mentions long table (the graph layer's input)."""
    ref = _broadcast_ontology(ontology, config)
    return ds.map_batches(
        MentionActor,
        fn_constructor_kwargs={
            "ontology": ref,
            "config": config,
            "conv_column": conv_column,
            "turn_column": turn_column,
        },
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=resolve_concurrency(config),
        num_cpus=config.num_cpus,
    )
