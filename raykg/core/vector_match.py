"""Vectorized batch matcher for simple text.

The general path tokenizes row by row in Python.  For the overwhelmingly
common large-corpus shape — ASCII text whose tokens are plain alphanumeric
words separated by single spaces — matching is expressible entirely in
Arrow/numpy batch kernels:

    pc.ascii_lower (if ignore_case) -> pc.split_pattern(" ")
      -> list_flatten + dictionary_encode      (one pass, zero Python strings
                                                except the tiny per-batch vocab)
      -> LUT remap: vocab index -> pattern-token id
      -> per-pattern hits via shifted equality on the flat id array
      -> per-row counts via bincount on the row-id array

Eligibility is per row (``isascii`` + alnum-and-space only + whole text is
one sentence) so mixed batches split into a vectorized majority and a
general-path remainder with identical semantics.  Lemma mode always takes
the general path; category (longest-match) mode is vectorizable only when
no two patterns share a token (overlaps impossible), checked at build time.

Used by the count/rollup/triple stages, which need (pattern -> occurrence
count) per row but not character offsets.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ontology import CompiledMatcher


class VectorizedExactMatcher:
    """Batch (pattern_id -> count) counting for eligible rows."""

    def __init__(self, matcher: CompiledMatcher):
        self.matcher = matcher
        cfg = matcher.config
        self.ignore_case = cfg.ignore_case
        # eligibility of the MODE (rows are checked separately):
        # - lemma mode rewrites tokens -> general path only
        # - category mode filters overlaps; safe to vectorize only if no
        #   token occurs in two patterns and no pattern repeats another's
        #   prefix (disjoint token sets make overlap impossible)
        self.mode_ok = not cfg.lemmatization and not cfg.strict_reference
        if matcher.has_category and self.mode_ok:
            seen: set = set()
            for toks in matcher.pattern_tokens:
                # a pattern with a repeated token can have a nontrivial
                # border and therefore self-overlap ("bye bye" in
                # "bye bye bye": shifted-equality counts 2, longest-wins
                # keeps 1) — such patterns force the general path
                if len(set(toks)) != len(toks):
                    self.mode_ok = False
                    break
                if any(t in seen for t in toks):
                    self.mode_ok = False
                    break
                seen.update(toks)
        # token text -> dense id over all pattern tokens
        self.token_ids: Dict[str, int] = {}
        self.pattern_id_seqs: List[Tuple[int, ...]] = []
        for toks in matcher.pattern_tokens:
            seq = []
            for t in toks:
                tid = self.token_ids.setdefault(t, len(self.token_ids))
                seq.append(tid)
            self.pattern_id_seqs.append(tuple(seq))

    # -- row eligibility ----------------------------------------------------

    _ELIGIBLE_RE = r"^[a-zA-Z0-9]+( [a-zA-Z0-9]+)*$"

    @classmethod
    def eligible_rows(cls, texts) -> np.ndarray:
        """True where the row is simple: ASCII alnum words separated by
        single spaces (no punctuation -> no sentence boundaries, no affix
        tokenization).  Accepts a pyarrow Array (vectorized RE2 check, no
        per-row Python strings) or a Python sequence."""
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            m = pc.match_substring_regex(texts, cls._ELIGIBLE_RE)
            return pc.fill_null(m, False).to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            if (
                t
                and t.isascii()
                and "  " not in t
                and t.replace(" ", "").isalnum()
                and t[0] != " "
                and t[-1] != " "
            ):
                out[i] = True
        return out

    # -- the kernel ---------------------------------------------------------

    def batch_hits(self, texts):
        """Per-batch distinct (row, pattern) hits as parallel numpy arrays
        ``(rows, pids, counts)`` — the fully-vectorized form downstream
        stages can consume without per-hit Python objects.  ``texts`` must
        all be eligible rows."""
        n = len(texts)
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
        if n == 0 or not self.pattern_id_seqs:
            return empty
        rows_out: List[np.ndarray] = []
        pids_out: List[np.ndarray] = []
        counts_out: List[np.ndarray] = []
        for pid, rows, per_row in self._pattern_row_counts(texts):
            rows_out.append(rows)
            pids_out.append(np.full(len(rows), pid, dtype=np.int64))
            counts_out.append(per_row)
        if not rows_out:
            return empty
        return (
            np.concatenate(rows_out),
            np.concatenate(pids_out),
            np.concatenate(counts_out),
        )

    def _pattern_row_counts(self, texts):
        """Yield (pid, rows_with_hits, counts_per_those_rows)."""
        n = len(texts)
        if isinstance(texts, pa.ChunkedArray):
            arr = texts.combine_chunks()
        elif isinstance(texts, pa.Array):
            arr = texts
        else:
            arr = pa.array(texts, type=pa.string())
        if self.ignore_case:
            arr = pc.ascii_lower(arr)
        toks = pc.split_pattern(arr, " ")
        flat = pc.list_flatten(toks)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
        enc = pc.dictionary_encode(flat)
        # map the (tiny) per-batch vocabulary to pattern-token ids once
        vocab = enc.dictionary.to_pylist() if isinstance(enc, pa.DictionaryArray) else enc.combine_chunks().dictionary.to_pylist()
        lut = np.full(len(vocab), -1, dtype=np.int64)
        tid_of = self.token_ids
        for vi, v in enumerate(vocab):
            tid = tid_of.get(v)
            if tid is not None:
                lut[vi] = tid
        indices = (
            enc.indices if isinstance(enc, pa.DictionaryArray) else enc.combine_chunks().indices
        ).to_numpy(zero_copy_only=False)
        ids = lut[indices]  # -1 = token not in any pattern

        for pid, seq in enumerate(self.pattern_id_seqs):
            L = len(seq)
            if len(ids) < L:
                continue
            mask = ids[: len(ids) - L + 1] == seq[0]
            for k in range(1, L):
                mask &= ids[k : len(ids) - L + 1 + k] == seq[k]
            if L > 1:
                # a hit must not cross a row boundary
                mask &= row_id[: len(ids) - L + 1] == row_id[L - 1 :]
            if not mask.any():
                continue
            rows = row_id[: len(ids) - L + 1][mask]
            per_row = np.bincount(rows, minlength=n)
            hit_rows = np.nonzero(per_row)[0]
            yield pid, hit_rows.astype(np.int64), per_row[hit_rows].astype(np.int64)

    def batch_counts(self, texts) -> List[Dict[int, int]]:
        """Per eligible row: {pattern_id: occurrence count} (dict form of
        :meth:`batch_hits`)."""
        n = len(texts)
        counts: List[Dict[int, int]] = [dict() for _ in range(n)]
        rows, pids, cnts = self.batch_hits(texts)
        for r, p, c in zip(rows.tolist(), pids.tolist(), cnts.tolist()):
            counts[r][p] = c
        return counts


def get_vectorized(matcher: CompiledMatcher) -> Optional[VectorizedExactMatcher]:
    """Build (and cache on the matcher) the vectorized kernel; None when the
    matching mode can't be vectorized."""
    vm = getattr(matcher, "_vectorized", None)
    if vm is None:
        vm = VectorizedExactMatcher(matcher)
        matcher._vectorized = vm  # type: ignore[attr-defined]
    return vm if vm.mode_ok else None
