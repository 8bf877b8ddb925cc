"""Vectorized batch matcher for simple text.

The general path tokenizes row by row in Python.  For the overwhelmingly
common large-corpus shape — ASCII text whose tokens are plain alphanumeric
words separated by single spaces — a token-sequence match IS a byte-substring
match at space boundaries, so matching runs directly on the Arrow string
column's data buffer with numpy kernels and never tokenizes at all:

    zero-copy view of the concatenated row bytes + the offsets array
      -> (if ignore_case) branchless ASCII lower in one vector pass
      -> per pattern: candidate positions where byte[pos] == pattern[0],
         narrowed by vectorized equality on the remaining pattern bytes
      -> boundary check (space or row edge on both sides) + same-row check
         via searchsorted on the row-offsets array
      -> per-row counts via bincount

This replaced an earlier split_pattern + dictionary_encode + shifted-equality
design: the byte kernel skips the per-batch tokenize/vocab build entirely
(~2x on the triple-build hot stage) and is pinned equal to the general
per-row engine by the fuzz suite (tests/test_vector_match.py).

Eligibility is per row (``isascii`` + alnum-and-space only + whole text is
one sentence) so mixed batches split into a vectorized majority and a
general-path remainder with identical semantics.  Because eligible rows are
single-space separated alnum words with no leading/trailing space, a byte
match bounded by spaces/row edges and contained in one row is exactly a
token-sequence match — including overlapping self-matches, which the
all-matches mode counts and which the candidate scan also finds.  Lemma mode
always takes the general path; category (longest-match) mode is vectorizable
only when no two patterns share a token (overlaps impossible), checked at
build time.

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
        # token text -> dense id over all pattern tokens (used only for the
        # mode_ok disjointness check above and kept for introspection)
        self.token_ids: Dict[str, int] = {}
        self.pattern_id_seqs: List[Tuple[int, ...]] = []
        for toks in matcher.pattern_tokens:
            seq = []
            for t in toks:
                tid = self.token_ids.setdefault(t, len(self.token_ids))
                seq.append(tid)
            self.pattern_id_seqs.append(tuple(seq))
        # the byte form each pattern takes inside an eligible row: tokens
        # joined by the single space eligible rows guarantee.  Non-ASCII
        # pattern bytes simply never match an (all-ASCII) eligible row.
        self.pattern_bytes: List[bytes] = [
            " ".join(toks).encode("utf-8") for toks in matcher.pattern_tokens
        ]
        # 256-entry LUT of the patterns' first bytes: ONE vectorized pass
        # finds every candidate start for every pattern at once
        self.first_byte_lut = np.zeros(256, dtype=bool)
        for pb in self.pattern_bytes:
            if pb:
                self.first_byte_lut[pb[0]] = True

    # -- row eligibility ----------------------------------------------------

    _ELIGIBLE_RE = r"^[a-zA-Z0-9]+( [a-zA-Z0-9]+)*$"

    @classmethod
    def eligible_rows(cls, texts) -> np.ndarray:
        """True where the row is simple: ASCII alnum words separated by
        single spaces (no punctuation -> no sentence boundaries, no affix
        tokenization).  Accepts a pyarrow Array (vectorized RE2 check, no
        per-row Python strings) or a Python sequence.  (A numpy byte-LUT
        variant was measured here and lost to RE2: the per-row segment
        reductions cost more than the single regex pass.)"""
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
        if n == 0 or not self.pattern_bytes:
            return empty

        if isinstance(texts, pa.ChunkedArray):
            arr = texts.combine_chunks()
        elif isinstance(texts, pa.Array):
            arr = texts
        else:
            arr = pa.array(texts, type=pa.string())

        # zero-copy view of the concatenated row bytes + per-row bounds
        dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=dt)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        base = int(offs[0])
        starts = offs[:-1] - base
        ends = offs[1:] - base
        total = int(ends[-1])
        data_buf = arr.buffers()[2]
        if data_buf is None or total == 0:
            return empty
        buf = np.frombuffer(data_buf, dtype=np.uint8)[base : base + total]
        if self.ignore_case:
            low = np.where((buf >= 65) & (buf <= 90), buf + 32, buf)
        else:
            low = buf
        T = total

        # ONE pass finds the candidate starts for every pattern: positions at
        # a token start (row start, or preceded by a space — spaces are only
        # ever intra-row since eligible rows never start/end with one) whose
        # byte is some pattern's first byte.  Everything after is
        # proportional to the candidate count, not the buffer length.
        tok_start = np.empty(T, dtype=bool)
        tok_start[0] = True
        np.equal(low[:-1], 32, out=tok_start[1:])
        # starts<T: an empty trailing row has start==T (out of bounds); an
        # empty mid-batch row's start is the next row's start — already a
        # genuine token start
        tok_start[starts[starts < T]] = True
        cand_all = np.nonzero(self.first_byte_lut[low] & tok_start)[0]
        if not len(cand_all):
            return empty
        b0 = low[cand_all]

        rows_out: List[np.ndarray] = []
        pids_out: List[np.ndarray] = []
        counts_out: List[np.ndarray] = []
        for pid, pb in enumerate(self.pattern_bytes):
            L = len(pb)
            if L == 0 or L > T:
                continue
            cand = cand_all[b0 == pb[0]]
            if L > 1:
                cand = cand[cand <= T - L]
                for k in range(1, L):
                    if not len(cand):
                        break
                    cand = cand[low[cand + k] == pb[k]]
            if not len(cand):
                continue
            row = np.searchsorted(ends, cand, side="right")
            # right boundary: a space or the row's own edge, with the whole
            # match inside one row (rows abut directly in the buffer); the
            # left boundary is the tok_start filter above
            e = cand + L
            row_end = ends[row]
            at_e = low[np.minimum(e, T - 1)]
            ok = (e == row_end) | ((e < row_end) & (at_e == 32))
            if not ok.any():
                continue
            per_row = np.bincount(row[ok], minlength=n)
            hit_rows = np.nonzero(per_row)[0]
            rows_out.append(hit_rows.astype(np.int64))
            pids_out.append(np.full(len(hit_rows), pid, dtype=np.int64))
            counts_out.append(per_row[hit_rows].astype(np.int64))
        if not rows_out:
            return empty
        return (
            np.concatenate(rows_out),
            np.concatenate(pids_out),
            np.concatenate(counts_out),
        )

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
