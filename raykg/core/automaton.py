"""Aho-Corasick automaton over token sequences.

The engine's replacement for spaCy's ``PhraseMatcher`` (reference
``ontology_tagger.py:288-302``): patterns are sequences of token strings
(token TEXT, or token LEMMA when lemmatizing — ``nlp/utils.py:17-19``);
matching walks the token sequence of one sentence and emits every
occurrence, including overlapping and nested spans, exactly like
``PhraseMatcher(... )(doc, as_spans=True)``.

Tokens are interned to integer ids at build time; a probe token that is not
in the pattern vocabulary can never participate in a match, so the walk
resets to the root in O(1) without touching the failure chain.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple
from collections import deque


class TokenAutomaton:
    """Multi-pattern matcher over token sequences.

    ``add(pattern_tokens, pattern_id)`` registers a pattern; ``build()``
    computes failure/output links; ``find(tokens)`` yields
    ``(start, end, pattern_id)`` half-open token spans for every match.
    """

    def __init__(self) -> None:
        self._vocab: Dict[str, int] = {}
        # trie: list of dicts token_id -> state
        self._goto: List[Dict[int, int]] = [{}]
        self._out: List[List[Tuple[int, int]]] = [[]]  # state -> [(length, pattern_id)]
        self._fail: List[int] = [0]
        self._built = False
        self.num_patterns = 0

    def _intern(self, token: str) -> int:
        tid = self._vocab.get(token)
        if tid is None:
            tid = len(self._vocab)
            self._vocab[token] = tid
        return tid

    def add(self, pattern: Sequence[str], pattern_id: int) -> None:
        if self._built:
            raise RuntimeError("automaton already built")
        if not pattern:
            return
        state = 0
        for tok in pattern:
            tid = self._intern(tok)
            nxt = self._goto[state].get(tid)
            if nxt is None:
                nxt = len(self._goto)
                self._goto.append({})
                self._out.append([])
                self._fail.append(0)
                self._goto[state][tid] = nxt
            state = nxt
        self._out[state].append((len(pattern), pattern_id))
        self.num_patterns += 1

    def build(self) -> "TokenAutomaton":
        queue: deque[int] = deque()
        for state in self._goto[0].values():
            self._fail[state] = 0
            queue.append(state)
        while queue:
            s = queue.popleft()
            for tid, nxt in self._goto[s].items():
                queue.append(nxt)
                f = self._fail[s]
                while f and tid not in self._goto[f]:
                    f = self._fail[f]
                self._fail[nxt] = self._goto[f].get(tid, 0) if self._goto[f].get(tid, 0) != nxt else 0
                self._out[nxt] = self._out[nxt] + self._out[self._fail[nxt]]
        self._built = True
        return self

    def find(self, tokens: Sequence[str]) -> List[Tuple[int, int, int]]:
        """All matches as (start, end, pattern_id), end exclusive, in
        left-to-right order of match *end* (PhraseMatcher emission order is
        irrelevant downstream; formatters consume all matches)."""
        if not self._built:
            raise RuntimeError("call build() first")
        vocab = self._vocab
        goto = self._goto
        fail = self._fail
        out = self._out
        matches: List[Tuple[int, int, int]] = []
        state = 0
        for i, tok in enumerate(tokens):
            tid = vocab.get(tok, -1)
            if tid < 0:
                state = 0
                continue
            while state and tid not in goto[state]:
                state = fail[state]
            state = goto[state].get(tid, 0)
            if out[state]:
                for length, pid in out[state]:
                    matches.append((i - length + 1, i + 1, pid))
        return matches


def filter_longest(matches: Iterable[Tuple[int, int, int]]) -> List[Tuple[int, int, int]]:
    """spaCy ``util.filter_spans`` semantics for the EntityRuler/doc.ents path
    (reference ``ontology_tagger.py:251-266``): longest span wins, ties go to
    the earliest span, result is non-overlapping and sorted by start."""
    ordered = sorted(matches, key=lambda m: (-(m[1] - m[0]), m[0]))
    taken: set[int] = set()
    kept: List[Tuple[int, int, int]] = []
    for start, end, pid in ordered:
        if any(i in taken for i in range(start, end)):
            continue
        taken.update(range(start, end))
        kept.append((start, end, pid))
    kept.sort(key=lambda m: m[0])
    return kept
