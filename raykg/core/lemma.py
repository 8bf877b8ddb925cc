"""Lookup-table lemmatizer.

The reference lemmatizes through spaCy lookup/rule tables downloaded from
spacy-lookups-data (``spacy_tokenizer.py:235-266``); offline, this engine
ships small embedded lemma tables for the conformance-fixture languages and
accepts user-supplied JSON tables for the rest (path pluggable).  The
reference's MODEL-based lemmatization (pl/ru, ``spacy_tokenizer.py:208-215``)
cannot run offline; pl/ru ship paradigm-derived LOOKUP tables instead
(``scripts/gen_lemma_tables.py``) — exact on the reference fixture matrix
and the regular high-frequency paradigms, identity elsewhere, full tables
pluggable via ``RAYKG_LEMMA_DIR``.

Semantics: per-token exact-text lookup with identity fallback, matching the
spaCy lookup-mode lemmatizer's documented behavior; multi-token lemmas are
single-space joined on both the dictionary-build side and the probe side
(``nlp/utils.py:22-32,35-46``; SURVEY.md Appendix B).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List, Sequence

_DATA_DIR = os.path.join(os.path.dirname(__file__), "lemma_data")

# Languages for which the reference can lemmatize via lookup/rule tables
# (language_support.py:88-130). We can serve any of them given a table file;
# embedded tables cover the fixture languages.
LOOKUP_LEMMA_LANGUAGES = {
    "bn", "ca", "cs", "da", "de", "el", "en", "es", "fa", "fr", "hr", "hu",
    "id", "it", "lb", "lt", "mk", "nb", "nl", "pt", "ro", "sr", "sv", "tl",
    "tr", "ur",
    # model-mode in the reference; served here by paradigm-derived lookup
    # tables (see module docstring)
    "pl", "ru",
}


class Lemmatizer:
    def __init__(self, language: str, table: Dict[str, str] | None = None):
        self.language = language
        self.table = table if table is not None else load_lemma_table(language)

    def lemma(self, token_text: str) -> str:
        return self.table.get(token_text, token_text)

    def lemmas(self, token_texts: Sequence[str]) -> List[str]:
        t = self.table
        return [t.get(tok, tok) for tok in token_texts]

    def lemmatize_joined(self, token_texts: Sequence[str]) -> str:
        """Single-space joined lemma string — the `_keyword_to_tag` key and
        the span probe string (nlp/utils.py:22-32)."""
        return " ".join(self.lemmas(token_texts))


@lru_cache(maxsize=None)
def load_lemma_table(language: str, extra_dir: str | None = None) -> Dict[str, str]:
    """Load the embedded lemma table for a language (empty dict if absent).

    An external directory of ``{lang}.json`` files can override/extend via
    the RAYKG_LEMMA_DIR environment variable or ``extra_dir``.
    """
    table: Dict[str, str] = {}
    for d in (_DATA_DIR, extra_dir or os.environ.get("RAYKG_LEMMA_DIR")):
        if not d:
            continue
        path = os.path.join(d, f"{language}.json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                table.update(json.load(f))
    return table
