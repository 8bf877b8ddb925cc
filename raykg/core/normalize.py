"""Text normalization applied identically to ontology keywords and document
sentences.

Semantics mirror the reference (``nlp/utils.py:12-14,49-67`` and the NFC/NFD
switch at ``ontology_tagger.py:86-87``): order is lowercase -> unicode
normalize (NFC when lemmatizing without diacritic removal, else NFD) ->
strip combining characters when ``ignore_diacritics``.
"""

from __future__ import annotations

import unicodedata


def lowercase_if(text: str, lowercase: bool) -> str:
    """Lowercase ``text`` when ``lowercase`` is set (reference nlp/utils.py:12-14)."""
    return text.lower() if lowercase else text


def unicode_normalize_text(
    text: str, use_nfc: bool = False, ignore_diacritics: bool = False
) -> str:
    """NFC/NFD-normalize and optionally drop combining marks
    (reference nlp/utils.py:49-67)."""
    text = unicodedata.normalize("NFC" if use_nfc else "NFD", text)
    if ignore_diacritics:
        text = "".join(c for c in text if not unicodedata.combining(c))
    return text


def use_nfc(lemmatization: bool, ignore_diacritics: bool) -> bool:
    """NFC iff lemmatizing without diacritic removal (ontology_tagger.py:86-87)."""
    return lemmatization and not ignore_diacritics


def normalize(
    text: str,
    ignore_case: bool = False,
    ignore_diacritics: bool = False,
    lemmatization: bool = False,
) -> str:
    """The full normalization invariant (SURVEY.md Appendix A.1).

    Applied symmetrically to the dictionary build and to every document
    sentence before matching.
    """
    return unicode_normalize_text(
        lowercase_if(text, ignore_case),
        use_nfc=use_nfc(lemmatization, ignore_diacritics),
        ignore_diacritics=ignore_diacritics,
    )


def clean_linebreaks(text: str) -> str:
    """Collapse blank lines and per-line whitespace, normalizing ``\\r``/``\\n``
    variants to single ``\\n`` separators (reference sentence_splitter.py:39-44)."""
    return "\n".join(line.strip() for line in filter(None, text.splitlines()))
