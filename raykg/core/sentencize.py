"""Rule-based sentence splitter.

Mirrors the reference's use of spaCy's ``Sentencizer`` with
``default_punct_chars + ["\\n"]`` (``ontology_tagger.py:71-74``) applied to
linebreak-cleaned text (``sentence_splitter.py:39-44,104-118``): a token
whose text is a sentence-final punctuation char ends a sentence; the next
token that is not punctuation starts a new one.  Sentence text is the exact
character slice of the document between its first and last token, so
trailing ``\\n`` tokens are part of the sentence while inter-sentence single
spaces are not (spaCy Span.text semantics).
"""

from __future__ import annotations

from typing import List

from .normalize import clean_linebreaks
from .tokenize import Token, Tokenizer, _is_punct_token

# spaCy Sentencizer.default_punct_chars (public, from the spaCy docs) with the
# reference's added "\n" (ontology_tagger.py:73)
PUNCT_CHARS = set(
    [
        "!", ".", "?", "։", "؟", "۔", "܀", "܁", "܂", "߹", "।", "॥", "၊", "။",
        "።", "፧", "፨", "᙮", "᜵", "᜶", "᠃", "᠉", "᥄", "᥅", "᪨", "᪩", "᪪",
        "᪫", "᭚", "᭛", "᭞", "᭟", "᰻", "᰼", "᱾", "᱿", "‼", "‽", "⁇", "⁈",
        "⁉", "⸮", "⸼", "꓿", "꘎", "꘏", "꛳", "꛷", "꡶", "꡷", "꣎", "꣏", "꤯",
        "꧈", "꧉", "꩝", "꩞", "꩟", "꫰", "꫱", "꯫", "﹒", "﹖", "﹗", "！",
        "．", "？", "。", "｡",
        "\n",
    ]
)


def split_tokens_to_sentences(tokens: List[Token], text: str) -> List[str]:
    """Group tokens into sentences per the Sentencizer rule; return the exact
    text slices."""
    if not tokens:
        return []
    sentences: List[str] = []
    sent_start = 0  # index into tokens
    seen_period = False
    for i, (tok_text, _s, _e) in enumerate(tokens):
        if seen_period and not _is_punct_token(tok_text) and tok_text not in PUNCT_CHARS:
            first = tokens[sent_start]
            last = tokens[i - 1]
            sentences.append(text[first[1] : last[2]])
            sent_start = i
            seen_period = False
        elif tok_text in PUNCT_CHARS:
            seen_period = True
    first = tokens[sent_start]
    last = tokens[-1]
    sentences.append(text[first[1] : last[2]])
    return sentences


def split_tokens_to_sentences_spans(tokens: List[Token], text: str):
    """Like :func:`split_tokens_to_sentences` but returns
    (token_lo, token_hi, char_lo, char_hi) spans instead of strings, so the
    caller can reuse the token slices (single-tokenization hot path)."""
    if not tokens:
        return []
    spans = []
    sent_start = 0
    seen_period = False
    for i, (tok_text, _s, _e) in enumerate(tokens):
        if seen_period and not _is_punct_token(tok_text) and tok_text not in PUNCT_CHARS:
            spans.append((sent_start, i, tokens[sent_start][1], tokens[i - 1][2]))
            sent_start = i
            seen_period = False
        elif tok_text in PUNCT_CHARS:
            seen_period = True
    spans.append((sent_start, len(tokens), tokens[sent_start][1], tokens[-1][2]))
    return spans


def split_sentences(text, tokenizer: Tokenizer) -> List[str]:
    """Full reference flow: NaN -> "" (cleaning_utils.py:120-124), linebreak
    cleanup, tokenize, sentencize."""
    if text is None or text != text:  # None or NaN
        return []
    cleaned = clean_linebreaks(str(text))
    if not cleaned:
        return []
    return split_tokens_to_sentences(tokenizer.tokenize(cleaned), cleaned)
