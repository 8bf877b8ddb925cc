"""Output formatters: per-document match results -> output column values.

Pure-Python mirrors of the reference's three output shapes
(``formatting/instanciator.py:20-33``):

- ``one_row_per_match``  -> list of (category?, tag, keyword, sentence)
  tuples, deduplicated per document (the reference's global
  ``drop_duplicates()`` at ``formatting/base.py:107`` can only collapse
  within-document duplicates for our keyed transcripts — SURVEY.md
  Appendix B), empty docs keep one all-null row
  (``formatter_by_match.py:82,94-98``).
- ``one_row_per_doc``    -> JSON-string list columns + concatenated matched
  sentences (``formatter_by_document.py:30-116`` no-category,
  ``118-222`` category).
- ``one_row_per_doc_json`` -> nested JSON columns
  (``formatter_by_document.py:231-294`` and ``296-384``).

JSON values use ``json.dumps(..., ensure_ascii=False)`` with empty -> null
(``formatter_by_document.py:25-28``).

Divergence (documented): in category mode the reference's per-category
columns cover only categories matched somewhere in the dataset; a streaming
engine cannot know that set without a second pass, so our per-category
columns are *all* ontology categories (unmatched ones null).  Values for
matched categories are identical.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

from .ontology import Mention

TAG_COLUMNS = {
    "one_row_per_doc": {
        "category": ["tag_keywords", "tag_sentences"],
        "no_category": ["tag_list", "tag_keywords", "tag_sentences"],
    },
    "one_row_per_doc_json": {
        "category": ["tag_json_categories", "tag_json_full"],
        "no_category": ["tag_json_full"],
    },
    "one_row_per_match": {
        "category": ["tag_category", "tag", "tag_keyword", "tag_sentence"],
        "no_category": ["tag", "tag_keyword", "tag_sentence"],
    },
}

COLUMN_DESCRIPTION = {
    "tag_keywords": "List of matched keywords",
    "tag_sentences": "Sentences containing matched keywords",
    "tag_json_full": "Detailed tag column: list of matched keywords per tag and category, "
    "count of occurrences, sentences containing matched keywords",
    "tag_json_categories": "List of tags per category",
    "tag_list": "List of all assigned tags",
    "tag": "Assigned tag",
    "tag_keyword": "Matched keyword",
    "tag_sentence": "Sentence containing the matched keyword",
    "tag_category": "Category of tag",
}

OUTPUT_FORMATS = tuple(TAG_COLUMNS)


def fill_tags(value) -> Optional[str]:
    """json.dumps when non-empty else null (formatter_by_document.py:25-28)."""
    return json.dumps(value, ensure_ascii=False) if value else None


def unique_list(seq: Sequence) -> List:
    """Order-preserving dedup (cleaning_utils.py:13-21)."""
    seen = set()
    return [x for x in seq if not (x in seen or seen.add(x))]


def truncate_text_list(texts: Sequence[str], num_characters: int = 140) -> List[str]:
    """Truncate each string to ``num_characters`` with an ``(...)`` marker —
    the reference's log-hygiene helper for error messages that quote
    documents (cleaning_utils.py:24-40, used at spacy_tokenizer.py:428)."""
    return [
        t[:num_characters] + " (...)" if len(t) > num_characters else t
        for t in texts
    ]


def generate_unique(name: str, existing: Sequence[str], prefix: str | None = None) -> str:
    """Schema-collision-safe naming (cleaning_utils.py:60-81)."""
    base = f"{prefix}_{name}" if prefix else name
    if base not in existing:
        return base
    for j in range(1, 1001):
        cand = f"{base}_{j}"
        if cand not in existing:
            return cand
    raise RuntimeError(f"Failed to generate a unique name for '{name}'")


def generate_unique_columns(
    existing: Sequence[str], columns: Sequence[str], prefix: str | None = None
) -> List[str]:
    return [generate_unique(c, existing, prefix) for c in columns]


def category_column_name(category: str) -> str:
    """Per-category pivot column: 'tag_list_' + NFD-normalized category
    (formatter_by_document.py:198-208 with unicode_normalize_text defaults)."""
    return "tag_list_" + unicodedata.normalize("NFD", category)


# --- one_row_per_match -----------------------------------------------------

def format_match_rows(
    mentions: Sequence[Mention], has_category: bool
) -> List[Tuple]:
    """Per-document rows for one_row_per_match, deduplicated in appearance
    order. Empty result means the caller emits one all-null row."""
    if has_category:
        rows = [(m.category, m.tag, m.keyword, m.sentence) for m in mentions]
    else:
        rows = [(m.tag, m.keyword, m.sentence) for m in mentions]
    return unique_list(rows)


# --- one_row_per_doc -------------------------------------------------------

def format_doc(
    mentions: Sequence[Mention],
    has_category: bool,
    all_categories: Sequence[str] = (),
) -> Dict[str, Optional[str]]:
    """Column values for one_row_per_doc. Keys: tag_list / per-category
    columns, tag_keywords, tag_sentences."""
    if not has_category:
        tags = [m.tag for m in mentions]
        keywords = [m.keyword for m in mentions]
        # one "sentence + \n" per sentence that contained >=1 match, in order,
        # NOT deduplicated (formatter_by_document.py:66-76)
        matched_sentences: List[str] = []
        last_sent = None
        for m in mentions:
            if m.sent_idx != last_sent:
                matched_sentences.append(m.sentence + "\n")
                last_sent = m.sent_idx
        if tags:
            return {
                "tag_list": fill_tags(unique_list(tags)),
                "tag_keywords": fill_tags(unique_list(keywords)),
                "tag_sentences": "".join(matched_sentences),
            }
        return {"tag_list": None, "tag_keywords": None, "tag_sentences": None}

    categories_and_tags: Dict[str, List[str]] = {}
    keyword_list: List[str] = []
    matched_sentence: List[str] = []
    for m in mentions:
        tags_for_cat = categories_and_tags.setdefault(m.category, [])
        if m.tag not in tags_for_cat:
            tags_for_cat.append(m.tag)
        if m.keyword not in keyword_list:
            keyword_list.append(m.keyword)
        if m.sentence + "\n" not in matched_sentence:
            matched_sentence.append(m.sentence + "\n")
    out: Dict[str, Optional[str]] = {
        category_column_name(c): fill_tags(categories_and_tags.get(c))
        for c in all_categories
    }
    out["tag_keywords"] = fill_tags(keyword_list)
    # category path joins with " " (vs "" in no-category) — Appendix B quirk
    out["tag_sentences"] = " ".join(matched_sentence)
    return out


# --- one_row_per_doc_json --------------------------------------------------

def format_doc_json(
    mentions: Sequence[Mention], has_category: bool
) -> Dict[str, Optional[str]]:
    """Column values for one_row_per_doc_json (tag_json_full and, with
    categories, tag_json_categories)."""
    if not has_category:
        tags_full: Dict[str, dict] = {}
        for m in mentions:
            entry = tags_full.get(m.tag)
            if entry is None:
                tags_full[m.tag] = {
                    "count": 1,
                    "sentences": [m.sentence],
                    "keywords": [m.keyword],
                }
            else:
                entry["count"] += 1
                if m.sentence not in entry["sentences"]:
                    entry["sentences"].append(m.sentence)
                if m.keyword not in entry["keywords"]:
                    entry["keywords"].append(m.keyword)
        return {"tag_json_full": fill_tags(tags_full)}

    categories_and_tags: Dict[str, List[str]] = {}
    full: Dict[str, Dict[str, dict]] = {}
    for m in mentions:
        cat_entry = full.setdefault(m.category, {})
        if m.tag not in cat_entry:
            cat_entry[m.tag] = {
                "count": 1,
                "sentences": [m.sentence],
                "keywords": [m.keyword],
            }
            categories_and_tags.setdefault(m.category, []).append(m.tag)
        else:
            cat_entry[m.tag]["count"] += 1
            if m.sentence not in cat_entry[m.tag]["sentences"]:
                cat_entry[m.tag]["sentences"].append(m.sentence)
            if m.keyword not in cat_entry[m.tag]["keywords"]:
                cat_entry[m.tag]["keywords"].append(m.keyword)
    return {
        "tag_json_categories": fill_tags(categories_and_tags),
        "tag_json_full": fill_tags({c: dict(v) for c, v in full.items()}),
    }
