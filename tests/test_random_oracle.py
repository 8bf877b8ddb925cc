"""Randomized (seeded) oracle: the distributed tag pipeline must produce
exactly the mention sets of the single-process core implementation on
punctuation-rich, multilingual, multi-sentence synthetic transcripts —
the SURVEY §5.2 oracle suite (P/R gate; exact modes expected 1.0)."""

import random

import pandas as pd
import pytest

import ray
import ray.data

from raykg.core.ontology import MatchConfig, clean_ontology, compile_matcher, match_sentences
from raykg.core.sentencize import split_sentences
from raykg.core.tokenize import Tokenizer
from raykg.pipeline.config import PipelineConfig
from raykg.pipeline.tag import extract_mentions

VOCAB = [
    "alpha", "Beta", "GAMMA", "delta", "época", "café", "naïve", "N.Y",
    "1.1.1.1", "#tag", "👍", "résumé", "straße", "word", "other", "kw",
]
PUNCT = [". ", "! ", "? ", "\n", ", ", " "]
ONTO = [
    ("T1", "café", "c1"),
    ("T2", "N.Y", "c1"),
    ("T3", "kw word", "c2"),
    ("T4", "GAMMA", "c2"),
    ("T5", "👍", "c3"),
]


def make_docs(n=120, seed=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(3, 25)):
            parts.append(rng.choice(VOCAB))
            parts.append(rng.choice(PUNCT))
        docs.append(
            {
                "conv_id": f"c{i % 9}",
                "turn_idx": i // 9,
                "text": "".join(parts),
                "lang": rng.choice(["en", "fr", "es"]),
            }
        )
    return docs


def core_mentions(docs, config: MatchConfig, has_category):
    onto = clean_ontology(ONTO, has_category=has_category)
    matchers = {}
    out = set()
    for d in docs:
        lang = d["lang"]
        if lang not in matchers:
            matchers[lang] = (
                compile_matcher(onto, lang, config, has_category),
                Tokenizer(lang),
            )
        matcher, tok = matchers[lang]
        for m in match_sentences(matcher, split_sentences(d["text"], tok)):
            out.add(
                (d["conv_id"], d["turn_idx"], m.sent_idx, m.start_char,
                 m.keyword, m.tag, m.category)
            )
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"ignore_case": True},
        {"ignore_diacritics": True},
        {"ignore_case": True, "ignore_diacritics": True, "lemmatization": True},
    ],
    ids=["exact", "case", "diacritics", "all"],
)
def test_distributed_equals_core(flags):
    docs = make_docs()
    cfg = PipelineConfig(
        language="language_column",
        language_column="lang",
        category_column="category",
        batch_size=16,
        concurrency=2,
        **flags,
    )
    ds = ray.data.from_pandas(pd.DataFrame(docs)).repartition(6)
    got = extract_mentions(ds, ONTO, cfg).to_pandas()
    got_set = {
        (r.conv_id, r.turn_idx, r.sent_idx, r.match_start, r.keyword, r.tag, r.category)
        for r in got.itertuples()
    }
    want = core_mentions(docs, cfg.match_config, has_category=True)
    assert got_set == want  # P == R == 1.0
    assert len(want) > 50  # the fixture actually exercises matching
