"""Native multilingual tokenizer.

Re-implements, from public knowledge of spaCy's documented tokenization
algorithm (affix stripping + token_match + infix splitting) and the
reference's customizations (hashtag-as-one-token patch,
``spacy_tokenizer.py:316-327``; emoji kept whole, exercised by
``test_ontology_tagger.py:133-158``), enough of the per-language
tokenization semantics for dictionary matching parity:

- whitespace handling: single ' ' is a separator; any other whitespace run
  becomes its own token (so ``\\n`` is a token the sentencizer can split on)
- prefix/suffix punctuation stripped one char at a time
- abbreviations with inner periods stay whole (``N.Y``, ``1.1.1.1``)
- ``#hashtag`` and URLs are single tokens
- French/Italian/Catalan elision ("d'automne" -> "d'", "automne")
- English contractions ("don't" -> "do", "n't")
- CJK/Thai text is segmented by greedy longest-match against a per-language
  dictionary (``segdict.py`` — sudachi/pythainlp-shaped; full dictionaries
  plug in via ``RAYKG_SEGDICT_DIR``), falling back to one token per
  character; Latin/digit runs are kept together.  Keyword matching stays
  exact because keywords and text segment through the same dictionary.
  zh ships an empty dictionary: spaCy's default Chinese segmenter is
  per-character (reference ``test_spacy_tokenizer.py:32-48`` expects 19
  tokens = 19 chars)

Tokens are ``(text, start, end)`` char-offset triples over the input
string, so span text can be sliced exactly from the original sentence.
"""

from __future__ import annotations

import re
import unicodedata
from typing import List, Tuple

Token = Tuple[str, int, int]  # (text, start_char, end_char)

MAX_NUM_CHARACTERS = 10**7  # reference spacy_tokenizer.py:130

# --- character classes -----------------------------------------------------

_PREFIX_CHARS = set("([{<\"'“‘«„‚¿¡§¶$£€¥₹฿*&")
_SUFFIX_CHARS = set(")]}>\"'”’»….,!?:;%°")
_URL_RE = re.compile(r"^(?:https?://|www\.)\S+$")
_HASHTAG_RE = re.compile(r"^#\w+$", re.UNICODE)
# number-like: digits with ., , : / - separators (keeps 1.1.1.1, 3,5, 10:30)
_NUMLIKE_RE = re.compile(r"^\d[\d.,:/\-]*\d$|^\d$")

_EN_CONTRACTION_RE = re.compile(r"^(.+?)(n['’]t|['’](?:s|re|ve|ll|d|m))$", re.IGNORECASE)
_ELISION_RE = re.compile(r"^([dljmtnscDLJMTNSC]|[qQ]u|[jJ]usqu|[lL]orsqu|[pP]uisqu)(['’])(.+)$")
_ELISION_LANGS = {"fr", "it", "ca", "lb"}
_CJK_LANGS = {"zh", "ja", "th", "ko"}

# Per-language tokenizer exceptions, spaCy's documented mechanism
# (curated high-frequency subsets of spacy/lang/{de,es}/
# tokenizer_exceptions.py; reference loads the full spaCy tables for all
# 59 codes).  KEEP_WHOLE: period abbreviations that stay single tokens
# (the trailing '.' belongs to the token, overriding suffix stripping).
# SPLIT: contractions split at fixed points (pieces concatenate back to
# the surface form; curly apostrophes normalize for lookup only).
_KEEP_WHOLE_EXC = {
    "de": {
        "z.B.", "d.h.", "u.a.", "u.U.", "usw.", "bzw.", "ca.", "evtl.",
        "ggf.", "inkl.", "vgl.", "bspw.", "etc.", "Nr.", "Dr.", "Prof.",
        "St.", "Abb.", "Abs.", "Str.", "Tel.", "Mio.", "Mrd.", "gem.",
        "i.d.R.", "o.ä.", "u.ä.", "z.T.", "s.o.", "s.u.",
    },
    "es": {
        "Sr.", "Sra.", "Srta.", "Dr.", "Dra.", "Ud.", "Uds.", "Vd.",
        "Vds.", "etc.", "p.ej.", "EE.UU.", "núm.", "pág.", "Av.",
        "Avda.", "Gral.", "Lic.", "aprox.", "dna.", "esq.", "Ing.",
    },
    "nl": {
        "bijv.", "bv.", "o.a.", "d.w.z.", "i.p.v.", "m.b.t.", "enz.",
        "evt.", "dhr.", "mevr.", "dr.", "prof.", "nr.", "blz.", "afd.",
        "ca.", "incl.", "excl.", "t.o.v.", "a.u.b.",
    },
    "pt": {
        "Sr.", "Sra.", "Dr.", "Dra.", "Prof.", "etc.", "p.ex.",
        "pág.", "Av.", "tel.", "Exmo.", "Exma.", "Lda.", "séc.",
    },
    "it": {
        "ecc.", "es.", "Sig.", "Sig.ra", "Dott.", "Prof.", "Ing.",
        "Avv.", "p.es.", "pag.", "tel.", "Spett.", "c.a.",
    },
    "sv": {
        "t.ex.", "bl.a.", "m.m.", "osv.", "dvs.", "etc.", "fr.o.m.",
        "t.o.m.", "ca.", "nr.", "s.k.", "p.g.a.", "resp.", "jfr.",
        "kl.", "st.", "tel.", "dr.", "prof.", "m.fl.", "obs.",
    },
    "da": {
        "f.eks.", "bl.a.", "osv.", "dvs.", "m.m.", "ca.", "evt.",
        "mht.", "pga.", "hhv.", "nr.", "jf.", "mio.", "mia.", "kr.",
        "tlf.", "dr.", "prof.", "inkl.", "ekskl.", "vedr.",
    },
    "nb": {
        "f.eks.", "bl.a.", "osv.", "dvs.", "m.m.", "ca.", "evt.",
        "nr.", "jf.", "mht.", "pga.", "hhv.", "tlf.", "kr.", "mill.",
        "mrd.", "inkl.", "vedr.", "ang.", "ifm.",
    },
    "fi": {
        "esim.", "jne.", "mm.", "ym.", "yms.", "ks.", "vrt.", "ts.",
        "em.", "ko.", "ml.", "pl.", "nk.", "ns.", "tms.", "prof.",
        "oy.", "ry.",
    },
    "pl": {
        "np.", "itp.", "itd.", "tzn.", "tzw.", "m.in.", "ok.", "ul.",
        "św.", "dr.", "prof.", "nr.", "godz.", "tys.", "zł.", "ws.",
        "cd.", "jw.", "ds.", "woj.", "płd.", "płn.", "wsch.", "zach.",
    },
    "cs": {
        "např.", "tzv.", "atd.", "apod.", "tj.", "č.", "str.", "mj.",
        "popř.", "resp.", "tzn.", "sv.", "mil.", "mld.", "Kč.", "vč.",
        "příp.", "zvl.", "okr.", "hl.",
    },
    "ru": {
        "т.е.", "т.д.", "т.п.", "напр.", "см.", "стр.", "гл.", "ул.",
        "тыс.", "млн.", "млрд.", "др.", "проф.", "им.", "обл.", "гг.",
        "руб.", "коп.", "пр.", "т.к.", "т.н.",
    },
    "ro": {
        "etc.", "ex.", "d-na.", "dl.", "nr.", "pag.", "str.", "tel.",
        "aprox.", "î.Hr.", "d.Hr.", "sec.", "art.", "alin.", "lit.",
        "vol.", "cap.",
    },
    "tr": {
        "Dr.", "Prof.", "Doç.", "vb.", "vs.", "örn.", "yy.", "Sok.",
        "Cad.", "Apt.", "No.", "Tel.", "bkz.", "age.", "sf.", "Alb.",
        "Gen.", "Av.", "Şti.", "A.Ş.",
    },
    "ca": {
        "etc.", "p.ex.", "Sr.", "Sra.", "Dr.", "Dra.", "núm.", "pàg.",
        "av.", "tel.", "aprox.", "St.", "Sta.", "c/e.", "dept.",
        "àngl.", "esq.",
    },
    "hu": {
        "pl.", "stb.", "kb.", "ún.", "ill.", "db.", "dr.", "prof.",
        "ifj.", "özv.", "krt.", "tel.", "vö.", "ua.", "uo.", "kft.",
        "bt.", "sz.", "vsz.", "máj.", "szept.",
    },
    "id": {
        "dll.", "dsb.", "dst.", "tgl.", "tsb.", "yg.", "dgn.", "kpd.",
        "a.n.", "s.d.", "u.p.", "hlm.", "no.", "tel.", "jl.", "dr.",
        "drs.", "prof.", "thn.", "dkk.",
    },
    "hr": {
        "itd.", "npr.", "tzv.", "tj.", "str.", "br.", "sv.", "tis.",
        "mil.", "mlrd.", "dr.", "prof.", "god.", "st.", "čl.", "sl.",
        "o.g.", "d.o.o.",
    },
    "uk": {
        "напр.", "див.", "Див.", "табл.", "вул.", "грн.", "тис.",
        "млн.", "млрд.", "обл.", "ст.", "ім.", "т.д.", "т.п.",
        "проф.", "гл.", "рис.",
    },
    "el": {
        "π.χ.", "κ.λπ.", "κ.ά.", "βλ.", "σελ.", "κεφ.", "αρ.",
        "τηλ.", "δηλ.", "κ.ο.κ.", "μ.Χ.", "π.Χ.", "λ.χ.", "κτλ.",
    },
    "bg": {
        "напр.", "т.е.", "т.н.", "вж.", "Вж.", "стр.", "ул.", "гр.",
        "лв.", "хил.", "млн.", "млрд.", "проф.", "др.", "вкл.",
        "тел.",
    },
    # round-5 breadth: the remaining Slavic/Baltic/Finnic codes whose
    # abbreviation conventions are well established
    "sr": {
        "itd.", "npr.", "tzv.", "tj.", "br.", "str.", "dr.", "prof.",
        "god.", "mil.", "tis.", "sv.", "ul.", "o.g.", "d.o.o.",
    },
    "sk": {
        "napr.", "atď.", "t.j.", "resp.", "č.", "str.", "tzv.", "sv.",
        "mil.", "mld.", "tis.", "prof.", "dr.", "spol.", "príp.",
    },
    "sl": {
        "npr.", "itd.", "t.i.", "ipd.", "oz.", "št.", "str.", "dr.",
        "prof.", "mio.", "tis.", "mlrd.", "d.o.o.", "itn.",
    },
    "lt": {
        "pvz.", "t.y.", "kt.", "pan.", "dr.", "prof.", "nr.", "str.",
        "tūkst.", "mln.", "mlrd.", "žr.", "Žr.", "pav.", "egz.",
    },
    "et": {
        "nt.", "jne.", "vt.", "lk.", "nr.", "tel.", "dr.", "prof.",
        "jm.", "vms.", "u.", "st.", "mln.", "mld.",
    },
    "lv": {
        "piem.", "utt.", "u.c.", "t.i.", "lpp.", "nr.", "tel.", "dr.",
        "prof.", "milj.", "tūkst.", "sk.", "u.tml.", "gs.",
    },
    "af": {
        "bv.", "ens.", "mnr.", "mev.", "dr.", "prof.", "nr.", "bl.",
        "o.a.", "d.w.s.", "a.g.v.", "i.p.v.",
    },
    "sq": {
        "p.sh.", "etj.", "d.m.th.", "nr.", "fq.", "dr.", "prof.",
        "z.", "znj.", "shek.",
    },
    "eu": {
        "adib.", "etab.", "zk.", "or.", "tel.", "dr.", "K.a.", "K.o.",
    },
    "ga": {
        "m.sh.", "srl.", "lch.", "uimh.", "dr.", "prof.", "teo.",
        "e.g.", "i.e.",
    },
    "is": {
        "t.d.", "o.s.frv.", "þ.e.", "m.a.", "u.þ.b.", "nr.", "bls.",
        "dr.", "prófm.", "sbr.", "skv.", "kr.",
    },
    "mk": {
        "итн.", "т.е.", "бр.", "стр.", "д-р.", "проф.",
        "ул.", "мил.", "илј.",
    },
    "tl": {
        "atbp.", "hal.", "blg.", "p.", "gng.", "bb.", "dr.", "prop.",
    },
}
_SPLIT_EXC = {
    "de": {
        "geht's": ("geht", "'s"), "gibt's": ("gibt", "'s"),
        "hab's": ("hab", "'s"), "ich's": ("ich", "'s"),
        "du's": ("du", "'s"), "er's": ("er", "'s"),
        "sie's": ("sie", "'s"), "wir's": ("wir", "'s"),
        "ihr's": ("ihr", "'s"), "auf'm": ("auf", "'m"),
        "unter'm": ("unter", "'m"), "über'm": ("über", "'m"),
        "vor'm": ("vor", "'m"), "hinter'm": ("hinter", "'m"),
    },
    # NOTE: alphanumeric-only exceptions (es "pal" -> pa+l) are
    # deliberately excluded — the alnum fast path would bypass them
}

# infix split points (spaCy-documented English defaults, simplified)
_INFIX_RE = re.compile(
    r"(?<=[0-9])[+\-*^](?=[0-9-])"
    r"|(?<=[a-zÀ-ɏ])\.(?=[A-ZÀ-ɏ])"
    r"|(?<=[a-zA-Z]),(?=[a-zA-Z])"
    r"|(?<=[a-zA-Z0-9])(?:--+|[:<>=/])(?=[a-zA-Z])"
    r"|…|\.{2,}"
)

_WS_CHUNK_RE = re.compile(r"\S+|\s+")
# anything that disqualifies the single-space fast path, in ONE C-level
# scan: every ASCII whitespace char other than ' ' (\x1c-\x1f are
# str.isspace() too and become whitespace tokens on the strict path),
# a double space, or a leading space
_FASTPATH_REJECT_RE = re.compile(r"[\t\n\r\x0b\x0c\x1c-\x1f]|  |^ ")


def _is_cjk_char(ch: str) -> bool:
    o = ord(ch)
    return (
        0x4E00 <= o <= 0x9FFF  # CJK unified
        or 0x3400 <= o <= 0x4DBF
        or 0x3040 <= o <= 0x30FF  # hiragana + katakana
        or 0xF900 <= o <= 0xFAFF
        or 0xAC00 <= o <= 0xD7AF  # hangul
        or 0x0E00 <= o <= 0x0E7F  # thai
    )


def _contains_cjk(s: str) -> bool:
    return any(_is_cjk_char(c) for c in s)


def _is_punct_token(s: str) -> bool:
    """All chars in Unicode P category (spaCy token.is_punct semantics)."""
    return bool(s) and all(unicodedata.category(c).startswith("P") for c in s)


class Tokenizer:
    """Per-language tokenizer; one instance per language, held in actor state
    (reference holds per-language spaCy pipelines, ontology_tagger.py:324-330)."""

    def __init__(self, language: str = "en", max_num_characters: int = MAX_NUM_CHARACTERS,
                 strict: bool = False):
        self.language = language
        self.max_num_characters = max_num_characters
        self.strict = strict  # True = always take the general regex path
        self._cjk = language in _CJK_LANGS
        self._elision = language in _ELISION_LANGS
        self._en = language == "en"
        self._keep_whole = _KEEP_WHOLE_EXC.get(language)
        self._split_exc = _SPLIT_EXC.get(language)
        if self._cjk:
            from .segdict import load_segdict

            self._segdict = load_segdict(language)
        else:
            self._segdict = None

    # -- public -------------------------------------------------------------

    def tokenize(self, text: str) -> List[Token]:
        if len(text) > self.max_num_characters:
            raise ValueError(
                f"Text of length {len(text)} exceeds maximum of {self.max_num_characters} characters"
            )
        # fast path for the overwhelmingly common shape: words separated by
        # single spaces only (no \n/\t/doubles) — plain split with running
        # offsets beats the regex scan ~2x; semantics identical (a single
        # space is a separator in both paths)
        if (
            not self.strict
            and text.isascii()  # exotic unicode whitespace must use the regex path
            and _FASTPATH_REJECT_RE.search(text) is None
        ):
            tokens: List[Token] = []
            pos = 0
            cjk = self._cjk
            for w in text.split(" "):
                if w:
                    if w.isalnum() and not (cjk and _contains_cjk(w)):
                        tokens.append((w, pos, pos + len(w)))
                    elif cjk and _contains_cjk(w):
                        tokens.extend(self._split_cjk(w, pos))
                    else:
                        tokens.extend(self._split_affixes(w, pos))
                pos += len(w) + 1
            return tokens
        tokens = []
        for m in _WS_CHUNK_RE.finditer(text):
            chunk = m.group()
            start = m.start()
            if chunk.isspace():
                # single space = separator; longer runs become whitespace
                # tokens (minus one trailing space, per spaCy's documented
                # rule).  A space run at TEXT START has no preceding token to
                # act as separator for, so it becomes a token too (reference
                # multilingual fixture: " Les sanglots ..." -> 8 tokens,
                # test_spacy_tokenizer.py:32-48 — the leading space counts).
                if chunk == " " and start > 0:
                    continue
                if chunk.endswith(" ") and len(chunk) > 1:
                    chunk = chunk[:-1]
                tokens.append((chunk, start, start + len(chunk)))
            elif not self.strict and chunk.isalnum() and not (self._cjk and _contains_cjk(chunk)):
                # fast path: a plain word/number chunk can't carry affixes,
                # infixes, elision or contractions (all need punctuation) —
                # skips 4 regex probes on the overwhelmingly common case
                tokens.append((chunk, start, start + len(chunk)))
            elif self._cjk and _contains_cjk(chunk):
                tokens.extend(self._split_cjk(chunk, start))
            else:
                tokens.extend(self._split_affixes(chunk, start))
        return tokens

    def token_texts(self, text: str) -> List[str]:
        return [t[0] for t in self.tokenize(text)]

    # -- internals ----------------------------------------------------------

    def _split_cjk(self, chunk: str, offset: int) -> List[Token]:
        out: List[Token] = []
        i = 0
        n = len(chunk)
        seg = self._segdict
        while i < n:
            ch = chunk[i]
            if _is_cjk_char(ch):
                # greedy longest dictionary word, else one char
                L = seg.longest_at(chunk, i) if seg is not None else 0
                if L >= 2:
                    out.append((chunk[i : i + L], offset + i, offset + i + L))
                    i += L
                    continue
                out.append((ch, offset + i, offset + i + 1))
                i += 1
            elif ch.isalnum():
                j = i + 1
                while j < n and chunk[j].isalnum() and not _is_cjk_char(chunk[j]):
                    j += 1
                out.append((chunk[i:j], offset + i, offset + j))
                i = j
            else:  # punctuation (incl. fullwidth) one char at a time
                out.append((ch, offset + i, offset + i + 1))
                i += 1
        return out

    def _special_case(self, s: str, offset: int) -> List[Token] | None:
        """Whole-chunk token_match and language exceptions."""
        if _HASHTAG_RE.match(s) or _URL_RE.match(s) or _NUMLIKE_RE.match(s):
            return [(s, offset, offset + len(s))]
        if self._keep_whole is not None or self._split_exc is not None:
            norm = s.replace("’", "'")
            if self._keep_whole is not None and (
                s in self._keep_whole or norm in self._keep_whole
            ):
                return [(s, offset, offset + len(s))]
            if self._split_exc is not None:
                pieces = self._split_exc.get(s) or self._split_exc.get(norm)
                if pieces:
                    out: List[Token] = []
                    pos = 0
                    for p in pieces:
                        out.append(
                            (s[pos : pos + len(p)], offset + pos,
                             offset + pos + len(p))
                        )
                        pos += len(p)
                    return out
        if self._elision:
            m = _ELISION_RE.match(s)
            if m:
                head = m.group(1) + m.group(2)
                rest = m.group(3)
                return [
                    (head, offset, offset + len(head)),
                    *self._split_affixes(rest, offset + len(head)),
                ]
        if self._en:
            m = _EN_CONTRACTION_RE.match(s)
            if m and any(c.isalpha() for c in m.group(1)):
                head, tail = m.group(1), m.group(2)
                return [
                    (head, offset, offset + len(head)),
                    (tail, offset + len(head), offset + len(s)),
                ]
        return None

    def _split_affixes(self, chunk: str, offset: int) -> List[Token]:
        prefixes: List[Token] = []
        suffixes: List[Token] = []  # collected right-to-left
        s = chunk
        start = offset
        while s:
            special = self._special_case(s, start)
            if special is not None:
                return prefixes + special + list(reversed(suffixes))
            if s[0] in _PREFIX_CHARS:
                prefixes.append((s[0], start, start + 1))
                s = s[1:]
                start += 1
                continue
            if s[-1] in _SUFFIX_CHARS:
                end = start + len(s)
                suffixes.append((s[-1], end - 1, end))
                s = s[:-1]
                continue
            break
        if s:
            prefixes.extend(self._split_infixes(s, start))
        return prefixes + list(reversed(suffixes))

    def _split_infixes(self, s: str, offset: int) -> List[Token]:
        out: List[Token] = []
        pos = 0
        for m in _INFIX_RE.finditer(s):
            if m.start() > pos:
                out.append((s[pos : m.start()], offset + pos, offset + m.start()))
            out.append((m.group(), offset + m.start(), offset + m.end()))
            pos = m.end()
        if pos < len(s):
            out.append((s[pos:], offset + pos, offset + len(s)))
        return out


# ISO 639-1 codes the reference supports (public list, spaCy-supported
# languages; reference language_support.py). Kept permissive: the native
# tokenizer degrades gracefully for any code, but we validate against this
# set exactly as dku_plugin_config_loading.py:153-159 errors on unsupported.
SUPPORTED_LANGUAGES = {
    "af", "bg", "bn", "ca", "cs", "da", "de", "el", "en", "es", "et", "eu",
    "fa", "fi", "fr", "ga", "gu", "he", "hi", "hr", "hu", "hy", "id", "is",
    "it", "ja", "kn", "ko", "lb", "lij", "lt", "lv", "mk", "ml", "mr", "nb",
    "ne", "nl", "pl", "pt", "ro", "ru", "sa", "si", "sk", "sl", "sq", "sr",
    "sv", "ta", "te", "th", "tl", "tr", "tt", "uk", "ur", "vi", "yo", "zh",
}


class UnsupportedLanguageError(ValueError):
    pass


def check_language(language: str) -> str:
    if not language or language != language:  # catches "" and NaN
        raise UnsupportedLanguageError("Missing language code")
    if language not in SUPPORTED_LANGUAGES:
        raise UnsupportedLanguageError(f"Unsupported language code: '{language}'")
    return language
