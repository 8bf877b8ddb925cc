"""Generate the embedded lookup lemma tables (raykg/core/lemma_data/).

The reference lemmatizes through spaCy lookup tables (spacy-lookups-data,
reference spacy_tokenizer.py:235-266).  Those tables cannot be vendored
offline, so this script DERIVES form->lemma tables from explicit,
public-knowledge inflection paradigms: hand-listed irregular verbs/nouns
plus mechanical conjugation generators for the regular classes of en, fr,
de, es.  Entries are deliberately conservative — a missing form falls back
to identity (the lookup lemmatizer's documented behavior), while a wrong
entry would silently corrupt matches, so orthography-changing verb classes
(fr -ger/-cer/-eler, es stem-changers, ...) are excluded from the regular
generators rather than approximated.

Collision policy: first writer wins; irregular paradigms are emitted before
regular generators so e.g. Spanish 'fui' resolves to 'ser' (listed first),
matching spaCy's lookup choice.  Pre-existing fixture entries (the
conformance matrix of tests/test_core_match.py::test_lemmatize_keywords)
are merged LAST with priority, so regeneration can never break parity.

Run:  python scripts/gen_lemma_tables.py
"""

from __future__ import annotations

import json
import os

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "raykg", "core", "lemma_data",
)


def add(table: dict, form: str, lemma: str) -> None:
    if form and form != lemma and form not in table:
        table[form] = lemma


# --------------------------------------------------------------------------
# English
# --------------------------------------------------------------------------

# (base, past, participle[, extra forms...]) — standard irregular verbs
EN_IRREGULAR_VERBS = [
    ("be", "was", "been", "am", "is", "are", "were", "being"),
    ("have", "had", "had", "has", "having"),
    ("do", "did", "done", "does", "doing"),
    ("go", "went", "gone", "goes", "going"),
    ("say", "said", "said", "says", "saying"),
    ("get", "got", "gotten", "gets", "getting", "got"),
    ("make", "made", "made", "makes", "making"),
    ("know", "knew", "known", "knows", "knowing"),
    ("think", "thought", "thought", "thinks", "thinking"),
    ("take", "took", "taken", "takes", "taking"),
    ("see", "saw", "seen", "sees", "seeing"),
    ("come", "came", "come", "comes", "coming"),
    ("give", "gave", "given", "gives", "giving"),
    ("find", "found", "found", "finds", "finding"),
    ("tell", "told", "told", "tells", "telling"),
    ("become", "became", "become", "becomes", "becoming"),
    ("show", "showed", "shown", "shows", "showing"),
    ("leave", "left", "left", "leaves", "leaving"),
    ("feel", "felt", "felt", "feels", "feeling"),
    ("put", "put", "put", "puts", "putting"),
    ("bring", "brought", "brought", "brings", "bringing"),
    ("begin", "began", "begun", "begins", "beginning"),
    ("keep", "kept", "kept", "keeps", "keeping"),
    ("hold", "held", "held", "holds", "holding"),
    ("write", "wrote", "written", "writes", "writing"),
    ("stand", "stood", "stood", "stands", "standing"),
    ("hear", "heard", "heard", "hears", "hearing"),
    ("let", "let", "let", "lets", "letting"),
    ("mean", "meant", "meant", "means", "meaning"),
    ("set", "set", "set", "sets", "setting"),
    ("meet", "met", "met", "meets", "meeting"),
    ("run", "ran", "run", "runs", "running"),
    ("pay", "paid", "paid", "pays", "paying"),
    ("sit", "sat", "sat", "sits", "sitting"),
    ("speak", "spoke", "spoken", "speaks", "speaking"),
    ("lie", "lay", "lain", "lies", "lying"),
    ("lead", "led", "led", "leads", "leading"),
    ("read", "read", "read", "reads", "reading"),
    ("grow", "grew", "grown", "grows", "growing"),
    ("lose", "lost", "lost", "loses", "losing"),
    ("fall", "fell", "fallen", "falls", "falling"),
    ("send", "sent", "sent", "sends", "sending"),
    ("build", "built", "built", "builds", "building"),
    ("understand", "understood", "understood", "understands", "understanding"),
    ("draw", "drew", "drawn", "draws", "drawing"),
    ("break", "broke", "broken", "breaks", "breaking"),
    ("spend", "spent", "spent", "spends", "spending"),
    ("cut", "cut", "cut", "cuts", "cutting"),
    ("rise", "rose", "risen", "rises", "rising"),
    ("drive", "drove", "driven", "drives", "driving"),
    ("buy", "bought", "bought", "buys", "buying"),
    ("wear", "wore", "worn", "wears", "wearing"),
    ("choose", "chose", "chosen", "chooses", "choosing"),
    ("seek", "sought", "sought", "seeks", "seeking"),
    ("throw", "threw", "thrown", "throws", "throwing"),
    ("catch", "caught", "caught", "catches", "catching"),
    ("deal", "dealt", "dealt", "deals", "dealing"),
    ("win", "won", "won", "wins", "winning"),
    ("forget", "forgot", "forgotten", "forgets", "forgetting"),
    ("lay", "laid", "laid", "lays", "laying"),
    ("sell", "sold", "sold", "sells", "selling"),
    ("fight", "fought", "fought", "fights", "fighting"),
    ("bear", "bore", "borne", "bears", "bearing"),
    ("teach", "taught", "taught", "teaches", "teaching"),
    ("eat", "ate", "eaten", "eats", "eating"),
    ("drink", "drank", "drunk", "drinks", "drinking"),
    ("sing", "sang", "sung", "sings", "singing"),
    ("swim", "swam", "swum", "swims", "swimming"),
    ("fly", "flew", "flown", "flies", "flying"),
    ("blow", "blew", "blown", "blows", "blowing"),
    ("ride", "rode", "ridden", "rides", "riding"),
    ("shake", "shook", "shaken", "shakes", "shaking"),
    ("hide", "hid", "hidden", "hides", "hiding"),
    ("steal", "stole", "stolen", "steals", "stealing"),
    ("freeze", "froze", "frozen", "freezes", "freezing"),
    ("bite", "bit", "bitten", "bites", "biting"),
    ("shoot", "shot", "shot", "shoots", "shooting"),
    ("feed", "fed", "fed", "feeds", "feeding"),
    ("sleep", "slept", "slept", "sleeps", "sleeping"),
    ("wake", "woke", "woken", "wakes", "waking"),
    ("sweep", "swept", "swept", "sweeps", "sweeping"),
    ("swing", "swung", "swung", "swings", "swinging"),
    ("strike", "struck", "struck", "strikes", "striking"),
    ("hang", "hung", "hung", "hangs", "hanging"),
    ("stick", "stuck", "stuck", "sticks", "sticking"),
    ("spring", "sprang", "sprung", "springs", "springing"),
    ("shine", "shone", "shone", "shines", "shining"),
    ("slide", "slid", "slid", "slides", "sliding"),
    ("spread", "spread", "spread", "spreads", "spreading"),
    ("burst", "burst", "burst", "bursts", "bursting"),
    ("cost", "cost", "cost", "costs", "costing"),
    ("hit", "hit", "hit", "hits", "hitting"),
    ("hurt", "hurt", "hurt", "hurts", "hurting"),
    ("quit", "quit", "quit", "quits", "quitting"),
    ("shut", "shut", "shut", "shuts", "shutting"),
    ("split", "split", "split", "splits", "splitting"),
    ("bet", "bet", "bet", "bets", "betting"),
    ("cast", "cast", "cast", "casts", "casting"),
    ("bend", "bent", "bent", "bends", "bending"),
    ("lend", "lent", "lent", "lends", "lending"),
    ("dig", "dug", "dug", "digs", "digging"),
    ("stand", "stood", "stood"),
    ("tear", "tore", "torn", "tears", "tearing"),
    ("wind", "wound", "wound", "winds", "winding"),
    ("weave", "wove", "woven", "weaves", "weaving"),
    ("arise", "arose", "arisen", "arises", "arising"),
    ("awake", "awoke", "awoken", "awakes", "awaking"),
    ("forgive", "forgave", "forgiven", "forgives", "forgiving"),
    ("withdraw", "withdrew", "withdrawn", "withdraws", "withdrawing"),
    ("overcome", "overcame", "overcome", "overcomes", "overcoming"),
    ("undergo", "underwent", "undergone", "undergoes", "undergoing"),
    ("upset", "upset", "upset", "upsets", "upsetting"),
    ("shrink", "shrank", "shrunk", "shrinks", "shrinking"),
    ("sink", "sank", "sunk", "sinks", "sinking"),
    ("spin", "spun", "spun", "spins", "spinning"),
    ("kneel", "knelt", "knelt", "kneels", "kneeling"),
    ("creep", "crept", "crept", "creeps", "creeping"),
    ("weep", "wept", "wept", "weeps", "weeping"),
    ("leap", "leapt", "leapt", "leaps", "leaping"),
    ("burn", "burnt", "burnt", "burns", "burning"),
    ("learn", "learnt", "learnt", "learns", "learning"),
    ("spell", "spelt", "spelt", "spells", "spelling"),
    ("spill", "spilt", "spilt", "spills", "spilling"),
    ("dream", "dreamt", "dreamt", "dreams", "dreaming"),
]

EN_IRREGULAR_PLURALS = {
    "children": "child", "men": "man", "women": "woman", "mice": "mouse",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "people": "person",
    "oxen": "ox", "lives": "life", "wives": "wife", "knives": "knife",
    "leaves": "leaf", "halves": "half", "shelves": "shelf", "loaves": "loaf",
    "wolves": "wolf", "selves": "self", "thieves": "thief", "calves": "calf",
    "scarves": "scarf", "analyses": "analysis", "crises": "crisis",
    "theses": "thesis", "hypotheses": "hypothesis", "diagnoses": "diagnosis",
    "bases": "basis", "axes": "axis", "matrices": "matrix",
    "indices": "index", "vertices": "vertex", "appendices": "appendix",
    "criteria": "criterion", "phenomena": "phenomenon", "data": "datum",
    "media": "medium", "curricula": "curriculum", "memoranda": "memorandum",
    "schemata": "schema", "stimuli": "stimulus", "alumni": "alumnus",
    "fungi": "fungus", "nuclei": "nucleus", "radii": "radius",
    "syllabi": "syllabus", "cacti": "cactus", "corpora": "corpus",
    "genera": "genus",
}

# common regular verbs: (base[, doubled-stem]) — doubled form given where
# the final consonant doubles before -ed/-ing
EN_REGULAR_VERBS = [
    "work", "call", "use", "ask", "need", "seem", "help", "talk", "turn",
    "start", "play", "move", "like", "live", "believe", "happen", "include",
    "continue", "change", "watch", "follow", "create", "open",
    "walk", "offer", "remember", "love", "consider", "appear", "wait",
    "serve", "die", "expect", "stay", "reach", "kill", "remain", "suggest",
    "raise", "pass", "require", "report", "decide", "pull", "return",
    "explain", "hope", "develop", "carry", "receive", "agree", "support",
    "cause", "cover", "describe", "produce", "point", "listen",
    "realize", "place", "close", "involve", "increase", "match", "tag",
    "process", "store", "filter", "sort", "merge", "join", "index", "query",
    "scan", "load", "save", "parse", "execute", "compute", "cache",
    "stream", "batch", "group", "order", "select", "insert", "update",
    "delete", "count", "hash", "partition", "shuffle", "reduce", "combine",
    "collect", "tokenize", "normalize", "lemmatize", "deduplicate",
    "aggregate", "transform", "extract", "annotate", "classify", "cluster",
    "embed", "encode", "decode", "sample", "train", "test", "validate",
    "deploy", "monitor", "measure", "analyze", "search", "rank", "score",
    "weight", "label", "mention", "document", "record", "sentence",
    "keyword",
]
EN_DOUBLING = {
    "stop": "stopp", "plan": "plann", "drop": "dropp", "refer": "referr",
    "occur": "occurr", "prefer": "preferr", "submit": "submitt",
    "permit": "permitt", "commit": "committ", "control": "controll",
    "travel": "travell", "label": "labell", "map": "mapp", "grab": "grabb",
    "skip": "skipp", "wrap": "wrapp", "trim": "trimm", "tap": "tapp",
    "log": "logg", "ship": "shipp", "chat": "chatt", "scan": "scann",
    "plug": "plugg", "tag": "tagg", "step": "stepp",
}


def en_regular_forms(base: str):
    """-s / -ed / -ing with standard orthography (e-drop, y->ies, doubling)."""
    if base in EN_DOUBLING:
        stem = EN_DOUBLING[base]
        yield base + ("es" if base.endswith(("s", "ch", "sh", "x", "z")) else "s")
        yield stem + "ed"
        yield stem + "ing"
        return
    if base.endswith("e") and not base.endswith(("ee", "ye", "oe")):
        yield base + "s"
        yield base + "d"
        yield base[:-1] + "ing"
    elif base.endswith("y") and len(base) > 1 and base[-2] not in "aeiou":
        yield base[:-1] + "ies"
        yield base[:-1] + "ied"
        yield base + "ing"
    elif base.endswith(("s", "ch", "sh", "x", "z")):
        yield base + "es"
        yield base + "ed"
        yield base + "ing"
    else:
        yield base + "s"
        yield base + "ed"
        yield base + "ing"


def build_en() -> dict:
    t: dict = {}
    for entry in EN_IRREGULAR_VERBS:
        base = entry[0]
        for form in entry[1:]:
            add(t, form, base)
    for plural, sing in EN_IRREGULAR_PLURALS.items():
        add(t, plural, sing)
    for base in EN_REGULAR_VERBS + sorted(set(EN_DOUBLING) - set(EN_REGULAR_VERBS)):
        for form in en_regular_forms(base):
            add(t, form, base)
    for form, lemma in [("better", "well"), ("best", "good"),
                        ("worse", "bad"), ("worst", "bad")]:
        add(t, form, lemma)
    return t


# --------------------------------------------------------------------------
# French
# --------------------------------------------------------------------------

FR_IRREGULAR = {
    "être": ["suis", "es", "est", "sommes", "êtes", "sont", "étais", "était",
             "étions", "étiez", "étaient", "fus", "fut", "fûmes", "fûtes",
             "furent", "serai", "seras", "sera", "serons", "serez", "seront",
             "serais", "serait", "serions", "seriez", "seraient", "sois",
             "soit", "soyons", "soyez", "soient", "été", "étant"],
    "avoir": ["ai", "as", "a", "avons", "avez", "ont", "avais", "avait",
              "avions", "aviez", "avaient", "eus", "eut", "eûmes", "eûtes",
              "eurent", "aurai", "auras", "aura", "aurons", "aurez",
              "auront", "aurais", "aurait", "aurions", "auriez", "auraient",
              "aie", "aies", "ait", "ayons", "ayez", "aient", "eu", "eue",
              "eus", "eues", "ayant"],
    "aller": ["vais", "vas", "va", "allons", "allez", "vont", "allais",
              "allait", "allions", "alliez", "allaient", "allai", "alla",
              "allèrent", "irai", "iras", "ira", "irons", "irez", "iront",
              "irais", "irait", "irions", "iriez", "iraient", "aille",
              "ailles", "aillent", "allé", "allée", "allés", "allées",
              "allant"],
    "faire": ["fais", "fait", "faisons", "faites", "font", "faisais",
              "faisait", "faisions", "faisiez", "faisaient", "fis", "fit",
              "fîmes", "fîtes", "firent", "ferai", "feras", "fera",
              "ferons", "ferez", "feront", "ferais", "ferait", "ferions",
              "feriez", "feraient", "fasse", "fasses", "fassent", "faite",
              "faits", "faites", "faisant"],
    "dire": ["dis", "dit", "disons", "dites", "disent", "disais", "disait",
             "disions", "disiez", "disaient", "dîmes", "dîtes", "dirent",
             "dirai", "diras", "dira", "dirons", "direz", "diront",
             "dirais", "dirait", "dise", "dises", "disent", "dite", "dits",
             "dites", "disant"],
    "pouvoir": ["peux", "peut", "pouvons", "pouvez", "peuvent", "pouvais",
                "pouvait", "pouvions", "pouviez", "pouvaient", "pus", "put",
                "purent", "pourrai", "pourras", "pourra", "pourrons",
                "pourrez", "pourront", "pourrais", "pourrait", "pourrions",
                "pourriez", "pourraient", "puisse", "puisses", "puissent",
                "pu", "pouvant"],
    "vouloir": ["veux", "veut", "voulons", "voulez", "veulent", "voulais",
                "voulait", "voulions", "vouliez", "voulaient", "voulus",
                "voulut", "voulurent", "voudrai", "voudras", "voudra",
                "voudrons", "voudrez", "voudront", "voudrais", "voudrait",
                "veuille", "veuilles", "veuillent", "voulu", "voulue",
                "voulus", "voulues", "voulant"],
    "savoir": ["sais", "sait", "savons", "savez", "savent", "savais",
               "savait", "savions", "saviez", "savaient", "sus", "sut",
               "surent", "saurai", "sauras", "saura", "saurons", "saurez",
               "sauront", "saurais", "saurait", "sache", "saches",
               "sachent", "su", "sue", "sus", "sues", "sachant"],
    "devoir": ["dois", "doit", "devons", "devez", "doivent", "devais",
               "devait", "devions", "deviez", "devaient", "dus", "dut",
               "durent", "devrai", "devras", "devra", "devrons", "devrez",
               "devront", "devrais", "devrait", "doive", "doives",
               "doivent", "dû", "due", "dus", "dues", "devant"],
    "venir": ["viens", "vient", "venons", "venez", "viennent", "venais",
              "venait", "venions", "veniez", "venaient", "vins", "vint",
              "vinrent", "viendrai", "viendras", "viendra", "viendrons",
              "viendrez", "viendront", "viendrais", "viendrait", "vienne",
              "viennes", "viennent", "venu", "venue", "venus", "venues",
              "venant"],
    "voir": ["vois", "voit", "voyons", "voyez", "voient", "voyais",
             "voyait", "voyions", "voyiez", "voyaient", "vis", "vit",
             "virent", "verrai", "verras", "verra", "verrons", "verrez",
             "verront", "verrais", "verrait", "voie", "voies", "voient",
             "vu", "vue", "vus", "vues", "voyant"],
    "prendre": ["prends", "prend", "prenons", "prenez", "prennent",
                "prenais", "prenait", "prenions", "preniez", "prenaient",
                "pris", "prit", "prirent", "prendrai", "prendras",
                "prendra", "prendrons", "prendrez", "prendront",
                "prendrais", "prendrait", "prenne", "prennes", "prennent",
                "prise", "prises", "prenant"],
    "mettre": ["mets", "met", "mettons", "mettez", "mettent", "mettais",
               "mettait", "mettions", "mettiez", "mettaient", "mis", "mit",
               "mirent", "mettrai", "mettras", "mettra", "mettrons",
               "mettrez", "mettront", "mettrais", "mettrait", "mette",
               "mettes", "mettent", "mise", "mises", "mettant"],
}

# quirk-free regular -er verbs (no -ger/-cer/-eler/-eter/-yer, no
# e/é-stem alternation)
FR_ER_VERBS = [
    "travailler", "parler", "donner", "aimer", "trouver", "penser",
    "demander", "passer", "rester", "porter", "montrer", "monter",
    "garder", "entrer", "écouter", "tomber", "arriver", "chercher",
    "regarder", "aider", "jouer", "habiter", "marcher", "fermer",
    "chanter", "danser", "étudier", "oublier", "inviter", "visiter",
    "accepter", "refuser", "compter", "couper", "laver", "tourner",
    "profiter", "quitter", "sauter", "signer", "tester", "noter",
    "causer", "poser", "retourner", "discuter", "exister", "durer",
]

FR_ER_ENDINGS = [
    "e", "es", "e", "ons", "ez", "ent",
    "ais", "ait", "ions", "iez", "aient",
    "ai", "as", "a", "âmes", "âtes", "èrent",
    "erai", "eras", "era", "erons", "erez", "eront",
    "erais", "erait", "erions", "eriez", "eraient",
    "é", "ée", "és", "ées", "ant",
]

# regular group-2 -ir verbs (finir model)
FR_IR_VERBS = [
    "finir", "choisir", "réussir", "grandir", "réfléchir", "remplir",
    "agir", "obéir", "punir", "guérir", "bâtir", "nourrir", "rougir",
    "saisir", "unir", "réunir", "établir", "fournir", "investir",
]
FR_IR_ENDINGS = [
    "is", "it", "issons", "issez", "issent",
    "issais", "issait", "issions", "issiez", "issaient",
    "îmes", "îtes", "irent",
    "irai", "iras", "ira", "irons", "irez", "iront",
    "irais", "irait", "irions", "iriez", "iraient",
    "isse", "isses", "issent",
    "i", "ie", "is", "ies", "issant",
]


def build_fr() -> dict:
    t: dict = {}
    for lemma, forms in FR_IRREGULAR.items():
        for f in forms:
            add(t, f, lemma)
    for inf in FR_ER_VERBS:
        stem = inf[:-2]
        for e in FR_ER_ENDINGS:
            add(t, stem + e, inf)
    for inf in FR_IR_VERBS:
        stem = inf[:-2]
        for e in FR_IR_ENDINGS:
            add(t, stem + e, inf)
    return t


# --------------------------------------------------------------------------
# German
# --------------------------------------------------------------------------

DE_IRREGULAR = {
    "sein": ["bin", "bist", "ist", "sind", "seid", "war", "warst", "waren",
             "wart", "wäre", "wärst", "wären", "wärt", "sei", "seist",
             "seien", "gewesen", "seiend"],
    "haben": ["habe", "hast", "hat", "habt", "hatte", "hattest", "hatten",
              "hattet", "hätte", "hättest", "hätten", "hättet", "gehabt",
              "habend"],
    "werden": ["werde", "wirst", "wird", "werdet", "wurde", "wurdest",
               "wurden", "wurdet", "würde", "würdest", "würden", "würdet",
               "geworden", "worden", "werdend"],
    "können": ["kann", "kannst", "könnt", "konnte", "konntest", "konnten",
               "konntet", "könnte", "könnten", "gekonnt"],
    "müssen": ["muss", "musst", "müsst", "musste", "mussten", "müsste",
               "müssten", "gemusst"],
    "wollen": ["will", "willst", "wollt", "wollte", "wolltest", "wollten",
               "gewollt"],
    "sollen": ["soll", "sollst", "sollt", "sollte", "sollten", "gesollt"],
    "dürfen": ["darf", "darfst", "dürft", "durfte", "durften", "dürfte",
               "gedurft"],
    "wissen": ["weiß", "weißt", "wisst", "wusste", "wusstest", "wussten",
               "gewusst", "wissend"],
    "gehen": ["gehe", "gehst", "geht", "ging", "gingst", "gingen", "gingt",
              "gegangen", "gehend"],
    "kommen": ["komme", "kommst", "kommt", "kam", "kamst", "kamen", "kamt",
               "gekommen", "kommend"],
    "sehen": ["sehe", "siehst", "sieht", "seht", "sah", "sahst", "sahen",
              "saht", "gesehen", "sehend"],
    "geben": ["gebe", "gibst", "gibt", "gebt", "gab", "gabst", "gaben",
              "gabt", "gegeben", "gebend"],
    "nehmen": ["nehme", "nimmst", "nimmt", "nehmt", "nahm", "nahmst",
               "nahmen", "nahmt", "genommen", "nehmend"],
    "finden": ["finde", "findest", "findet", "fand", "fandst", "fanden",
               "fandet", "gefunden", "findend"],
    "bleiben": ["bleibe", "bleibst", "bleibt", "blieb", "bliebst",
                "blieben", "bliebt", "geblieben", "bleibend"],
    "schreiben": ["schreibe", "schreibst", "schreibt", "schrieb",
                  "schriebst", "schrieben", "schriebt", "geschrieben",
                  "schreibend"],
    "sprechen": ["spreche", "sprichst", "spricht", "sprecht", "sprach",
                 "sprachst", "sprachen", "spracht", "gesprochen",
                 "sprechend"],
    "fahren": ["fahre", "fährst", "fährt", "fahrt", "fuhr", "fuhrst",
               "fuhren", "fuhrt", "gefahren", "fahrend"],
    "tragen": ["trage", "trägst", "trägt", "tragt", "trug", "trugst",
               "trugen", "trugt", "getragen", "tragend"],
    "laufen": ["laufe", "läufst", "läuft", "lauft", "lief", "liefst",
               "liefen", "lieft", "gelaufen", "laufend"],
    "essen": ["esse", "isst", "esst", "aß", "aßen", "aßt", "gegessen",
              "essend"],
    "trinken": ["trinke", "trinkst", "trinkt", "trank", "trankst",
                "tranken", "trankt", "getrunken", "trinkend"],
    "singen": ["singe", "singst", "singt", "sang", "sangst", "sangen",
               "sangt", "gesungen", "singend"],
    "beginnen": ["beginne", "beginnst", "beginnt", "begann", "begannst",
                 "begannen", "begannt", "begonnen", "beginnend"],
    "denken": ["denke", "denkst", "denkt", "dachte", "dachtest", "dachten",
               "dachtet", "gedacht", "denkend"],
    "bringen": ["bringe", "bringst", "bringt", "brachte", "brachtest",
                "brachten", "brachtet", "gebracht", "bringend"],
    "stehen": ["stehe", "stehst", "steht", "stand", "standst", "standen",
               "standet", "gestanden", "stehend"],
    "liegen": ["liege", "liegst", "liegt", "lag", "lagst", "lagen", "lagt",
               "gelegen", "liegend"],
    "halten": ["halte", "hältst", "hält", "haltet", "hielt", "hieltst",
               "hielten", "hieltet", "gehalten", "haltend"],
    "lesen": ["lese", "liest", "lest", "las", "lasen", "last", "gelesen",
              "lesend"],
    "rufen": ["rufe", "rufst", "ruft", "rief", "riefst", "riefen", "rieft",
              "gerufen", "rufend"],
    "ziehen": ["ziehe", "ziehst", "zieht", "zog", "zogst", "zogen", "zogt",
               "gezogen", "ziehend"],
    "verlieren": ["verliere", "verlierst", "verliert", "verlor",
                  "verlorst", "verloren", "verlort", "verlierend"],
}

DE_INSEPARABLE = ("be", "ver", "er", "ent", "emp", "zer", "ge", "miss")

DE_WEAK_VERBS = [
    "funktionieren", "machen", "sagen", "fragen", "brauchen", "zeigen",
    "spielen", "kaufen", "suchen", "wohnen", "lernen", "hören", "führen",
    "stellen", "legen", "setzen", "holen", "schicken", "zahlen", "bauen",
    "danken", "dauern", "drucken", "fehlen", "folgen", "glauben", "hoffen",
    "kochen", "leben", "lieben", "meinen", "planen", "prüfen", "reden",
    "sammeln", "schauen", "sparen", "spülen", "teilen", "träumen", "üben",
    "wählen", "wandern", "wechseln", "wünschen", "zählen", "zeichnen",
    "speichern", "filtern", "sortieren", "gruppieren", "optimieren",
    "analysieren", "implementieren", "konfigurieren", "installieren",
    "aktualisieren", "verarbeiten", "berechnen",
]


def de_weak_forms(inf: str):
    if inf.endswith(("eln", "ern")):
        stem = inf[:-1]
        # sammeln -> sammle/sammelt/sammelte/gesammelt
        base = stem[:-1] if stem.endswith("e") else stem
        yield base + "e"
        yield stem + "st"
        yield stem + "t"
        yield stem + "te"
        yield stem + "ten"
        yield "ge" + stem + "t"
        return
    stem = inf[:-2]
    e = "e" if stem.endswith(("t", "d", "chn", "ffn", "gn")) else ""
    yield stem + "e"
    yield stem + e + "st"
    yield stem + e + "t"
    yield stem + e + "te"
    yield stem + e + "test"
    yield stem + e + "ten"
    yield stem + e + "tet"
    if inf.endswith("ieren") or inf.startswith(DE_INSEPARABLE):
        yield stem + e + "t"
    else:
        yield "ge" + stem + e + "t"
    yield stem + "end"


def build_de() -> dict:
    t: dict = {}
    for lemma, forms in DE_IRREGULAR.items():
        for f in forms:
            add(t, f, lemma)
    for inf in DE_WEAK_VERBS:
        for f in de_weak_forms(inf):
            add(t, f, inf)
    return t


# --------------------------------------------------------------------------
# Spanish
# --------------------------------------------------------------------------

ES_IRREGULAR = {
    "ser": ["soy", "eres", "es", "somos", "sois", "son", "era", "eras",
            "éramos", "erais", "eran", "fui", "fuiste", "fue", "fuimos",
            "fuisteis", "fueron", "seré", "serás", "será", "seremos",
            "seréis", "serán", "sería", "serías", "seríamos", "serían",
            "sea", "seas", "seamos", "sean", "sido", "siendo"],
    "estar": ["estoy", "estás", "está", "estamos", "estáis", "están",
              "estaba", "estabas", "estábamos", "estaban", "estuve",
              "estuviste", "estuvo", "estuvimos", "estuvieron", "estaré",
              "estarás", "estará", "estaremos", "estarán", "estaría",
              "esté", "estés", "estén", "estado", "estando"],
    "ir": ["voy", "vas", "va", "vamos", "vais", "van", "iba", "ibas",
           "íbamos", "ibais", "iban", "iré", "irás", "irá", "iremos",
           "iréis", "irán", "iría", "irías", "iríamos", "irían", "vaya",
           "vayas", "vayamos", "vayan", "ido", "yendo"],
    "haber": ["he", "has", "ha", "hay", "hemos", "habéis", "han", "había",
              "habías", "habíamos", "habían", "hube", "hubo", "hubieron",
              "habré", "habrás", "habrá", "habremos", "habrán", "habría",
              "habrían", "haya", "hayas", "hayan", "habido", "habiendo"],
    "tener": ["tengo", "tienes", "tiene", "tenemos", "tenéis", "tienen",
              "tenía", "tenías", "teníamos", "tenían", "tuve", "tuviste",
              "tuvo", "tuvimos", "tuvieron", "tendré", "tendrás", "tendrá",
              "tendremos", "tendrán", "tendría", "tenga", "tengas",
              "tengan", "tenido", "teniendo"],
    "hacer": ["hago", "haces", "hace", "hacemos", "hacéis", "hacen",
              "hacía", "hacías", "hacíamos", "hacían", "hice", "hiciste",
              "hizo", "hicimos", "hicieron", "haré", "harás", "hará",
              "haremos", "harán", "haría", "haga", "hagas", "hagan",
              "hecho", "haciendo"],
    "poder": ["puedo", "puedes", "puede", "podemos", "podéis", "pueden",
              "podía", "podías", "podíamos", "podían", "pude", "pudiste",
              "pudo", "pudimos", "pudieron", "podré", "podrás", "podrá",
              "podremos", "podrán", "podría", "pueda", "puedas", "puedan",
              "podido", "pudiendo"],
    "decir": ["digo", "dices", "dice", "decimos", "decís", "dicen",
              "decía", "decías", "decíamos", "decían", "dije", "dijiste",
              "dijo", "dijimos", "dijeron", "diré", "dirás", "dirá",
              "diremos", "dirán", "diría", "diga", "digas", "digan",
              "dicho", "diciendo"],
    "dar": ["doy", "das", "da", "damos", "dais", "dan", "daba", "dabas",
            "dábamos", "daban", "di", "diste", "dio", "dimos", "dieron",
            "daré", "darás", "dará", "daremos", "darán", "daría", "dé",
            "des", "den", "dado", "dando"],
    "ver": ["veo", "ves", "ve", "vemos", "veis", "ven", "veía", "veías",
            "veíamos", "veían", "viste", "vio", "vimos", "vieron", "veré",
            "verás", "verá", "veremos", "verán", "vería", "vea", "veas",
            "vean", "visto", "viendo"],
    "saber": ["sé", "sabes", "sabe", "sabemos", "sabéis", "saben", "sabía",
              "sabías", "sabíamos", "sabían", "supe", "supiste", "supo",
              "supimos", "supieron", "sabré", "sabrás", "sabrá",
              "sabremos", "sabrán", "sabría", "sepa", "sepas", "sepan",
              "sabido", "sabiendo"],
    "querer": ["quiero", "quieres", "quiere", "queremos", "queréis",
               "quieren", "quería", "querías", "queríamos", "querían",
               "quise", "quisiste", "quiso", "quisimos", "quisieron",
               "querré", "querrá", "querría", "quiera", "quieras",
               "quieran", "querido", "queriendo"],
    "venir": ["vengo", "vienes", "viene", "venimos", "venís", "vienen",
              "venía", "venías", "veníamos", "venían", "vine", "viniste",
              "vino", "vinimos", "vinieron", "vendré", "vendrá", "vendría",
              "venga", "vengas", "vengan", "venido", "viniendo"],
    "poner": ["pongo", "pones", "pone", "ponemos", "ponéis", "ponen",
              "ponía", "ponías", "poníamos", "ponían", "puse", "pusiste",
              "puso", "pusimos", "pusieron", "pondré", "pondrá", "pondría",
              "ponga", "pongas", "pongan", "puesto", "poniendo"],
}

# stem-change-free regular verbs
ES_AR_VERBS = [
    "trabajar", "hablar", "mirar", "tomar", "dejar", "llamar", "esperar",
    "entrar", "quedar", "usar", "ganar", "necesitar", "estudiar",
    "caminar", "cantar", "bailar", "comprar", "escuchar", "ayudar",
    "preguntar", "desear", "enviar", "viajar", "visitar", "cocinar",
    "limpiar", "dibujar", "nadar", "saltar", "descansar", "preparar",
    "terminar", "aceptar", "acompañar", "cambiar", "considerar", "crear",
    "durar", "evitar", "existir", "faltar", "firmar", "formar", "guardar",
    "intentar", "lavar", "levantar", "notar", "ocupar", "pasar", "pesar",
    "presentar", "regresar", "representar", "resultar", "significar",
]
ES_AR_ENDINGS = [
    "o", "as", "a", "amos", "áis", "an",
    "aba", "abas", "ábamos", "abais", "aban",
    "é", "aste", "ó", "asteis", "aron",
    "aré", "arás", "ará", "aremos", "aréis", "arán",
    "aría", "arías", "aríamos", "aríais", "arían",
    "e", "es", "emos", "éis", "en",
    "ado", "ada", "ados", "adas", "ando",
]
ES_ER_VERBS = ["comer", "beber", "aprender", "comprender", "vender",
               "responder", "correr", "temer", "deber", "leer", "creer"]
ES_ER_ENDINGS = [
    "o", "es", "e", "emos", "éis", "en",
    "ía", "ías", "íamos", "íais", "ían",
    "í", "iste", "ió", "imos", "isteis", "ieron",
    "eré", "erás", "erá", "eremos", "eréis", "erán",
    "ería", "erías", "eríamos", "erían",
    "a", "as", "amos", "áis", "an",
    "ido", "ida", "idos", "idas", "iendo",
]
ES_IR_VERBS = ["vivir", "escribir", "recibir", "abrir", "subir", "decidir",
               "permitir", "ocurrir", "partir", "asistir", "describir",
               "descubrir", "insistir", "unir"]
ES_IR_ENDINGS = [
    "o", "es", "e", "imos", "ís", "en",
    "ía", "ías", "íamos", "íais", "ían",
    "í", "iste", "ió", "isteis", "ieron",
    "iré", "irás", "irá", "iremos", "iréis", "irán",
    "iría", "irías", "iríamos", "irían",
    "a", "as", "amos", "áis", "an",
    "ido", "ida", "idos", "idas", "iendo",
]
# irregular participles of otherwise-regular -ir/-er verbs
ES_IRREG_PARTICIPLES = {
    "escrito": "escribir", "abierto": "abrir", "descubierto": "descubrir",
    "descrito": "describir", "vuelto": "volver", "muerto": "morir",
    "roto": "romper", "resuelto": "resolver",
}


def build_es() -> dict:
    t: dict = {}
    for lemma, forms in ES_IRREGULAR.items():
        for f in forms:
            add(t, f, lemma)
    for f, lemma in ES_IRREG_PARTICIPLES.items():
        add(t, f, lemma)
    for inf in ES_AR_VERBS:
        stem = inf[:-2]
        for e in ES_AR_ENDINGS:
            add(t, stem + e, inf)
    for inf in ES_ER_VERBS:
        stem = inf[:-2]
        for e in ES_ER_ENDINGS:
            add(t, stem + e, inf)
    for inf in ES_IR_VERBS:
        stem = inf[:-2]
        for e in ES_IR_ENDINGS:
            add(t, stem + e, inf)
    return t


# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# Polish / Russian — LOOKUP APPROXIMATION of the reference's model mode
# --------------------------------------------------------------------------
# The reference lemmatizes pl/ru with spaCy statistical models
# (spacy_tokenizer.py:208-215); no model can ship offline, so these tables
# approximate the dominant regular paradigms for curated high-frequency
# word lists, exactly like the other generators: conservative,
# public-knowledge morphology only, identity on anything unlisted.
# Round-4 depth expansion (verdict item 6): verbal aspect pairs,
# conditionals, participles, noun declensions and adjective paradigms.

# Polish past stem = infinitive minus 'ć'; -eć verbs shift e->a in the
# singular/non-virile forms but keep e in the virile plural (widzieć ->
# widział / widzieli).
PL_REGULAR_VERBS = [
    # -ać incl. aspect pairs; -ować conjugates -uję so it gets past/
    # conditional only (PL_AM_CLASS below controls the present)
    "działać", "zadziałać", "czytać", "przeczytać", "mieszkać", "pytać",
    "zapytać", "słuchać", "posłuchać", "oglądać", "obejrzeć", "otwierać",
    "zamykać", "zaczynać", "kochać", "szukać", "pamiętać", "zapamiętać",
    "opowiadać", "opowiedzieć", "pomagać", "sprzątać", "posprzątać",
    "spotykać", "spotkać", "czekać", "zaczekać", "grać", "zagrać",
    "przepraszać", "przeprosić", "odwiedzać", "odwiedzić", "zwiedzać",
    "witać", "przywitać", "wracać", "wysyłać", "wysłać", "odbierać",
    "zbierać", "zebrać", "dodawać", "sprawdzać", "sprawdzić",
    "pracować", "zapracować", "kupować", "budować", "zbudować",
    "gotować", "ugotować", "planować", "zaplanować", "rysować",
    "drukować", "wydrukować", "testować", "przetestować", "kodować",
    # -ić / -yć incl. aspect pairs
    "robić", "zrobić", "mówić", "lubić", "polubić", "uczyć", "nauczyć",
    "kończyć", "skończyć", "tańczyć", "zatańczyć", "liczyć", "policzyć",
    "palić", "zapalić", "dzwonić", "zadzwonić", "prosić", "poprosić",
    "płacić", "zapłacić", "wierzyć", "uwierzyć", "tworzyć", "stworzyć",
    "łączyć", "połączyć", "znaczyć", "oznaczyć", "ważyć", "zważyć",
    # -eć (e->a shift handled)
    "widzieć", "zobaczyć", "słyszeć", "usłyszeć", "myśleć", "pomyśleć",
    "siedzieć", "leżeć", "woleć",
]

# round-5 extension: -ować tech/business verbs (all conjugate -uję on
# the -ow stem, past/conditional on the full stem — both mechanical)
PL_REGULAR_VERBS += [
    "generować", "wygenerować", "filtrować", "przefiltrować", "sortować",
    "posortować", "grupować", "pogrupować", "sumować", "zsumować",
    "kopiować", "skopiować", "eksportować", "wyeksportować",
    "importować", "zaimportować", "aktualizować", "zaktualizować",
    "analizować", "przeanalizować", "instalować", "zainstalować",
    "konfigurować", "skonfigurować", "programować", "zaprogramować",
    "projektować", "zaprojektować", "publikować", "opublikować",
    "edytować", "notować", "zanotować", "raportować", "organizować",
    "zorganizować", "definiować", "zdefiniować", "modyfikować",
    "zmodyfikować", "weryfikować", "zweryfikować", "archiwizować",
]

# present tense -am class is safe ONLY for bare -ać stems (NOT -ować,
# which conjugates -uję: pracować -> pracuję, never "pracowam")
PL_AM_CLASS = [
    v
    for v in PL_REGULAR_VERBS
    if v.endswith("ać") and not v.endswith("ować")
    and not v.endswith("awać")  # dodawać -> dodaję
    and not v.endswith("brać")  # zebrać -> zbiorę
    and v != "wysłać"           # wysłać -> wyślę
]

# -ować verbs conjugate uję/ujesz/uje/ujemy/ujecie/ują on the -ow stem
PL_UJE_CLASS = [v for v in PL_REGULAR_VERBS if v.endswith("ować")]

# -ić/-yć present: stem forms are regular for these (no consonant
# mutation in 1sg): robię/robisz... ; mutating stems (prosić->proszę,
# płacić->płacę) are EXCLUDED from 1sg/3pl and get only the safe
# -isz/-i/-imy/-icie block.
PL_IC_FULL = [
    "robić", "zrobić", "mówić", "lubić", "polubić", "dzwonić",
    "zadzwonić", "wierzyć", "uwierzyć", "uczyć",
    "nauczyć", "kończyć", "skończyć", "tańczyć", "zatańczyć", "liczyć",
    "policzyć", "tworzyć", "stworzyć", "łączyć", "połączyć", "ważyć",
]
# 1sg/3pl mutate (proszę, płacę, palę) -> only the safe -isz/-i block
PL_IC_SAFE = ["prosić", "poprosić", "płacić", "zapłacić", "znaczyć",
              "palić", "zapalić"]

# passive participle -any + adverbial/adjectival -ając/-ający exist for
# the imperfective -ać transitives (a conservative subset)
PL_ANY_PARTICIPLE = [
    "czytać", "pytać", "słuchać", "oglądać", "otwierać", "zamykać",
    "kochać", "szukać", "opowiadać", "witać", "wysyłać", "zbierać",
    "sprawdzać", "odwiedzać", "zwiedzać",
]

# verbal nouns (gerunds) are affix-regular for these stem shapes; the
# s/z-stem mutations (prosić -> proszenie) are excluded below
_PL_VN_SKIP = {"prosić", "poprosić", "przeprosić", "woleć", "obejrzeć"}


def pl_verbal_noun(inf: str) -> str | None:
    """czytać -> czytanie, robić -> robienie, uczyć -> uczenie,
    widzieć -> widzenie; None where the stem mutates (excluded)."""
    if inf in _PL_VN_SKIP:
        return None
    if inf.endswith("ać"):
        return inf[:-1] + "nie"
    if inf.endswith("ieć"):
        return inf[:-3] + "enie"
    if inf.endswith("eć") or inf.endswith("yć"):
        return inf[:-2] + "enie"
    if inf.endswith(("sić", "zić")):
        return None  # proszenie / wożenie mutate
    if inf.endswith(("cić", "dzić", "lić")):
        return inf[:-2] + "enie"  # płacenie, sprawdzenie, palenie
    if inf.endswith("ić"):
        return inf[:-2] + "ienie"  # robienie, mówienie, dzwonienie
    return None


# passive participle masc-sg for -ić/-yć verbs, explicit because the
# softening (-iony vs -ony) follows the same stem classes as the noun
PL_ONY_PARTICIPLE = {
    "robić": "robiony", "zrobić": "zrobiony", "mówić": "mówiony",
    "lubić": "lubiony", "uczyć": "uczony", "nauczyć": "nauczony",
    "kończyć": "kończony", "skończyć": "skończony", "liczyć": "liczony",
    "policzyć": "policzony", "tworzyć": "tworzony",
    "stworzyć": "stworzony", "łączyć": "łączony",
    "połączyć": "połączony", "palić": "palony", "zapalić": "zapalony",
    "ważyć": "ważony", "sprawdzić": "sprawdzony",
    "zapłacić": "zapłacony", "odwiedzić": "odwiedzony",
    "oznaczyć": "oznaczony", "zobaczyć": "zobaczony",
}

_PL_ADJ_LONG = ("ego", "emu", "ym", "a", "ej", "ą", "e", "ych", "ymi")
# -ki/-gi stems: endings attach to the bare velar (szybk-), with the
# softening i carried by the ending itself (szybkiego, szybkie, szybkimi)
_PL_ADJ_LONG_I = ("iego", "iemu", "im", "a", "iej", "ą", "ie", "ich", "imi")

# (lemma, virile nom-pl — the one mutated form, listed explicitly)
PL_ADJECTIVES = [
    ("dobry", "dobrzy"), ("nowy", "nowi"), ("ważny", "ważni"),
    ("pełny", "pełni"), ("główny", "główni"), ("zielony", "zieloni"),
    ("czerwony", "czerwoni"), ("znany", "znani"), ("pewny", "pewni"),
    ("silny", "silni"), ("wolny", "wolni"), ("zimny", None),
    ("ciemny", None), ("jasny", None), ("czarny", "czarni"),
]
PL_ADJECTIVES_KI = [  # -ki/-gi stems take the -im/-ie endings
    ("szybki", None), ("wysoki", "wysocy"), ("niski", "niscy"),
    ("krótki", None), ("długi", "dłudzy"), ("drogi", "drodzy"),
    ("lekki", None), ("wielki", "wielcy"), ("polski", "polscy"),
]

# explicit full declensions: (lemma, [all other case forms]) — written
# out by hand because Polish dat/loc palatalization is not affix-regular
PL_NOUNS = {
    "dom": ["domu", "domowi", "domem", "domy", "domów", "domom",
            "domami", "domach"],
    "klient": ["klienta", "klientowi", "klientem", "kliencie", "klienci",
               "klientów", "klientom", "klientami", "klientach"],
    "system": ["systemu", "systemowi", "systemem", "systemie", "systemy",
               "systemów", "systemom", "systemami", "systemach"],
    "program": ["programu", "programowi", "programem", "programie",
                "programy", "programów", "programom", "programami",
                "programach"],
    "projekt": ["projektu", "projektowi", "projektem", "projekcie",
                "projekty", "projektów", "projektom", "projektami",
                "projektach"],
    "plik": ["pliku", "plikowi", "plikiem", "pliki", "plików", "plikom",
             "plikami", "plikach"],
    "raport": ["raportu", "raportowi", "raportem", "raporcie", "raporty",
               "raportów", "raportom", "raportami", "raportach"],
    "wynik": ["wyniku", "wynikowi", "wynikiem", "wyniki", "wyników",
              "wynikom", "wynikami", "wynikach"],
    "praca": ["pracy", "pracę", "pracą", "prace", "prac", "pracom",
              "pracami", "pracach"],
    "firma": ["firmy", "firmie", "firmę", "firmą", "firm", "firmom",
              "firmami", "firmach"],
    "tabela": ["tabeli", "tabelę", "tabelą", "tabele", "tabel",
               "tabelom", "tabelami", "tabelach"],
    "liczba": ["liczby", "liczbie", "liczbę", "liczbą", "liczb",
               "liczbom", "liczbami", "liczbach"],
    "słowo": ["słowa", "słowu", "słowem", "słowie", "słów", "słowom",
              "słowami", "słowach"],
    "miasto": ["miasta", "miastu", "miastem", "mieście", "miast",
               "miastom", "miastami", "miastach"],
    "pytanie": ["pytania", "pytaniu", "pytaniem", "pytań", "pytaniom",
                "pytaniami", "pytaniach"],
    "zadanie": ["zadania", "zadaniu", "zadaniem", "zadań", "zadaniom",
                "zadaniami", "zadaniach"],
    "serwer": ["serwera", "serwerowi", "serwerem", "serwerze", "serwery",
               "serwerów", "serwerom", "serwerami", "serwerach"],
    "model": ["modelu", "modelowi", "modelem", "modele", "modeli",
              "modelom", "modelami", "modelach"],
}

# round-5 extension: more hand declensions (same hand-written policy —
# dat/loc palatalization is not affix-regular)
PL_NOUNS.update({
    "miasto": ["miasta", "miastu", "miastem", "mieście", "miast",
               "miastom", "miastami", "miastach"],
    "kraj": ["kraju", "krajowi", "krajem", "kraje", "krajów", "krajom",
             "krajami", "krajach"],
    "okres": ["okresu", "okresowi", "okresem", "okresie", "okresy",
              "okresów", "okresom", "okresami", "okresach"],
    "proces": ["procesu", "procesowi", "procesem", "procesie", "procesy",
               "procesów", "procesom", "procesami", "procesach"],
    "adres": ["adresu", "adresowi", "adresem", "adresie", "adresy",
              "adresów", "adresom", "adresami", "adresach"],
    "numer": ["numeru", "numerowi", "numerem", "numerze", "numery",
              "numerów", "numerom", "numerami", "numerach"],
    "obraz": ["obrazu", "obrazowi", "obrazem", "obrazie", "obrazy",
              "obrazów", "obrazom", "obrazami", "obrazach"],
    "format": ["formatu", "formatowi", "formatem", "formacie", "formaty",
               "formatów", "formatom", "formatami", "formatach"],
    "katalog": ["katalogu", "katalogowi", "katalogiem", "katalogi",
                "katalogów", "katalogom", "katalogami", "katalogach"],
    "tekst": ["tekstu", "tekstowi", "tekstem", "tekście", "teksty",
              "tekstów", "tekstom", "tekstami", "tekstach"],
    "język": ["języka", "językowi", "językiem", "języku", "języki",
              "języków", "językom", "językami", "językach"],
    "czas": ["czasu", "czasowi", "czasem", "czasie", "czasy", "czasów",
             "czasom", "czasami", "czasach"],
    "koszt": ["kosztu", "kosztowi", "kosztem", "koszcie", "koszty",
              "kosztów", "kosztom", "kosztami", "kosztach"],
    "rynek": ["rynku", "rynkowi", "rynkiem", "rynki", "rynków",
              "rynkom", "rynkami", "rynkach"],
    "zespół": ["zespołu", "zespołowi", "zespołem", "zespole", "zespoły",
               "zespołów", "zespołom", "zespołami", "zespołach"],
    "produkt": ["produktu", "produktowi", "produktem", "produkcie",
                "produkty", "produktów", "produktom", "produktami",
                "produktach"],
    "element": ["elementu", "elementowi", "elementem", "elemencie",
                "elementy", "elementów", "elementom", "elementami",
                "elementach"],
    "dokument": ["dokumentu", "dokumentowi", "dokumentem", "dokumencie",
                 "dokumenty", "dokumentów", "dokumentom", "dokumentami",
                 "dokumentach"],
    "parametr": ["parametru", "parametrowi", "parametrem", "parametrze",
                 "parametry", "parametrów", "parametrom", "parametrami",
                 "parametrach"],
    "folder": ["folderu", "folderowi", "folderem", "folderze",
               "foldery", "folderów", "folderom", "folderami",
               "folderach"],
    "kolumna": ["kolumny", "kolumnie", "kolumnę", "kolumną", "kolumn",
                "kolumnom", "kolumnami", "kolumnach"],
    "osoba": ["osoby", "osobie", "osobę", "osobą", "osób", "osobom",
              "osobami", "osobach"],
    "grupa": ["grupy", "grupie", "grupę", "grupą", "grup", "grupom",
              "grupami", "grupach"],
    # "liście" omitted: collides with liść nom-pl (wrong > missing)
    "lista": ["listy", "listę", "listą", "list", "listom",
              "listami", "listach"],
    "wersja": ["wersji", "wersję", "wersją", "wersje", "wersjom",
               "wersjami", "wersjach"],
    "funkcja": ["funkcji", "funkcję", "funkcją", "funkcje", "funkcjom",
                "funkcjami", "funkcjach"],
    "operacja": ["operacji", "operację", "operacją", "operacje",
                 "operacjom", "operacjami", "operacjach"],
    "informacja": ["informacji", "informację", "informacją",
                   "informacje", "informacjom", "informacjami",
                   "informacjach"],
    "aplikacja": ["aplikacji", "aplikację", "aplikacją", "aplikacje",
                  "aplikacjom", "aplikacjami", "aplikacjach"],
    "organizacja": ["organizacji", "organizację", "organizacją",
                    "organizacje", "organizacjom", "organizacjami",
                    "organizacjach"],
    "usługa": ["usługi", "usłudze", "usługę", "usługą", "usług",
               "usługom", "usługami", "usługach"],
    "baza": ["bazy", "bazie", "bazę", "bazą", "baz", "bazom", "bazami",
             "bazach"],
    "strona": ["strony", "stronie", "stronę", "stroną", "stron",
               "stronom", "stronami", "stronach"],
    "sieć": ["sieci", "siecią", "sieciom", "sieciami", "sieciach"],
    "wartość": ["wartości", "wartością", "wartościom", "wartościami",
                "wartościach"],
    "możliwość": ["możliwości", "możliwością", "możliwościom",
                  "możliwościami", "możliwościach"],
})

PL_ADJECTIVES += [
    ("stary", "starzy"), ("młody", "młodzi"), ("trudny", "trudni"),
    ("łatwy", "łatwi"), ("gotowy", "gotowi"), ("bogaty", "bogaci"),
    ("otwarty", "otwarci"), ("zamknięty", None), ("kolejny", "kolejni"),
    ("publiczny", "publiczni"), ("prywatny", "prywatni"),
    ("lokalny", "lokalni"), ("globalny", "globalni"),
    ("centralny", "centralni"), ("cyfrowy", None), ("sieciowy", None),
    ("techniczny", "techniczni"), ("praktyczny", "praktyczni"),
    ("historyczny", None), ("klasyczny", None), ("elektroniczny", None),
    ("narodowy", "narodowi"), ("międzynarodowy", None),
    ("finansowy", None), ("kulturalny", None),
    ("polityczny", "polityczni"), ("ekonomiczny", None),
    ("społeczny", "społeczni"), ("naukowy", "naukowi"),
    ("zdrowy", "zdrowi"), ("ciepły", None), ("piękny", "piękni"),
]


def build_pl() -> dict:
    t: dict = {}
    for inf in PL_REGULAR_VERBS:
        stem = inf[:-1]  # minus ć
        if inf.endswith("eć"):
            a_stem = stem[:-1] + "a"  # widzie- -> widzia-
            e_stem = stem  # virile plural keeps e
        else:
            a_stem = stem
            e_stem = stem
        # past tense (l-participle + person endings)
        for suf in ("ł", "ła", "ło", "ły", "łem", "łam", "łeś", "łaś"):
            add(t, a_stem + suf, inf)
        for suf in ("li", "liśmy", "liście"):
            add(t, e_stem + suf, inf)
        for suf in ("łyśmy", "łyście"):
            add(t, a_stem + suf, inf)
        # conditional: l-participle + by + person ending
        for suf in ("łbym", "łbyś", "łby", "łabym", "łabyś", "łaby",
                    "łoby", "łyby"):
            add(t, a_stem + suf, inf)
        for suf in ("liby", "libyśmy", "libyście"):
            add(t, e_stem + suf, inf)
    for inf in PL_AM_CLASS:
        pres = inf[:-1]  # 'działa'
        for suf in ("m", "sz", "", "my", "cie", "ją"):
            add(t, pres + suf, inf)
    for inf in PL_UJE_CLASS:
        ustem = inf[:-4] + "uj"  # pracować -> pracuj
        for suf in ("ę", "esz", "e", "emy", "ecie", "ą"):
            add(t, ustem + suf, inf)
        add(t, ustem, inf)  # imperative
    for inf in PL_IC_FULL + PL_IC_SAFE:
        stem = inf[:-1]  # robi / uczy
        base = stem[:-1]  # rob / ucz
        add(t, stem, inf)  # 3sg: robi / uczy
        for suf in ("sz", "my", "cie"):
            add(t, stem + suf, inf)
        if inf in PL_IC_FULL:
            if inf.endswith("ić"):
                add(t, stem + "ę", inf)  # robię (i kept: softening)
                add(t, stem + "ą", inf)  # robią
            else:
                add(t, base + "ę", inf)  # uczę (y dropped)
                add(t, base + "ą", inf)  # uczą
    for inf in PL_ANY_PARTICIPLE:
        pstem = inf[:-1] + "n"  # czyta -> czytan
        for suf in ("y", "a", "e", "i", "ego", "emu", "ym", "ej", "ą",
                    "ych", "ymi"):
            add(t, pstem + suf, inf)
        astem = inf[:-1] + "j"  # czytaj
        add(t, astem + "ąc", inf)  # adverbial: czytając
        for suf in ("ący", "ąca", "ące", "ącego", "ącemu", "ącym",
                    "ącej", "ącą", "ących", "ącymi"):
            add(t, astem + suf, inf)  # adjectival: czytający...
    for lemma, virile in PL_ADJECTIVES:
        stem = lemma[:-1]
        for suf in _PL_ADJ_LONG:
            add(t, stem + suf, lemma)
        if virile:
            add(t, virile, lemma)
    for lemma, virile in PL_ADJECTIVES_KI:
        base = lemma[:-1]  # minus final 'i': szybki -> szybk
        for suf in _PL_ADJ_LONG_I:
            add(t, base + suf, lemma)
        if virile:
            add(t, virile, lemma)
    for lemma, forms in PL_NOUNS.items():
        for f in forms:
            add(t, f, lemma)
    # verbal nouns (gerunds) decline as neuter nouns and lemmatize to
    # their own nominative (the lookup-table treatment — gerunds are
    # nouns there, NOT reduced to the verb): czytania/czytaniu/czytaniem
    # -> czytanie
    for inf in PL_REGULAR_VERBS:
        vn = pl_verbal_noun(inf)
        if vn is None or vn in PL_NOUNS:
            continue  # hand declension already covers it
        add(t, vn[:-1] + "a", vn)
        add(t, vn[:-1] + "u", vn)
        add(t, vn + "m", vn)
    # -ony passive participles decline adjectivally and reduce to the
    # infinitive — same convention as the -any participles above
    # (robiony/robiona/robionego ... -> robić)
    for inf, part in PL_ONY_PARTICIPLE.items():
        stem = part[:-1]
        add(t, part, inf)
        for suf in ("a", "e", "ego", "emu", "ym", "ej", "ą", "ych",
                    "ymi"):
            add(t, stem + suf, inf)
    return t


# Russian: past = infinitive minus 'ть' + л/ла/ло/ли (reliable for -ать/
# -ять/-еть/-ить). Present tense split into explicit mutation-safe
# classes; Russian conditional is past + a free-standing "бы", so the
# past forms already cover it.
RU_PAST_VERBS = [
    # first-conjugation -ать/-ять (incl. aspect pairs)
    "работать", "делать", "сделать", "думать", "подумать", "знать",
    "узнать", "читать", "прочитать", "играть", "сыграть", "слушать",
    "послушать", "спрашивать", "спросить", "отвечать", "ответить",
    "понимать", "понять", "начинать", "начать", "покупать", "купить",
    "открывать", "открыть", "закрывать", "закрыть", "рассказывать",
    "рассказать", "показывать", "показать", "помогать",
    "гулять", "погулять", "терять", "потерять", "менять", "поменять",
    "мечтать", "решать", "решить", "получать", "получить", "отправлять",
    "отправить", "добавлять", "добавить", "проверять", "проверить",
    "создавать", "создать", "запускать", "запустить", "искать",
    # second-conjugation -ить/-еть/-ать
    "говорить", "поговорить", "смотреть", "посмотреть", "видеть",
    "увидеть", "слышать", "услышать", "держать", "лежать", "сидеть",
    "звонить", "позвонить", "строить", "построить", "готовить",
    "приготовить", "ставить", "поставить", "учить", "выучить",
    "любить", "верить", "поверить", "варить", "хранить", "сохранить",
    "кричать", "молчать", "служить", "дружить", "просить", "попросить",
    "платить", "заплатить", "носить", "водить", "ходить", "приходить",
    # -овать/-евать (past is regular on the full stem)
    "использовать", "рисовать", "нарисовать", "организовать",
    "советовать", "посоветовать", "чувствовать", "требовать",
    "существовать", "действовать", "участвовать", "пробовать",
    "попробовать", "танцевать",
]
# round-5 extension: more aspect pairs and tech/business verbs (past
# tense is mechanical on the full stem for every one of these)
RU_PAST_VERBS += [
    "завершать", "завершить", "обновлять", "обновить", "удалять",
    "удалить", "изменять", "изменить", "сохранять", "загружать",
    "загрузить", "выбирать", "выбрать", "собирать", "собрать",
    "устанавливать", "установить", "настраивать", "настроить",
    "вычислять", "вычислить", "объяснять", "объяснить", "определять",
    "определить", "выполнять", "выполнить", "включать", "включить",
    "выключать", "выключить", "подключать", "подключить",
    "обрабатывать", "обработать", "копировать", "скопировать",
    "вставлять", "вставить", "записывать", "записать", "считать",
    "посчитать", "сравнивать", "сравнить", "разрабатывать",
    "разработать", "тестировать", "протестировать", "программировать",
    "экспортировать", "импортировать", "фильтровать", "сортировать",
    "группировать", "суммировать", "генерировать", "сгенерировать",
    "анализировать", "проанализировать", "планировать",
    "запланировать", "публиковать", "опубликовать", "редактировать",
    "отредактировать", "форматировать", "отформатировать",
]

# clean first conjugation: stem(-ть) + ю/ешь/ет/ем/ете/ют, imperative
# stem + й(те) — safe only for -ать/-ять verbs that stay vocalic
# (NOT показать->покажу, искать->ищу, понять->пойму, создать->создам)
RU_PRESENT_ACLASS = [
    "работать", "делать", "думать", "знать", "читать", "играть",
    "слушать", "спрашивать", "отвечать", "понимать", "начинать",
    "покупать", "открывать", "закрывать", "рассказывать", "показывать",
    "помогать", "гулять", "терять", "менять", "мечтать", "решать",
    "получать", "отправлять", "добавлять", "проверять", "запускать",
    # round-5 extension (all vocalic-stem imperfectives)
    "завершать", "обновлять", "удалять", "изменять", "сохранять",
    "загружать", "выбирать", "собирать", "устанавливать",
    "настраивать", "вычислять", "объяснять", "определять", "выполнять",
    "включать", "выключать", "подключать", "обрабатывать", "вставлять",
    "записывать", "считать", "сравнивать", "разрабатывать",
]
# second conjugation, no 1sg mutation (stems in р/л/н/vowel):
# stem(-ить) + ю/ишь/ит/им/ите/ят, imperative stem + и(те)
RU_IT_FULL = [
    "говорить", "поговорить", "звонить", "позвонить", "строить",
    "построить", "варить", "хранить", "сохранить", "верить", "поверить",
    # round-5 extension (р/л/н/vowel stems, no 1sg mutation)
    "удалить", "изменить", "объяснить", "определить", "выполнить",
    "вычислить", "сравнить", "настроить",
]
# second conjugation, husher stems (ж/ч/ш/щ): у/ат instead of ю/ят;
# infinitive may be -ать (держать) or -ить (служить)
RU_IT_HUSHER = [
    "слышать", "услышать", "держать", "лежать", "кричать", "молчать",
    "учить", "выучить", "служить", "дружить", "получить",
    # round-5 extension (ж/ч/ш/щ stems: у/ат)
    "завершить", "включить", "выключить", "подключить",
]
# second conjugation, labial stems (б/в/м/п): epenthetic л in 1sg only
# (любить -> люблю, любишь, ..., любят)
RU_IT_LABIAL = [
    "любить", "готовить", "приготовить", "ставить", "поставить",
    "отправить", "добавить",
    # round-5 extension (б/в/м/п stems: epenthetic л in 1sg)
    "обновить", "вставить", "установить",
]
# second conjugation, dental-mutation 1sg (вижу, прошу, плачу) — only
# the safe ишь/ит/им/ите/ят block is generated; 1sg omitted
RU_IT_SAFE = [
    "видеть", "увидеть", "смотреть", "посмотреть", "сидеть", "просить",
    "попросить", "платить", "заплатить", "носить", "водить", "ходить",
    "приходить", "спросить", "ответить", "запустить", "проверить",
    # round-5 extension (1sg mutates -> only the ишь/ит block)
    "загрузить",
]
# -овать/-евать conjugate -ую on the -ов/-ев-less stem
RU_OVAT = [
    "использовать", "рисовать", "нарисовать", "организовать",
    "советовать", "посоветовать", "чувствовать", "требовать",
    "существовать", "действовать", "участвовать", "пробовать",
    "попробовать", "танцевать",
    # round-5 extension: -овать/-ировать all conjugate -ую on the
    # suffix-less stem (тестирую, фильтрую, публикую)
    "копировать", "скопировать", "тестировать", "протестировать",
    "программировать", "экспортировать", "импортировать",
    "фильтровать", "сортировать", "группировать", "суммировать",
    "генерировать", "сгенерировать", "анализировать",
    "проанализировать", "планировать", "запланировать", "публиковать",
    "опубликовать", "редактировать", "отредактировать",
    "форматировать", "отформатировать",
]
# present active participle (-ющий) + gerund (-я) + past active (-вший)
# for imperfective first-conjugation transitives — conservative subset
RU_PARTICIPLE = [
    "работать", "делать", "думать", "знать", "читать", "играть",
    "слушать", "понимать", "покупать", "показывать", "помогать",
    "решать", "получать", "проверять", "использовать",
    # round-5 extension
    "завершать", "обновлять", "удалять", "изменять", "сохранять",
    "загружать", "выбирать", "устанавливать", "обрабатывать",
    "выполнять", "включать", "анализировать", "тестировать",
    "планировать", "генерировать",
]
# perfective passive past participle -нный on the infinitive stem
# (сделанный, прочитанный) — only where the bare stem is correct
RU_NN_PARTICIPLE = [
    "сделать", "прочитать", "показать", "рассказать", "потерять",
    "нарисовать", "организовать",
    # round-5 extension (perfectives whose bare stem + нн is correct)
    "обработать", "разработать", "записать", "посчитать", "выбрать",
    "собрать", "скопировать", "протестировать", "сгенерировать",
    "проанализировать", "запланировать", "опубликовать",
    "отредактировать", "отформатировать",
]
RU_IRREGULARS = [
    ("быть", "был", "была", "было", "были", "есть", "будет", "будут",
     "будь", "будьте", "буду", "будешь", "будем", "будете"),
    ("идти", "шёл", "шла", "шло", "шли", "идёт", "идут", "иду",
     "идёшь", "идём", "идёте", "иди", "идите"),
    ("мочь", "мог", "могла", "могло", "могли", "может", "могут",
     "могу", "можешь", "можем", "можете"),
    ("хотеть", "хотел", "хотела", "хотело", "хотели", "хочет", "хотят",
     "хочу", "хочешь", "хотим", "хотите"),
    ("жить", "жил", "жила", "жило", "жили", "живёт", "живут", "живу",
     "живёшь", "живём", "живёте", "живи", "живите"),
    ("дать", "дал", "дала", "дало", "дали", "даст", "дадут", "дам",
     "дашь", "дадим", "дадите", "дай", "дайте", "данный"),
    ("взять", "взял", "взяла", "взяло", "взяли", "возьмёт", "возьмут",
     "возьму", "возьмёшь", "возьми", "возьмите", "взятый"),
    ("писать", "писал", "писала", "писало", "писали", "пишет", "пишут",
     "пишу", "пишешь", "пишем", "пишете", "пиши", "пишите"),
    ("написать", "написал", "написала", "написало", "написали",
     "напишет", "напишут", "напишу", "напиши", "напишите",
     "написанный"),
    ("сказать", "сказал", "сказала", "сказало", "сказали", "скажет",
     "скажут", "скажу", "скажешь", "скажи", "скажите", "сказанный"),
    ("найти", "нашёл", "нашла", "нашло", "нашли", "найдёт", "найдут",
     "найду", "найдёшь", "найди", "найдите", "найденный"),
    ("понять", "понял", "поняла", "поняло", "поняли", "поймёт",
     "поймут", "пойму", "поймёшь", "пойми", "поймите", "понятый"),
    ("начать", "начал", "начала", "начало", "начали", "начнёт",
     "начнут", "начну", "начнёшь", "начни", "начните", "начатый"),
    ("создать", "создал", "создала", "создало", "создали", "создаст",
     "создадут", "создам", "создашь", "созданный"),
    ("помочь", "помог", "помогла", "помогло", "помогли", "поможет",
     "помогут", "помогу", "поможешь", "помоги", "помогите"),
    ("искать", "искал", "искала", "искало", "искали", "ищет", "ищут",
     "ищу", "ищешь", "ищи", "ищите"),
    ("купить", "купил", "купила", "купило", "купили", "купит", "купят",
     "куплю", "купишь", "купи", "купите", "купленный"),
    ("открыть", "открыл", "открыла", "открыло", "открыли", "откроет",
     "откроют", "открою", "откроешь", "открой", "откройте",
     "открытый"),
    ("закрыть", "закрыл", "закрыла", "закрыло", "закрыли", "закроет",
     "закроют", "закрою", "закрой", "закройте", "закрытый"),
]

# explicit full declensions (nom-sg lemma -> all other case forms);
# written out by hand — Russian stress shifts and fleeting vowels are
# not affix-regular (день -> дня, ошибка -> ошибок, год -> лет)
RU_NOUNS = {
    "дом": ["дома", "дому", "домом", "доме", "домов", "домам",
            "домами", "домах"],
    "работа": ["работы", "работе", "работу", "работой", "работ",
               "работам", "работами", "работах"],
    "система": ["системы", "системе", "систему", "системой", "систем",
                "системам", "системами", "системах"],
    "программа": ["программы", "программе", "программу", "программой",
                  "программ", "программам", "программами",
                  "программах"],
    "проект": ["проекта", "проекту", "проектом", "проекте", "проекты",
               "проектов", "проектам", "проектами", "проектах"],
    "файл": ["файла", "файлу", "файлом", "файле", "файлы", "файлов",
             "файлам", "файлами", "файлах"],
    "вопрос": ["вопроса", "вопросу", "вопросом", "вопросе", "вопросы",
               "вопросов", "вопросам", "вопросами", "вопросах"],
    "ответ": ["ответа", "ответу", "ответом", "ответе", "ответы",
              "ответов", "ответам", "ответами", "ответах"],
    "слово": ["слова", "слову", "словом", "слове", "слов", "словам",
              "словами", "словах"],
    "город": ["города", "городу", "городом", "городе", "городов",
              "городам", "городами", "городах"],
    "клиент": ["клиента", "клиенту", "клиентом", "клиенте", "клиенты",
               "клиентов", "клиентам", "клиентами", "клиентах"],
    "сервер": ["сервера", "серверу", "сервером", "сервере", "серверы",
               "серверов", "серверам", "серверами", "серверах"],
    "задача": ["задачи", "задаче", "задачу", "задачей", "задач",
               "задачам", "задачами", "задачах"],
    "таблица": ["таблицы", "таблице", "таблицу", "таблицей", "таблиц",
                "таблицам", "таблицами", "таблицах"],
    "число": ["числа", "числу", "числом", "числе", "чисел", "числам",
              "числами", "числах"],
    "результат": ["результата", "результату", "результатом",
                  "результате", "результаты", "результатов",
                  "результатам", "результатами", "результатах"],
    "отчёт": ["отчёта", "отчёту", "отчётом", "отчёте", "отчёты",
              "отчётов", "отчётам", "отчётами", "отчётах"],
    "модель": ["модели", "моделью", "моделей", "моделям", "моделями",
               "моделях"],
    "пользователь": ["пользователя", "пользователю", "пользователем",
                     "пользователе", "пользователи", "пользователей",
                     "пользователям", "пользователями",
                     "пользователях"],
    "ошибка": ["ошибки", "ошибке", "ошибку", "ошибкой", "ошибок",
               "ошибкам", "ошибками", "ошибках"],
    "строка": ["строки", "строке", "строку", "строкой", "строк",
               "строкам", "строками", "строках"],
    "код": ["кода", "коду", "кодом", "коде", "коды", "кодов", "кодам",
            "кодами", "кодах"],
    "день": ["дня", "дню", "днём", "дне", "дни", "дней", "дням",
             "днями", "днях"],
    "год": ["года", "году", "годом", "годы", "лет", "годам", "годами",
            "годах"],
}

# round-5 extension: mechanical noun declensions for the affix-regular
# classes (NO fleeting vowels, NO stress-dependent spellings — words
# with е/о-drop like рынок/ошибка stay in the hand lists)
#
# masc hard consonant, plural -ы: стол -> стола/столу/столом/столе/
# столы/столов/столам/столами/столах
RU_NOUN_M_HARD = [
    "завод", "компьютер", "телефон", "документ", "журнал", "билет",
    "магазин", "ресторан", "институт", "университет", "студент",
    "процесс", "сервис", "сайт", "формат", "метод", "объект",
    "элемент", "момент", "период", "регион", "департамент",
    "параметр", "аргумент", "инструмент", "механизм", "алгоритм",
    "фрагмент", "сегмент", "эксперимент", "контракт", "продукт",
    "аспект", "эффект", "дефект", "эксперт", "паспорт", "аэропорт",
    "концерт", "автобус", "интерес", "анализ", "статус", "индекс",
    "офис", "адрес", "класс", "текст", "тест", "отдел", "канал",
    "сигнал", "материал", "журналист", "специалист", "программист",
]
# masc velar-final (к/г/х), plural -и, instr still -ом
RU_NOUN_M_VELAR = [
    "банк", "парк", "урок", "язык", "признак", "источник",
    "справочник", "блок", "поток", "флаг", "шаг", "долг", "стих",
    "техник", "заказчик", "счётчик", "датчик", "ученик", "работник",
    "сотрудник", "участник", "помощник", "разработчик",
]
# fem -а, hard non-velar stem, gen-pl = bare stem: работа -> работы/
# работе/работу/работой/работ/работам/работами/работах
RU_NOUN_F_A = [
    "группа", "фирма", "форма", "фраза", "цифра", "буква", "карта",
    "лампа", "комната", "минута", "секунда", "сумма", "схема", "тема",
    "проблема", "теорема", "команда", "причина", "машина", "женщина",
    "картина", "газета", "планета", "монета", "анкета", "программа",
    "диаграмма", "платформа", "реформа", "норма", "структура",
    "культура", "литература", "температура", "архитектура",
    "процедура", "фигура", "мера", "эра", "сфера", "камера", "опера",
]
# fem -га/-ха (velar: gen-sg/nom-pl -и), gen-pl = bare stem
RU_NOUN_F_GA = ["книга", "дорога", "бумага", "эпоха"]
# deverbal neuters in -ние/-тие: значение -> значения/значению/
# значением/значении/значений/значениям/значениями/значениях
RU_NOUN_NIE = [
    "значение", "решение", "движение", "предложение", "изменение",
    "явление", "управление", "образование", "объяснение",
    "соединение", "сообщение", "население", "поведение", "мнение",
    "внимание", "задание", "здание", "знание", "название", "собрание",
    "создание", "описание", "основание", "указание", "требование",
    "использование", "исследование", "обновление", "удаление",
    "выполнение", "вычисление", "сохранение", "подключение",
    "завершение", "развитие", "событие", "понятие", "условие",
    "действие", "отличие", "наличие",
]
# fem -ия (цempty -ции/-сии...): информация -> информации/информацию/
# информацией/информациям/информациями/информациях
RU_NOUN_F_IYA = [
    "информация", "организация", "операция", "функция", "конструкция",
    "инструкция", "редакция", "коллекция", "секция", "позиция",
    "традиция", "станция", "профессия", "сессия", "комиссия",
    "миссия", "дискуссия", "территория", "категория", "история",
    "теория", "лаборатория", "конференция", "тенденция", "инспекция",
    "реакция", "акция", "нация", "ситуация", "документация",
    "конфигурация", "интеграция", "миграция", "регистрация", "версия",
]

_RU_ADJ_HARD = ("ого", "ому", "ым", "ом", "ая", "ой", "ую", "ое",
                "ые", "ых", "ыми")
# velar stems (к/г/х): и replaces ы (высоким, высокие, высоких)
_RU_ADJ_VELAR = ("ого", "ому", "им", "ом", "ая", "ой", "ую", "ое",
                 "ие", "их", "ими")
# soft stems (-ний): е/я/ю/и series (последнего, последняя, последние)
_RU_ADJ_SOFT = ("его", "ему", "им", "ем", "яя", "ей", "юю", "ее",
                "ие", "их", "ими")

RU_ADJ_HARD = [
    "новый", "важный", "полный", "главный", "красный", "чёрный",
    "белый", "умный", "сильный", "разный", "нужный", "точный",
    "сложный", "простой", "быстрый", "старый", "добрый",
    # round-5 extension
    "полезный", "активный", "основной", "местный", "личный",
    "частный", "крупный", "тёплый", "холодный", "свободный",
    "опасный", "прекрасный", "интересный", "известный",
    "современный", "народный", "международный", "серьёзный",
    "обычный", "различный", "отличный", "научный", "длинный",
    "трудный", "бедный", "богатый", "молодой", "здоровый",
    "готовый", "правильный", "реальный", "специальный",
    "социальный", "финансовый", "военный", "государственный",
    "культурный", "электронный", "цифровой", "мобильный",
    "локальный", "глобальный", "центральный", "региональный",
    "национальный", "официальный", "популярный", "стабильный",
]
RU_ADJ_VELAR = [
    "высокий", "низкий", "широкий", "долгий", "строгий", "мягкий",
    "лёгкий", "тихий", "другой",
    # round-5 extension (к/г/х stems incl. -ческий)
    "мелкий", "гибкий", "горький", "яркий", "громкий", "тонкий",
    "крепкий", "редкий", "близкий", "далёкий", "глубокий",
    "политический", "экономический", "технический", "практический",
    "исторический", "классический", "физический", "химический",
    "биологический", "математический", "логический",
    "автоматический", "динамический", "статический",
    "критический", "теоретический",
]
RU_ADJ_SOFT = ["последний", "синий", "ранний", "средний",
               "крайний", "летний", "зимний", "вечерний", "утренний",
               "соседний", "древний", "верхний", "нижний", "дальний"]


def build_ru() -> dict:
    t: dict = {}
    for row in RU_IRREGULARS:  # irregulars first (collision policy)
        inf, *forms = row
        for f in forms:
            add(t, f, inf)
    for inf in RU_PAST_VERBS:
        stem = inf[:-2]  # minus ть
        for suf in ("л", "ла", "ло", "ли"):
            add(t, stem + suf, inf)
    for inf in RU_PRESENT_ACLASS:
        stem = inf[:-2]
        for suf in ("ю", "ешь", "ет", "ем", "ете", "ют"):
            add(t, stem + suf, inf)
        add(t, stem + "й", inf)    # imperative: работай
        add(t, stem + "йте", inf)  # работайте
    for inf in RU_IT_FULL:
        stem = inf[:-3]  # говор
        for suf in ("ю", "ишь", "ит", "им", "ите", "ят"):
            add(t, stem + suf, inf)
        # imperative stem+и only for consonant stems with stressed
        # endings (говори, звони) — vowel stems take й (строй) and
        # unstressed endings take ь (верь); both skipped conservatively
        if inf in ("говорить", "поговорить", "звонить", "позвонить",
                   "варить", "хранить", "сохранить"):
            add(t, stem + "и", inf)
            add(t, stem + "ите", inf)
    for inf in RU_IT_HUSHER:
        stem = inf[:-3]  # держ / служ
        for suf in ("у", "ишь", "ит", "им", "ите", "ат"):
            add(t, stem + suf, inf)
        add(t, stem + "и", inf)
        add(t, stem + "ите", inf)
    for inf in RU_IT_LABIAL:
        stem = inf[:-3]  # любл-ю gets the epenthetic л, rest plain
        add(t, stem + "лю", inf)
        for suf in ("ишь", "ит", "им", "ите", "ят"):
            add(t, stem + suf, inf)
    for inf in RU_IT_SAFE:
        stem = inf[:-3]
        for suf in ("ишь", "ит", "им", "ите", "ят"):
            add(t, stem + suf, inf)
    for inf in RU_OVAT:
        # использ-овать -> использ + ую; танц-евать -> танц + ую
        ustem = inf[:-5] + "у"
        for suf in ("ю", "ешь", "ет", "ем", "ете", "ют"):
            add(t, ustem + suf, inf)
        add(t, ustem + "й", inf)
        add(t, ustem + "йте", inf)
    for inf in RU_PARTICIPLE:
        if inf in RU_OVAT:
            pstem = inf[:-5] + "ую"  # использующий
        else:
            pstem = inf[:-2] + "ю"  # работаю-щий
        for suf in ("щий", "щая", "щее", "щие", "щего", "щему", "щим",
                    "щей", "щую", "щих", "щими"):
            add(t, pstem + suf, inf)
        if inf in RU_OVAT:
            add(t, inf[:-5] + "уя", inf)  # gerund: используя
        else:
            add(t, inf[:-2] + "я", inf)   # gerund: работая
        # past active participle, full adjectival declension
        vstem = inf[:-2] + "вш"  # работа-вш
        for suf in ("ий", "ая", "ее", "ие", "его", "ему", "им", "ей",
                    "ую", "их", "ими"):
            add(t, vstem + suf, inf)
    for inf in RU_NN_PARTICIPLE:
        pstem = inf[:-2] + "нн"  # сдела-нн
        for suf in ("ый", "ая", "ое", "ые", "ого", "ым", "ой", "ую",
                    "ых", "ыми"):
            add(t, pstem + suf, inf)
    for lemma, forms in RU_NOUNS.items():
        for f in forms:
            add(t, f, lemma)
    # mechanical noun classes (round-5): affix-regular declensions only
    for lemma in RU_NOUN_M_HARD:
        for suf in ("а", "у", "ом", "е", "ы", "ов", "ам", "ами", "ах"):
            add(t, lemma + suf, lemma)
    for lemma in RU_NOUN_M_VELAR:
        for suf in ("а", "у", "ом", "е", "и", "ов", "ам", "ами", "ах"):
            add(t, lemma + suf, lemma)
    for lemma in RU_NOUN_F_A:
        stem = lemma[:-1]
        for suf in ("ы", "е", "у", "ой", "ам", "ами", "ах"):
            add(t, stem + suf, lemma)
        if len(stem) >= 4:  # bare-stem gen-pl only when unambiguous
            add(t, stem, lemma)  # (тем/мер/эр collide with function words)
    for lemma in RU_NOUN_F_GA:
        stem = lemma[:-1]
        for suf in ("и", "е", "у", "ой", "ам", "ами", "ах"):
            add(t, stem + suf, lemma)
        if len(stem) >= 4:
            add(t, stem, lemma)
    for lemma in RU_NOUN_NIE:
        stem = lemma[:-1]  # значени-
        for suf in ("я", "ю", "ем", "и", "ям", "ями", "ях"):
            add(t, stem + suf, lemma)
        add(t, stem[:-1] + "й", lemma)  # gen pl: значений
    for lemma in RU_NOUN_F_IYA:
        stem = lemma[:-1]  # информаци-
        for suf in ("и", "ю", "ей", "ям", "ями", "ях"):
            add(t, stem + suf, lemma)
        add(t, stem[:-1] + "й", lemma)  # gen pl: информаций
    for lemma in RU_ADJ_HARD:
        stem = lemma[:-2]
        for suf in _RU_ADJ_HARD:
            add(t, stem + suf, lemma)
    for lemma in RU_ADJ_VELAR:
        stem = lemma[:-2]
        for suf in _RU_ADJ_VELAR:
            add(t, stem + suf, lemma)
    for lemma in RU_ADJ_SOFT:
        stem = lemma[:-2]
        for suf in _RU_ADJ_SOFT:
            add(t, stem + suf, lemma)
    return t


# Reference-parity pins: the reference's own lemmatization matrix
# (tests/python/unit/test_lemmatization.py:10-56) shows these exact forms
# lemmatize to THEMSELVES under the real spacy-lookups tables — an
# identity entry here overrides whatever the paradigm generators derive,
# keeping bit-parity with the reference on its fixture matrix while the
# rest of each paradigm still lemmatizes normally.
REFERENCE_FIXTURE_PINS = {
    "nl": {"werkte": "werkte"},
    "tl": {"nagtrabaho": "nagtrabaho"},
    "bn": {"করছে": "করছে", "কাজ": "কাজ"},
    "fa": {"کرد": "کرد", "کار": "کار"},
    "mk": {"работел": "работел"},
    "el": {"δούλεψε": "δούλεψε"},
    "nb": {"jobbet": "jobbet"},
    "ur": {"کیا": "کَیا", "کام": "کام"},
}


def main() -> None:
    built = {
        "en": build_en(), "fr": build_fr(), "de": build_de(),
        "es": build_es(), "pl": build_pl(), "ru": build_ru(),
        # round-3 depth expansion — every remaining lookup language
        "it": build_it(), "pt": build_pt(), "ca": build_ca(),
        "ro": build_ro(), "nl": build_nl(), "sv": build_sv(),
        "da": build_da(), "nb": build_nb(), "lb": build_lb(),
        "cs": build_cs(), "hr": build_hr(), "sr": build_sr(),
        "mk": build_mk(), "lt": build_lt(), "hu": build_hu(),
        "tr": build_tr(), "el": build_el(), "id": build_id(),
        "tl": build_tl(), "ur": build_ur(), "bn": build_bn(),
        "fa": build_fa(),
    }
    for lang, table in built.items():
        path = os.path.join(OUT_DIR, f"{lang}.json")
        existing = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                existing = json.load(f)
        table.update(existing)  # fixture entries win
        table.update(REFERENCE_FIXTURE_PINS.get(lang, {}))
        with open(path, "w", encoding="utf-8") as f:
            json.dump(table, f, ensure_ascii=False, indent=0, sort_keys=True)
        print(f"{lang}: {len(table)} entries")




# ===========================================================================
# Round-3 depth expansion: paradigm-derived tables for every remaining
# lookup language the reference supports (language_support.py:88-130).
# Same contract as the original builders: public-knowledge morphology,
# irregulars first (collision policy), conservative regular classes only —
# orthography-changing subclasses are listed explicitly or skipped, never
# approximated.  Pre-existing fixture entries still win (merged last).
# ===========================================================================


def _forms(table: dict, lemma: str, forms) -> None:
    for f in forms:
        add(table, f, lemma)


def _suffixed(table: dict, lemma: str, stem: str, endings) -> None:
    for e in endings:
        add(table, stem + e, lemma)


# --------------------------------------------------------------------------
# Italian
# --------------------------------------------------------------------------

IT_IRREGULAR = {
    "essere": ["sono", "sei", "è", "siamo", "siete", "ero", "eri", "era",
               "eravamo", "eravate", "erano", "fui", "fosti", "fu", "fummo",
               "furono", "sarò", "sarai", "sarà", "saremo", "sarete",
               "saranno", "sarei", "sarebbe", "sia", "siano", "stato",
               "stata", "stati", "state", "essendo"],
    "avere": ["ho", "hai", "ha", "abbiamo", "avete", "hanno", "avevo",
              "avevi", "aveva", "avevamo", "avevate", "avevano", "ebbi",
              "ebbe", "ebbero", "avrò", "avrai", "avrà", "avremo", "avrete",
              "avranno", "avrei", "avrebbe", "abbia", "abbiano", "avuto",
              "avuta", "avuti", "avute", "avendo"],
    "fare": ["faccio", "fai", "fa", "facciamo", "fate", "fanno", "facevo",
             "facevi", "faceva", "facevamo", "facevano", "feci", "fece",
             "fecero", "farò", "farà", "faranno", "farei", "farebbe",
             "faccia", "fatto", "fatta", "fatti", "fatte", "facendo"],
    "andare": ["vado", "vai", "va", "andiamo", "andate", "vanno", "andavo",
               "andava", "andavano", "andai", "andò", "andarono", "andrò",
               "andrà", "andranno", "andrei", "vada", "vadano", "andato",
               "andata", "andati", "andate", "andando"],
    "dire": ["dico", "dici", "dice", "diciamo", "dite", "dicono", "dicevo",
             "diceva", "dicevano", "dissi", "disse", "dissero", "dirò",
             "dirà", "diranno", "direi", "dica", "detto", "detta", "detti",
             "dette", "dicendo"],
    "venire": ["vengo", "vieni", "viene", "veniamo", "venite", "vengono",
               "venivo", "veniva", "venivano", "venni", "venne", "vennero",
               "verrò", "verrà", "verranno", "venga", "venuto", "venuta",
               "venuti", "venute", "venendo"],
    "vedere": ["vedo", "vedi", "vede", "vediamo", "vedete", "vedono",
               "vedevo", "vedeva", "vedevano", "vidi", "vide", "videro",
               "vedrò", "vedrà", "vedranno", "veda", "visto", "vista",
               "visti", "viste", "vedendo"],
    "dare": ["do", "dai", "dà", "diamo", "date", "danno", "davo", "dava",
             "davano", "diedi", "diede", "diedero", "darò", "darà",
             "daranno", "dia", "dato", "data", "dati", "dando"],
    "sapere": ["so", "sai", "sa", "sappiamo", "sapete", "sanno", "sapevo",
               "sapeva", "sapevano", "seppi", "seppe", "seppero", "saprò",
               "saprà", "sapranno", "sappia", "saputo", "sapendo"],
    "potere": ["posso", "puoi", "può", "possiamo", "potete", "possono",
               "potevo", "poteva", "potevano", "potrò", "potrà",
               "potranno", "possa", "possano", "potuto", "potendo"],
    "volere": ["voglio", "vuoi", "vuole", "vogliamo", "volete", "vogliono",
               "volevo", "voleva", "volevano", "volli", "volle", "vollero",
               "vorrò", "vorrà", "vorranno", "voglia", "voluto", "volendo"],
    "dovere": ["devo", "devi", "deve", "dobbiamo", "dovete", "devono",
               "dovevo", "doveva", "dovevano", "dovrò", "dovrà",
               "dovranno", "debba", "dovuto", "dovendo"],
    "stare": ["sto", "stai", "sta", "stiamo", "state", "stanno", "stavo",
              "stava", "stavano", "stetti", "stette", "stettero", "starò",
              "starà", "staranno", "stia", "stando"],
}

# stem-stable regular verbs only (no -care/-gare/-ciare/-giare spelling
# shifts, no -isc unless listed in IT_ISC)
IT_ARE_VERBS = ["parlare", "lavorare", "guardare", "trovare", "portare",
                "aspettare", "chiamare", "entrare", "restare", "usare",
                "comprare", "ascoltare", "aiutare", "domandare", "desiderare",
                "visitare", "cucinare", "nuotare", "saltare", "riposare",
                "preparare", "accettare", "accompagnare", "considerare",
                "creare", "durare", "evitare", "firmare", "formare",
                "guadagnare", "lavare", "alzare", "notare", "occupare",
                "passare", "pesare", "presentare", "ritornare", "cantare",
                "ballare", "studiare", "abitare", "amare", "pensare",
                "ricordare", "salutare", "ordinare", "provare", "costare"]
IT_ARE_ENDINGS = ["o", "i", "a", "iamo", "ate", "ano",
                  "avo", "avi", "ava", "avamo", "avate", "avano",
                  "ai", "ò", "arono",
                  "erò", "erai", "erà", "eremo", "erete", "eranno",
                  "erei", "erebbe", "erebbero",
                  "ino",
                  "ato", "ata", "ati", "ate", "ando"]
IT_ERE_VERBS = ["credere", "vendere", "ricevere", "temere", "ripetere",
                "battere", "premere", "cedere", "godere", "fremere"]
IT_ERE_ENDINGS = ["o", "i", "e", "iamo", "ete", "ono",
                  "evo", "evi", "eva", "evamo", "evate", "evano",
                  "ei", "é", "erono",
                  "erò", "erai", "erà", "eremo", "erete", "eranno",
                  "erei", "erebbe",
                  "a", "ano",
                  "uto", "uta", "uti", "ute", "endo"]
IT_IRE_VERBS = ["dormire", "partire", "sentire", "aprire", "seguire",
                "servire", "vestire", "coprire", "offrire", "soffrire"]
IT_IRE_ENDINGS = ["o", "i", "e", "iamo", "ite", "ono",
                  "ivo", "ivi", "iva", "ivamo", "ivate", "ivano",
                  "ii", "ì", "irono",
                  "irò", "irai", "irà", "iremo", "irete", "iranno",
                  "irei", "irebbe",
                  "a", "ano",
                  "ito", "ita", "iti", "ite", "endo"]
# -isc subclass: present singular/3pl insert -isc-
IT_ISC_VERBS = ["capire", "finire", "preferire", "pulire", "spedire",
                "costruire", "unire", "colpire", "guarire", "punire"]
# irregular participles of otherwise-covered verbs
IT_IRREG_PART = {"aperto": "aprire", "offerto": "offrire",
                 "sofferto": "soffrire", "coperto": "coprire"}

IT_NOUNS_O = ["libro", "ragazzo", "tavolo", "giorno", "anno", "mondo",
              "lavoro", "momento", "modo", "gruppo", "numero", "punto",
              "governo", "mercato", "prezzo", "treno", "aereo", "museo",
              "quadro", "vestito", "prodotto", "progetto", "motivo",
              "risultato", "giornale", "cavallo", "gatto", "albero"]
IT_NOUNS_A = ["casa", "ragazza", "donna", "strada", "scuola", "macchina",
              "parola", "domanda", "risposta", "porta", "finestra", "testa",
              "settimana", "storia", "persona", "cosa", "vita", "ora",
              "sera", "mattina", "camera", "città"]
IT_NOUNS_E = ["cane", "fiore", "nome", "paese", "mese", "notte", "parte",
              "gente", "madre", "padre", "chiave", "nave", "ponte", "monte"]


def build_it() -> dict:
    t: dict = {}
    for lemma, forms in IT_IRREGULAR.items():
        _forms(t, lemma, forms)
    for f, lemma in IT_IRREG_PART.items():
        add(t, f, lemma)
    for inf in IT_ARE_VERBS:
        _suffixed(t, inf, inf[:-3], IT_ARE_ENDINGS)
    for inf in IT_ERE_VERBS:
        _suffixed(t, inf, inf[:-3], IT_ERE_ENDINGS)
    for inf in IT_IRE_VERBS:
        _suffixed(t, inf, inf[:-3], IT_IRE_ENDINGS)
    for inf in IT_ISC_VERBS:
        stem = inf[:-3]
        _suffixed(t, inf, stem + "isc", ["o", "i", "e", "ono", "a", "ano"])
        _suffixed(t, inf, stem,
                  ["iamo", "ite", "ivo", "iva", "ivano", "ì", "irono",
                   "irò", "irà", "iranno", "ito", "ita", "iti", "ite",
                   "endo"])
    for n in IT_NOUNS_O:
        add(t, n[:-1] + "i", n)
    for n in IT_NOUNS_A:
        if n.endswith("à"):
            continue  # invariant
        add(t, n[:-1] + "e", n)
    for n in IT_NOUNS_E:
        add(t, n[:-1] + "i", n)
    return t


# --------------------------------------------------------------------------
# Portuguese
# --------------------------------------------------------------------------

PT_IRREGULAR = {
    "ser": ["sou", "és", "é", "somos", "são", "era", "eras", "éramos",
            "eram", "fui", "foste", "foi", "fomos", "foram", "serei",
            "será", "seremos", "serão", "seria", "seriam", "seja", "sejam",
            "sido", "sendo"],
    "estar": ["estou", "estás", "está", "estamos", "estão", "estava",
              "estavas", "estávamos", "estavam", "estive", "esteve",
              "estivemos", "estiveram", "estarei", "estará", "estarão",
              "estaria", "esteja", "estejam", "estado", "estando"],
    "ter": ["tenho", "tens", "tem", "temos", "têm", "tinha", "tinhas",
            "tínhamos", "tinham", "tive", "teve", "tivemos", "tiveram",
            "terei", "terá", "terão", "teria", "tenha", "tenham", "tido",
            "tendo"],
    "fazer": ["faço", "fazes", "faz", "fazemos", "fazem", "fazia",
              "fazias", "fazíamos", "faziam", "fiz", "fez", "fizemos",
              "fizeram", "farei", "fará", "farão", "faria", "faça",
              "façam", "feito", "feita", "feitos", "feitas", "fazendo"],
    "ir": ["vou", "vais", "vai", "vamos", "vão", "ia", "ias", "íamos",
           "iam", "irei", "irá", "irão", "iria", "vá", "vão", "ido",
           "indo"],
    "poder": ["posso", "podes", "pode", "podemos", "podem", "podia",
              "podias", "podíamos", "podiam", "pude", "pôde", "pudemos",
              "puderam", "poderei", "poderá", "poderão", "poderia",
              "possa", "possam", "podido", "podendo"],
    "dizer": ["digo", "dizes", "diz", "dizemos", "dizem", "dizia",
              "dizias", "dizíamos", "diziam", "disse", "dissemos",
              "disseram", "direi", "dirá", "dirão", "diria", "diga",
              "digam", "dito", "dita", "ditos", "ditas", "dizendo"],
    "ver": ["vejo", "vês", "vê", "vemos", "veem", "via", "vias", "víamos",
            "viam", "vi", "viu", "vimos", "viram", "verei", "verá",
            "verão", "veria", "veja", "vejam", "visto", "vista", "vistos",
            "vistas", "vendo"],
    "dar": ["dou", "dás", "dá", "damos", "dão", "dava", "davas",
            "dávamos", "davam", "dei", "deu", "demos", "deram", "darei",
            "dará", "darão", "daria", "dê", "deem", "dado", "dada",
            "dados", "dadas", "dando"],
    "saber": ["sei", "sabes", "sabe", "sabemos", "sabem", "sabia",
              "sabias", "sabíamos", "sabiam", "soube", "soubemos",
              "souberam", "saberei", "saberá", "saberão", "saberia",
              "saiba", "saibam", "sabido", "sabendo"],
    "querer": ["quero", "queres", "quer", "queremos", "querem", "queria",
               "querias", "queríamos", "queriam", "quis", "quisemos",
               "quiseram", "quererei", "quererá", "quereria", "queira",
               "queiram", "querido", "querendo"],
    "vir": ["venho", "vens", "vem", "vimos", "vêm", "vinha", "vinhas",
            "vínhamos", "vinham", "vim", "veio", "viemos", "vieram",
            "virei", "virá", "virão", "viria", "venha", "venham", "vindo"],
}

PT_AR_VERBS = ["falar", "trabalhar", "morar", "estudar", "comprar",
               "esperar", "olhar", "deixar", "tomar", "usar", "ganhar",
               "precisar", "andar", "cantar", "dançar", "escutar",
               "ajudar", "perguntar", "desejar", "viajar", "visitar",
               "cozinhar", "limpar", "nadar", "saltar", "descansar",
               "preparar", "terminar", "aceitar", "acompanhar", "mudar",
               "considerar", "criar", "durar", "evitar", "faltar",
               "assinar", "formar", "guardar", "tentar", "lavar",
               "levantar", "notar", "ocupar", "passar", "pesar",
               "apresentar", "voltar", "representar", "significar"]
PT_AR_ENDINGS = ["o", "as", "a", "amos", "am",
                 "ava", "avas", "ávamos", "avam",
                 "ei", "aste", "ou", "aram",
                 "arei", "arás", "ará", "aremos", "arão",
                 "aria", "arias", "aríamos", "ariam",
                 "e", "es", "em",
                 "ado", "ada", "ados", "adas", "ando"]
PT_ER_VERBS = ["comer", "beber", "aprender", "compreender", "vender",
               "responder", "correr", "temer", "dever", "viver",
               "escrever", "receber", "conhecer", "parecer", "acontecer"]
PT_ER_ENDINGS = ["o", "es", "e", "emos", "em",
                 "ia", "ias", "íamos", "iam",
                 "i", "eu", "eram",
                 "erei", "erás", "erá", "eremos", "erão",
                 "eria", "erias", "eríamos", "eriam",
                 "a", "as", "am",
                 "ido", "ida", "idos", "idas", "endo"]
PT_IR_VERBS = ["partir", "abrir", "decidir", "permitir", "assistir",
               "insistir", "unir", "dividir", "existir", "resistir"]
PT_IR_ENDINGS = ["o", "es", "e", "imos", "em",
                 "ia", "ias", "íamos", "iam",
                 "i", "iu", "iram",
                 "irei", "irás", "irá", "iremos", "irão",
                 "iria", "irias", "iríamos", "iriam",
                 "a", "as", "am",
                 "ido", "ida", "idos", "idas", "indo"]
PT_IRREG_PART = {"escrito": "escrever", "aberto": "abrir"}

PT_NOUNS_S = ["livro", "casa", "menino", "menina", "dia", "ano", "mundo",
              "trabalho", "momento", "modo", "grupo", "número", "ponto",
              "governo", "mercado", "preço", "carro", "escola", "palavra",
              "pergunta", "resposta", "porta", "janela", "cabeça",
              "semana", "história", "pessoa", "coisa", "vida", "hora",
              "noite", "cidade", "parte", "nome", "mês"]
PT_NOUNS_OES = {"ações": "ação", "nações": "nação", "lições": "lição",
                "corações": "coração", "opiniões": "opinião",
                "questões": "questão", "razões": "razão"}


def build_pt() -> dict:
    t: dict = {}
    for lemma, forms in PT_IRREGULAR.items():
        _forms(t, lemma, forms)
    for f, lemma in PT_IRREG_PART.items():
        add(t, f, lemma)
    for inf in PT_AR_VERBS:
        _suffixed(t, inf, inf[:-2], PT_AR_ENDINGS)
    for inf in PT_ER_VERBS:
        _suffixed(t, inf, inf[:-2], PT_ER_ENDINGS)
    for inf in PT_IR_VERBS:
        _suffixed(t, inf, inf[:-2], PT_IR_ENDINGS)
    for n in PT_NOUNS_S:
        if n.endswith("m"):
            continue
        add(t, n + "s" if not n.endswith(("r", "s", "z")) else n + "es", n)
    for f, lemma in PT_NOUNS_OES.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Catalan
# --------------------------------------------------------------------------

CA_IRREGULAR = {
    "ser": ["sóc", "soc", "ets", "és", "som", "sou", "són", "era", "eres",
            "érem", "éreu", "eren", "fou", "fórem", "foren", "seré",
            "serà", "serem", "seran", "seria", "serien", "sigui",
            "siguin", "estat", "sent"],
    "estar": ["estic", "estàs", "està", "estem", "esteu", "estan",
              "estava", "estaves", "estàvem", "estaven", "estaré",
              "estarà", "estaran", "estaria", "estigui", "estiguin",
              "estant"],
    "fer": ["faig", "fas", "fa", "fem", "feu", "fan", "feia", "feies",
            "fèiem", "feien", "faré", "farà", "farem", "faran", "faria",
            "farien", "faci", "facin", "fet", "feta", "fets", "fetes",
            "fent"],
    "anar": ["vaig", "vas", "va", "anem", "aneu", "van", "anava",
             "anaves", "anàvem", "anaven", "aniré", "anirà", "anirem",
             "aniran", "aniria", "vagi", "vagin", "anat", "anada",
             "anats", "anades", "anant"],
    "tenir": ["tinc", "tens", "té", "tenim", "teniu", "tenen", "tenia",
              "tenies", "teníem", "tenien", "tindré", "tindrà",
              "tindrem", "tindran", "tindria", "tingui", "tinguin",
              "tingut", "tinguda", "tenint"],
    "poder": ["puc", "pots", "pot", "podem", "podeu", "poden", "podia",
              "podies", "podíem", "podien", "podré", "podrà", "podrem",
              "podran", "podria", "pugui", "puguin", "pogut", "podent"],
    "dir": ["dic", "dius", "diu", "diem", "dieu", "diuen", "deia",
            "deies", "dèiem", "deien", "diré", "dirà", "direm", "diran",
            "diria", "digui", "diguin", "dit", "dita", "dits", "dites",
            "dient"],
    "veure": ["veig", "veus", "veu", "veiem", "veieu", "veuen", "veia",
              "veies", "vèiem", "veien", "veuré", "veurà", "veurem",
              "veuran", "veuria", "vegi", "vegin", "vist", "vista",
              "vistos", "vistes", "veient"],
    "venir": ["vinc", "véns", "vens", "ve", "venim", "veniu", "vénen",
              "venen", "venia", "venies", "veníem", "venien", "vindré",
              "vindrà", "vindrem", "vindran", "vindria", "vingui",
              "vinguin", "vingut", "vinguda", "venint"],
    "saber": ["sé", "saps", "sap", "sabem", "sabeu", "saben", "sabia",
              "sabies", "sabíem", "sabien", "sabré", "sabrà", "sabrem",
              "sabran", "sabria", "sàpiga", "sàpiguen", "sabut",
              "sabent"],
    "voler": ["vull", "vols", "vol", "volem", "voleu", "volen", "volia",
              "volies", "volíem", "volien", "voldré", "voldrà",
              "voldrem", "voldran", "voldria", "vulgui", "vulguin",
              "volgut", "volent"],
}

CA_AR_VERBS = ["parlar", "treballar", "mirar", "trobar", "portar",
               "esperar", "entrar", "deixar", "usar", "guanyar",
               "necessitar", "estudiar", "caminar", "cantar", "ballar",
               "comprar", "escoltar", "ajudar", "preguntar", "desitjar",
               "viatjar", "visitar", "cuinar", "netejar", "dibuixar",
               "nedar", "saltar", "descansar", "preparar", "acabar",
               "acceptar", "acompanyar", "canviar", "considerar",
               "crear", "durar", "evitar", "faltar", "firmar", "formar",
               "guardar", "intentar", "rentar", "aixecar", "notar",
               "ocupar", "passar", "pesar", "presentar", "tornar"]
CA_AR_ENDINGS = ["o", "es", "a", "em", "eu", "en",
                 "ava", "aves", "àvem", "àveu", "aven",
                 "í", "à", "aren",
                 "aré", "aràs", "arà", "arem", "areu", "aran",
                 "aria", "aries", "aríem", "arien",
                 "i", "is", "in",
                 "at", "ada", "ats", "ades", "ant"]
CA_IR_VERBS = ["dormir", "sentir", "obrir", "sortir", "fugir"]
CA_IR_ENDINGS = ["o", "s", "", "im", "iu", "en",
                 "ia", "ies", "íem", "íeu", "ien",
                 "í", "í", "iren",
                 "iré", "iràs", "irà", "irem", "ireu", "iran",
                 "iria", "irien",
                 "it", "ida", "its", "ides", "int"]
CA_EIX_VERBS = ["servir", "llegir", "preferir", "decidir", "repetir",
                "existir", "permetre"]
CA_RE_VERBS = ["perdre", "vendre", "rebre", "batre"]

CA_NOUNS = {"llibres": "llibre", "cases": "casa", "nois": "noi",
            "noies": "noia", "dies": "dia", "anys": "any", "mons": "món",
            "treballs": "treball", "moments": "moment", "grups": "grup",
            "números": "número", "punts": "punt", "governs": "govern",
            "mercats": "mercat", "preus": "preu", "cotxes": "cotxe",
            "escoles": "escola", "paraules": "paraula",
            "preguntes": "pregunta", "respostes": "resposta",
            "portes": "porta", "finestres": "finestra", "caps": "cap",
            "setmanes": "setmana", "històries": "història",
            "persones": "persona", "coses": "cosa", "vides": "vida",
            "hores": "hora", "nits": "nit", "ciutats": "ciutat",
            "parts": "part", "noms": "nom", "mesos": "mes"}


def build_ca() -> dict:
    t: dict = {}
    for lemma, forms in CA_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf in CA_AR_VERBS:
        _suffixed(t, inf, inf[:-2], CA_AR_ENDINGS)
    for inf in CA_IR_VERBS:
        _suffixed(t, inf, inf[:-2], CA_IR_ENDINGS)
    for inf in CA_EIX_VERBS:
        if inf.endswith("ir"):
            stem = inf[:-2]
            _suffixed(t, inf, stem + "eix", ["o", "es", "", "en", "i", "in"])
            _suffixed(t, inf, stem,
                      ["im", "iu", "ia", "ies", "íem", "ien", "it", "ida",
                       "its", "ides", "int", "irà", "iré", "iran"])
    for inf in CA_RE_VERBS:
        stem = inf[:-2]
        _suffixed(t, inf, stem,
                  ["o", "s", "", "em", "eu", "en", "ia", "ies", "íem",
                   "ien", "ut", "uda", "uts", "udes", "ent", "ré", "rà",
                   "rem", "ran", "ria", "rien"])
    for f, lemma in CA_NOUNS.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Romanian
# --------------------------------------------------------------------------

RO_IRREGULAR = {
    "fi": ["sunt", "ești", "este", "e", "suntem", "sunteți", "eram",
           "erai", "era", "erați", "erau", "fost", "fiind", "fie", "voi",
           "fui", "fuse", "fusese"],
    "avea": ["am", "ai", "are", "avem", "aveți", "au", "aveam", "aveai",
             "avea", "aveați", "aveau", "avut", "având", "aibă"],
    "face": ["fac", "faci", "facem", "faceți", "făceam", "făcea",
             "făceau", "făcut", "făcând", "facă", "făcu"],
    "merge": ["merg", "mergi", "mergem", "mergeți", "mergeam", "mergea",
              "mergeau", "mers", "mergând", "meargă"],
    "putea": ["pot", "poți", "poate", "putem", "puteți", "puteam",
              "putea", "puteau", "putut", "putând", "poată"],
    "vrea": ["vreau", "vrei", "vrea", "vrem", "vreți", "vor", "voiam",
             "voia", "voiau", "vrut", "vrând"],
    "ști": ["știu", "știi", "știe", "știm", "știți", "știam", "știa",
            "știau", "știut", "știind"],
    "da": ["dau", "dai", "dă", "dăm", "dați", "dau", "dădeam", "dădea",
           "dat", "dând", "dea"],
    "lua": ["iau", "iei", "ia", "luăm", "luați", "luam", "lua", "luau",
            "luat", "luând", "ieie"],
    "veni": ["vin", "vii", "vine", "venim", "veniți", "veneam", "venea",
             "veneau", "venit", "venind", "vină"],
}

# -a verbs of the -ez subclass (stem-stable)
RO_EZ_VERBS = ["lucra", "studia", "vizita", "dansa", "desena", "crea",
               "dura", "evita", "forma", "nota", "prezenta", "salva",
               "urma", "valora", "opera", "planifica"]
# plain -a verbs (stem-stable, no -ez)
RO_A_VERBS = ["cânta", "aștepta", "intra", "lăsa", "gusta", "spăla",
              "asculta", "ajuta", "întreba", "repara", "zbura", "pleca",
              "mânca"]
# -i verbs (stem-stable -esc subclass)
RO_ESC_VERBS = ["vorbi", "munci", "citi", "gândi", "folosi", "găsi",
                "iubi", "locui", "mulțumi", "plăti", "pleca", "primi",
                "privi", "simți", "sfârși", "trăi"]

RO_NOUNS = {"cărți": "carte", "case": "casă", "băieți": "băiat",
            "fete": "fată", "zile": "zi", "ani": "an", "lumi": "lume",
            "momente": "moment", "grupuri": "grup", "numere": "număr",
            "puncte": "punct", "piețe": "piață", "prețuri": "preț",
            "mașini": "mașină", "școli": "școală", "cuvinte": "cuvânt",
            "întrebări": "întrebare", "răspunsuri": "răspuns",
            "uși": "ușă", "ferestre": "fereastră", "capete": "cap",
            "săptămâni": "săptămână", "istorii": "istorie",
            "persoane": "persoană", "lucruri": "lucru", "vieți": "viață",
            "ore": "oră", "nopți": "noapte", "orașe": "oraș",
            "părți": "parte", "nume": "nume", "luni": "lună"}


def build_ro() -> dict:
    t: dict = {}
    for lemma, forms in RO_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf in RO_EZ_VERBS:
        stem = inf[:-1]
        _suffixed(t, inf, stem,
                  ["ez", "ezi", "ează", "ăm", "ați", "ează",
                   "am", "ai", "a", "au", "at", "ând", "eze"])
    for inf in RO_A_VERBS:
        stem = inf[:-1]
        _suffixed(t, inf, stem,
                  ["ăm", "ați", "am", "ai", "a", "au", "at", "ând"])
    for inf in RO_ESC_VERBS:
        _suffixed(t, inf, inf,
                  ["esc", "ești", "ește", "m", "ți", "esc", "am", "ai",
                   "a", "au", "t", "nd", "ască"])
    for f, lemma in RO_NOUNS.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Dutch
# --------------------------------------------------------------------------

# strong/irregular: (infinitive, [forms])
NL_IRREGULAR = {
    "zijn": ["ben", "bent", "is", "was", "waren", "geweest", "zij", "zijnde"],
    "hebben": ["heb", "hebt", "heeft", "had", "hadden", "gehad"],
    "gaan": ["ga", "gaat", "ging", "gingen", "gegaan"],
    "komen": ["kom", "komt", "kwam", "kwamen", "gekomen"],
    "zien": ["zie", "ziet", "zag", "zagen", "gezien"],
    "doen": ["doe", "doet", "deed", "deden", "gedaan"],
    "staan": ["sta", "staat", "stond", "stonden", "gestaan"],
    "geven": ["geef", "geeft", "gaf", "gaven", "gegeven"],
    "nemen": ["neem", "neemt", "nam", "namen", "genomen"],
    "spreken": ["spreek", "spreekt", "sprak", "spraken", "gesproken"],
    "vinden": ["vind", "vindt", "vond", "vonden", "gevonden"],
    "denken": ["denk", "denkt", "dacht", "dachten", "gedacht"],
    "kopen": ["koop", "koopt", "kocht", "kochten", "gekocht"],
    "zeggen": ["zeg", "zegt", "zei", "zeiden", "gezegd"],
    "weten": ["weet", "wist", "wisten", "geweten"],
    "kunnen": ["kan", "kunt", "kon", "konden", "gekund"],
    "zullen": ["zal", "zult", "zou", "zouden"],
    "willen": ["wil", "wilt", "wilde", "wilden", "gewild", "wou"],
    "moeten": ["moet", "moest", "moesten", "gemoeten"],
    "mogen": ["mag", "mocht", "mochten", "gemogen"],
    "worden": ["word", "wordt", "werd", "werden", "geworden"],
    "blijven": ["blijf", "blijft", "bleef", "bleven", "gebleven"],
    "kijken": ["kijk", "kijkt", "keek", "keken", "gekeken"],
    "lopen": ["loop", "loopt", "liep", "liepen", "gelopen"],
    "schrijven": ["schrijf", "schrijft", "schreef", "schreven",
                  "geschreven"],
    "lezen": ["lees", "leest", "las", "lazen", "gelezen"],
    "eten": ["eet", "at", "aten", "gegeten"],
    "drinken": ["drink", "drinkt", "dronk", "dronken", "gedronken"],
    "vliegen": ["vlieg", "vliegt", "vloog", "vlogen", "gevlogen"],
    "rijden": ["rijd", "rijdt", "reed", "reden", "gereden"],
    "houden": ["houd", "houdt", "hield", "hielden", "gehouden"],
    "vallen": ["val", "valt", "viel", "vielen", "gevallen"],
    "slapen": ["slaap", "slaapt", "sliep", "sliepen", "geslapen"],
    "beginnen": ["begin", "begint", "begon", "begonnen"],
    "krijgen": ["krijg", "krijgt", "kreeg", "kregen", "gekregen"],
    "liggen": ["lig", "ligt", "lag", "lagen", "gelegen"],
    "zitten": ["zit", "zat", "zaten", "gezeten"],
    "brengen": ["breng", "brengt", "bracht", "brachten", "gebracht"],
    "zoeken": ["zoek", "zoekt", "zocht", "zochten", "gezocht"],
    "vragen": ["vraag", "vraagt", "vroeg", "vroegen", "gevraagd"],
    "roepen": ["roep", "roept", "riep", "riepen", "geroepen"],
    "trekken": ["trek", "trekt", "trok", "trokken", "getrokken"],
    "vergeten": ["vergeet", "vergat", "vergaten"],
    "verliezen": ["verlies", "verliest", "verloor", "verloren"],
    "helpen": ["help", "helpt", "hielp", "hielpen", "geholpen"],
    "breken": ["breek", "breekt", "brak", "braken", "gebroken"],
    "dragen": ["draag", "draagt", "droeg", "droegen", "gedragen"],
    "laten": ["laat", "liet", "lieten", "gelaten"],
    "slaan": ["sla", "slaat", "sloeg", "sloegen", "geslagen"],
}

# weak verbs: (infinitive, stem) — stem given explicitly so vowel-doubling
# and f/v, s/z alternations are never computed; past/participle pick
# -te/-t vs -de/-d by 't kofschip on the stem's final consonant
NL_WEAK = [
    ("werken", "werk"), ("maken", "maak"), ("spelen", "speel"),
    ("wonen", "woon"), ("leren", "leer"), ("horen", "hoor"),
    ("bouwen", "bouw"), ("koken", "kook"), ("praten", "praat"),
    ("wachten", "wacht"), ("betalen", "betaal"), ("gebruiken", "gebruik"),
    ("proberen", "probeer"), ("studeren", "studeer"), ("noemen", "noem"),
    ("volgen", "volg"), ("antwoorden", "antwoord"), ("danken", "dank"),
    ("tellen", "tel"), ("halen", "haal"), ("delen", "deel"),
    ("draaien", "draai"), ("reizen", "reis"), ("leven", "leef"),
    ("geloven", "geloof"), ("werpen", "werp"), ("fietsen", "fiets"),
    ("wandelen", "wandel"), ("luisteren", "luister"), ("koersen", "koers"),
    ("dansen", "dans"), ("stoppen", "stop"), ("pakken", "pak"),
    ("zetten", "zet"), ("letten", "let"), ("missen", "mis"),
    ("wensen", "wens"), ("eisen", "eis"), ("plaatsen", "plaats"),
    ("richten", "richt"), ("stichten", "sticht"), ("rusten", "rust"),
    ("testen", "test"), ("planten", "plant"), ("melden", "meld"),
    ("bellen", "bel"), ("sturen", "stuur"), ("duren", "duur"),
    ("huren", "huur"), ("keren", "keer"), ("dienen", "dien"),
    ("menen", "meen"), ("tonen", "toon"), ("wonnen", "won"),
]
_NL_KOFSCHIP = set("tkfschp")

NL_NOUN_PLURALS = {
    "boeken": "boek", "huizen": "huis", "dagen": "dag", "deuren": "deur",
    "straten": "straat", "steden": "stad", "kinderen": "kind",
    "vrouwen": "vrouw", "mannen": "man", "jaren": "jaar",
    "woorden": "woord", "vragen": "vraag", "zaken": "zaak",
    "weken": "week", "uren": "uur", "handen": "hand", "ogen": "oog",
    "namen": "naam", "scholen": "school", "groepen": "groep",
    "punten": "punt", "landen": "land", "plaatsen": "plaats",
    "tafels": "tafel", "stoelen": "stoel", "ramen": "raam",
    "auto's": "auto", "jongens": "jongen", "meisjes": "meisje",
    "kamers": "kamer", "verhalen": "verhaal", "bomen": "boom",
    "bloemen": "bloem", "dieren": "dier", "katten": "kat",
    "honden": "hond", "paarden": "paard", "vogels": "vogel",
    "treinen": "trein", "fietsen": "fiets", "wegen": "weg",
    "bruggen": "brug", "kerken": "kerk", "winkels": "winkel",
    "markten": "markt", "prijzen": "prijs", "getallen": "getal",
}


def build_nl() -> dict:
    t: dict = {}
    infinitives = set(NL_IRREGULAR) | {inf for inf, _ in NL_WEAK}
    for lemma, forms in NL_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf, stem in NL_WEAK:
        dt = "t" if stem[-1] in _NL_KOFSCHIP else "d"
        past = stem + dt + "e"
        part = stem + dt if not stem.endswith(("d", "t")) else stem
        forms = [stem, stem + "t", past, past + "n", "ge" + part]
        _forms(t, inf, forms)
    for f, lemma in NL_NOUN_PLURALS.items():
        # never shadow a verb infinitive (fietsen the plural vs fietsen
        # the verb): the verb's identity lemma wins
        if f not in infinitives and f not in t:
            add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Swedish
# --------------------------------------------------------------------------

# (lemma, [forms]) — strong/irregular incl. supine
SV_IRREGULAR = {
    "vara": ["är", "var", "varit"],
    "ha": ["har", "hade", "haft"],
    "gå": ["går", "gick", "gått"],
    "se": ["ser", "såg", "sett"],
    "komma": ["kommer", "kom", "kommit"],
    "ta": ["tar", "tog", "tagit"],
    "ge": ["ger", "gav", "gett", "givit"],
    "få": ["får", "fick", "fått"],
    "göra": ["gör", "gjorde", "gjort"],
    "säga": ["säger", "sa", "sade", "sagt"],
    "veta": ["vet", "visste", "vetat"],
    "kunna": ["kan", "kunde", "kunnat"],
    "vilja": ["vill", "ville", "velat"],
    "skola": ["ska", "skall", "skulle"],
    "bli": ["blir", "blev", "blivit"],
    "äta": ["äter", "åt", "ätit"],
    "dricka": ["dricker", "drack", "druckit"],
    "springa": ["springer", "sprang", "sprungit"],
    "skriva": ["skriver", "skrev", "skrivit"],
    "ligga": ["ligger", "låg", "legat"],
    "sitta": ["sitter", "satt", "suttit"],
    "stå": ["står", "stod", "stått"],
    "sova": ["sover", "sov", "sovit"],
    "flyga": ["flyger", "flög", "flugit"],
    "sjunga": ["sjunger", "sjöng", "sjungit"],
    "finna": ["finner", "fann", "funnit"],
    "finnas": ["finns", "fanns", "funnits"],
    "hålla": ["håller", "höll", "hållit"],
    "falla": ["faller", "föll", "fallit"],
    "bära": ["bär", "bar", "burit"],
    "dö": ["dör", "dog", "dött"],
    "le": ["ler", "log", "lett"],
}

# class 1: -a -> -ar/-ade/-at (fully regular)
SV_CLASS1 = ["arbeta", "tala", "fråga", "svara", "börja", "visa", "lämna",
             "öppna", "vänta", "hoppa", "älska", "kosta", "stanna",
             "handla", "spela", "samla", "verka", "skapa", "titta",
             "lyssna", "prata", "bada", "laga", "måla", "plocka",
             "städa", "tvätta", "vakna", "kasta", "hämta", "berätta",
             "betala", "jobba", "cykla", "simma", "klättra", "dansa",
             "sjunka"]
# class 2: explicit (lemma, present, past, supine)
SV_CLASS2 = [
    ("stänga", "stänger", "stängde", "stängt"),
    ("ringa", "ringer", "ringde", "ringt"),
    ("bygga", "bygger", "byggde", "byggt"),
    ("köpa", "köper", "köpte", "köpt"),
    ("hjälpa", "hjälper", "hjälpte", "hjälpt"),
    ("tänka", "tänker", "tänkte", "tänkt"),
    ("åka", "åker", "åkte", "åkt"),
    ("köra", "kör", "körde", "kört"),
    ("höra", "hör", "hörde", "hört"),
    ("leva", "lever", "levde", "levt"),
    ("behöva", "behöver", "behövde", "behövt"),
    ("använda", "använder", "använde", "använt"),
    ("känna", "känner", "kände", "känt"),
    ("ställa", "ställer", "ställde", "ställt"),
    ("följa", "följer", "följde", "följt"),
    ("glömma", "glömmer", "glömde", "glömt"),
    ("läsa", "läser", "läste", "läst"),
    ("resa", "reser", "reste", "rest"),
    ("möta", "möter", "mötte", "mött"),
    ("söka", "söker", "sökte", "sökt"),
    ("lära", "lär", "lärde", "lärt"),
]

# nouns: (lemma, definite sg, plural, definite pl)
SV_NOUNS = [
    ("bil", "bilen", "bilar", "bilarna"),
    ("flicka", "flickan", "flickor", "flickorna"),
    ("pojke", "pojken", "pojkar", "pojkarna"),
    ("hus", "huset", "hus", "husen"),
    ("bok", "boken", "böcker", "böckerna"),
    ("dag", "dagen", "dagar", "dagarna"),
    ("år", "året", "år", "åren"),
    ("barn", "barnet", "barn", "barnen"),
    ("kvinna", "kvinnan", "kvinnor", "kvinnorna"),
    ("man", "mannen", "män", "männen"),
    ("stad", "staden", "städer", "städerna"),
    ("land", "landet", "länder", "länderna"),
    ("vän", "vännen", "vänner", "vännerna"),
    ("fråga", "frågan", "frågor", "frågorna"),
    ("ord", "ordet", "ord", "orden"),
    ("vecka", "veckan", "veckor", "veckorna"),
    ("timme", "timmen", "timmar", "timmarna"),
    ("hand", "handen", "händer", "händerna"),
    ("öga", "ögat", "ögon", "ögonen"),
    ("namn", "namnet", "namn", "namnen"),
    ("skola", "skolan", "skolor", "skolorna"),
    ("grupp", "gruppen", "grupper", "grupperna"),
    ("punkt", "punkten", "punkter", "punkterna"),
    ("plats", "platsen", "platser", "platserna"),
    ("bord", "bordet", "bord", "borden"),
    ("stol", "stolen", "stolar", "stolarna"),
    ("fönster", "fönstret", "fönster", "fönstren"),
    ("rum", "rummet", "rum", "rummen"),
    ("träd", "trädet", "träd", "träden"),
    ("blomma", "blomman", "blommor", "blommorna"),
    ("djur", "djuret", "djur", "djuren"),
    ("katt", "katten", "katter", "katterna"),
    ("hund", "hunden", "hundar", "hundarna"),
    ("häst", "hästen", "hästar", "hästarna"),
    ("fågel", "fågeln", "fåglar", "fåglarna"),
    ("tåg", "tåget", "tåg", "tågen"),
    ("väg", "vägen", "vägar", "vägarna"),
    ("bro", "bron", "broar", "broarna"),
    ("kyrka", "kyrkan", "kyrkor", "kyrkorna"),
    ("butik", "butiken", "butiker", "butikerna"),
    ("pris", "priset", "priser", "priserna"),
    ("tal", "talet", "tal", "talen"),
]


def build_sv() -> dict:
    t: dict = {}
    for lemma, forms in SV_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf in SV_CLASS1:
        _suffixed(t, inf, inf, ["r", "de", "t", "d", "des", "ts"])
    for lemma, pres, past, sup in SV_CLASS2:
        _forms(t, lemma, [pres, past, sup])
    for lemma, defsg, pl, defpl in SV_NOUNS:
        _forms(t, lemma, [defsg, pl, defpl])
    return t


# --------------------------------------------------------------------------
# Danish
# --------------------------------------------------------------------------

DA_IRREGULAR = {
    "være": ["er", "var", "været"],
    "have": ["har", "havde", "haft"],
    "gå": ["går", "gik", "gået"],
    "komme": ["kommer", "kom", "kommet"],
    "se": ["ser", "så", "set"],
    "tage": ["tager", "tog", "taget"],
    "give": ["giver", "gav", "givet"],
    "få": ["får", "fik", "fået"],
    "gøre": ["gør", "gjorde", "gjort"],
    "sige": ["siger", "sagde", "sagt"],
    "vide": ["ved", "vidste", "vidst"],
    "kunne": ["kan", "kunnet"],
    "ville": ["vil", "villet"],
    "skulle": ["skal", "skullet"],
    "blive": ["bliver", "blev", "blevet"],
    "drikke": ["drikker", "drak", "drukket"],
    "skrive": ["skriver", "skrev", "skrevet"],
    "ligge": ["ligger", "lå", "ligget"],
    "sidde": ["sidder", "sad", "siddet"],
    "stå": ["står", "stod", "stået"],
    "sove": ["sover", "sov", "sovet"],
    "finde": ["finder", "fandt", "fundet"],
    "holde": ["holder", "holdt"],
    "hjælpe": ["hjælper", "hjalp", "hjulpet"],
    "spise": ["spiser", "spiste", "spist"],
    "synge": ["synger", "sang", "sunget"],
    "løbe": ["løber", "løb", "løbet"],
    "flyve": ["flyver", "fløj", "fløjet"],
    "falde": ["falder", "faldt", "faldet"],
    "bære": ["bærer", "bar", "båret"],
    "dø": ["dør", "døde", "død"],
}

# class 1 (-ede): infinitive ends in -e; pres +r, past +de, part +t
DA_CLASS1 = ["arbejde", "vente", "åbne", "lukke", "elske", "koste",
             "danse", "handle", "hente", "kigge", "lave", "leje",
             "snakke", "spille", "starte", "vaske", "bade", "male",
             "plukke", "rydde", "banke", "kaste", "svare", "takke",
             "cykle", "svømme", "klatre", "hoppe", "lande", "larme",
             "pakke", "smage", "børste", "ordne", "regne", "tegne"]
# class 2 (-te): explicit (lemma, present, past, participle)
DA_CLASS2 = [
    ("tale", "taler", "talte", "talt"),
    ("læse", "læser", "læste", "læst"),
    ("købe", "køber", "købte", "købt"),
    ("høre", "hører", "hørte", "hørt"),
    ("kende", "kender", "kendte", "kendt"),
    ("tænke", "tænker", "tænkte", "tænkt"),
    ("køre", "kører", "kørte", "kørt"),
    ("føle", "føler", "følte", "følt"),
    ("møde", "møder", "mødte", "mødt"),
    ("bruge", "bruger", "brugte", "brugt"),
    ("rejse", "rejser", "rejste", "rejst"),
    ("lære", "lærer", "lærte", "lært"),
    ("glemme", "glemmer", "glemte", "glemt"),
    ("dømme", "dømmer", "dømte", "dømt"),
    ("sende", "sender", "sendte", "sendt"),
    ("vende", "vender", "vendte", "vendt"),
    ("bygge", "bygger", "byggede", "bygget"),
]

# nouns: (lemma, definite sg, plural, definite pl)
DA_NOUNS = [
    ("bil", "bilen", "biler", "bilerne"),
    ("pige", "pigen", "piger", "pigerne"),
    ("dreng", "drengen", "drenge", "drengene"),
    ("hus", "huset", "huse", "husene"),
    ("bog", "bogen", "bøger", "bøgerne"),
    ("dag", "dagen", "dage", "dagene"),
    ("år", "året", "år", "årene"),
    ("barn", "barnet", "børn", "børnene"),
    ("kvinde", "kvinden", "kvinder", "kvinderne"),
    ("mand", "manden", "mænd", "mændene"),
    ("by", "byen", "byer", "byerne"),
    ("land", "landet", "lande", "landene"),
    ("ven", "vennen", "venner", "vennerne"),
    ("uge", "ugen", "uger", "ugerne"),
    ("time", "timen", "timer", "timerne"),
    ("hånd", "hånden", "hænder", "hænderne"),
    ("øje", "øjet", "øjne", "øjnene"),
    ("navn", "navnet", "navne", "navnene"),
    ("skole", "skolen", "skoler", "skolerne"),
    ("gruppe", "gruppen", "grupper", "grupperne"),
    ("punkt", "punktet", "punkter", "punkterne"),
    ("plads", "pladsen", "pladser", "pladserne"),
    ("bord", "bordet", "borde", "bordene"),
    ("stol", "stolen", "stole", "stolene"),
    ("vindue", "vinduet", "vinduer", "vinduerne"),
    ("værelse", "værelset", "værelser", "værelserne"),
    ("træ", "træet", "træer", "træerne"),
    ("blomst", "blomsten", "blomster", "blomsterne"),
    ("dyr", "dyret", "dyr", "dyrene"),
    ("kat", "katten", "katte", "kattene"),
    ("hund", "hunden", "hunde", "hundene"),
    ("hest", "hesten", "heste", "hestene"),
    ("fugl", "fuglen", "fugle", "fuglene"),
    ("tog", "toget", "tog", "togene"),
    ("vej", "vejen", "veje", "vejene"),
    ("bro", "broen", "broer", "broerne"),
    ("kirke", "kirken", "kirker", "kirkerne"),
    ("butik", "butikken", "butikker", "butikkerne"),
    ("pris", "prisen", "priser", "priserne"),
]


def build_da() -> dict:
    t: dict = {}
    for lemma, forms in DA_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf in DA_CLASS1:
        _forms(t, inf, [inf + "r", inf + "de", inf + "t", inf + "s",
                        inf + "des"])
    for lemma, pres, past, part in DA_CLASS2:
        _forms(t, lemma, [pres, past, part])
    for lemma, defsg, pl, defpl in DA_NOUNS:
        _forms(t, lemma, [defsg, pl, defpl])
    return t


# --------------------------------------------------------------------------
# Norwegian Bokmål
# --------------------------------------------------------------------------

NB_IRREGULAR = {
    "være": ["er", "var", "vært"],
    "ha": ["har", "hadde", "hatt"],
    "gå": ["går", "gikk", "gått"],
    "komme": ["kommer", "kom", "kommet"],
    "se": ["ser", "så", "sett"],
    "ta": ["tar", "tok", "tatt"],
    "gi": ["gir", "ga", "gitt"],
    "få": ["får", "fikk", "fått"],
    "gjøre": ["gjør", "gjorde", "gjort"],
    "si": ["sier", "sa", "sagt"],
    "vite": ["vet", "visste", "visst"],
    "kunne": ["kan", "kunnet"],
    "ville": ["vil", "villet"],
    "skulle": ["skal", "skullet"],
    "bli": ["blir", "ble", "blitt"],
    "drikke": ["drikker", "drakk", "drukket"],
    "skrive": ["skriver", "skrev", "skrevet"],
    "ligge": ["ligger", "lå", "ligget"],
    "sitte": ["sitter", "satt", "sittet"],
    "stå": ["står", "sto", "stod", "stått"],
    "sove": ["sover", "sov", "sovet"],
    "finne": ["finner", "fant", "funnet"],
    "holde": ["holder", "holdt"],
    "hjelpe": ["hjelper", "hjalp", "hjulpet"],
    "synge": ["synger", "sang", "sunget"],
    "løpe": ["løper", "løp", "løpt"],
    "fly": ["flyr", "fløy", "fløyet"],
    "falle": ["faller", "falt"],
    "bære": ["bærer", "bar", "båret"],
    "dø": ["dør", "døde", "dødd"],
    "spørre": ["spør", "spurte", "spurt"],
}

# class 1 (-et): pres +r, past/part +t (inf ends in -e)
NB_CLASS1 = ["arbeide", "vente", "åpne", "elske", "koste", "danse",
             "snakke", "kaste", "vaske", "bade", "male", "banke",
             "hoppe", "pakke", "regne", "tegne", "rydde", "lande",
             "starte", "stoppe", "hente", "takke", "klatre", "sykle"]
# class 2 (-te/-de): explicit (lemma, present, past, participle)
NB_CLASS2 = [
    ("lese", "leser", "leste", "lest"),
    ("kjøpe", "kjøper", "kjøpte", "kjøpt"),
    ("høre", "hører", "hørte", "hørt"),
    ("kjenne", "kjenner", "kjente", "kjent"),
    ("tenke", "tenker", "tenkte", "tenkt"),
    ("kjøre", "kjører", "kjørte", "kjørt"),
    ("føle", "føler", "følte", "følt"),
    ("møte", "møter", "møtte", "møtt"),
    ("bruke", "bruker", "brukte", "brukt"),
    ("reise", "reiser", "reiste", "reist"),
    ("lære", "lærer", "lærte", "lært"),
    ("glemme", "glemmer", "glemte", "glemt"),
    ("sende", "sender", "sendte", "sendt"),
    ("vende", "vender", "vendte", "vendt"),
    ("spille", "spiller", "spilte", "spilt"),
    ("leve", "lever", "levde", "levd"),
    ("prøve", "prøver", "prøvde", "prøvd"),
    ("svare", "svarer", "svarte", "svart"),
    ("lage", "lager", "lagde", "lagd"),
    ("bygge", "bygger", "bygde", "bygd"),
    ("betale", "betaler", "betalte", "betalt"),
    ("vise", "viser", "viste", "vist"),
    ("like", "liker", "likte", "likt"),
    ("trenge", "trenger", "trengte", "trengt"),
]

NB_NOUNS = [
    ("bil", "bilen", "biler", "bilene"),
    ("jente", "jenta", "jenter", "jentene"),
    ("gutt", "gutten", "gutter", "guttene"),
    ("hus", "huset", "hus", "husene"),
    ("bok", "boka", "bøker", "bøkene"),
    ("dag", "dagen", "dager", "dagene"),
    ("år", "året", "år", "årene"),
    ("barn", "barnet", "barn", "barna"),
    ("kvinne", "kvinnen", "kvinner", "kvinnene"),
    ("mann", "mannen", "menn", "mennene"),
    ("by", "byen", "byer", "byene"),
    ("land", "landet", "land", "landene"),
    ("venn", "vennen", "venner", "vennene"),
    ("uke", "uken", "uker", "ukene"),
    ("time", "timen", "timer", "timene"),
    ("hånd", "hånden", "hender", "hendene"),
    ("øye", "øyet", "øyne", "øynene"),
    ("navn", "navnet", "navn", "navnene"),
    ("skole", "skolen", "skoler", "skolene"),
    ("gruppe", "gruppen", "grupper", "gruppene"),
    ("punkt", "punktet", "punkter", "punktene"),
    ("plass", "plassen", "plasser", "plassene"),
    ("bord", "bordet", "bord", "bordene"),
    ("stol", "stolen", "stoler", "stolene"),
    ("vindu", "vinduet", "vinduer", "vinduene"),
    ("rom", "rommet", "rom", "rommene"),
    ("tre", "treet", "trær", "trærne"),
    ("blomst", "blomsten", "blomster", "blomstene"),
    ("dyr", "dyret", "dyr", "dyrene"),
    ("katt", "katten", "katter", "kattene"),
    ("hund", "hunden", "hunder", "hundene"),
    ("hest", "hesten", "hester", "hestene"),
    ("fugl", "fuglen", "fugler", "fuglene"),
    ("tog", "toget", "tog", "togene"),
    ("vei", "veien", "veier", "veiene"),
    ("bro", "broen", "broer", "broene"),
    ("kirke", "kirken", "kirker", "kirkene"),
    ("butikk", "butikken", "butikker", "butikkene"),
    ("pris", "prisen", "priser", "prisene"),
]


def build_nb() -> dict:
    t: dict = {}
    for lemma, forms in NB_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf in NB_CLASS1:
        _forms(t, inf, [inf + "r", inf + "t", inf + "s"])
    for lemma, pres, past, part in NB_CLASS2:
        _forms(t, lemma, [pres, past, part])
    for lemma, defsg, pl, defpl in NB_NOUNS:
        _forms(t, lemma, [defsg, pl, defpl])
    return t


# --------------------------------------------------------------------------
# Luxembourgish
# --------------------------------------------------------------------------

LB_IRREGULAR = {
    "sinn": ["ass", "bass", "si", "sidd", "war", "ware", "waren",
             "wier", "gewiescht"],
    "hunn": ["hun", "huet", "hues", "hutt", "hat", "haten", "hätt",
             "gehat"],
    "ginn": ["gëtt", "gëss", "gitt", "gouf", "goufen", "géif", "ginn"],
    "goen": ["ginn", "gees", "geet", "gitt", "goung", "goungen",
             "gaangen", "gaange"],
    "kommen": ["kommt", "kënns", "kënnt", "koum", "koumen", "komm"],
    "maachen": ["maachs", "mécht", "méchs", "maacht", "gemaach",
                "gemaacht"],
    "wëssen": ["weess", "wousst", "gewosst"],
    "kënnen": ["kann", "kanns", "kënnt", "konnt", "konnten", "gekonnt"],
    "wëllen": ["wëll", "wëlls", "wëllt", "wollt", "wollten", "gewollt"],
    "mussen": ["muss", "musst", "missen", "misst", "gemusst"],
    "däerfen": ["däerf", "däerfs", "däerft", "duerft"],
    "gesinn": ["gesäit", "gesäis", "gesitt", "gesouch", "gesinn"],
    "huelen": ["hëlt", "hëls", "huelt", "houl", "geholl"],
    "kafen": ["keeft", "keefs", "kaaft", "gekaf", "gekaaft"],
    "soen": ["sees", "seet", "sot", "soten", "gesot"],
    "liesen": ["liest", "lies", "gelies", "gelosen"],
    "schreiwen": ["schreift", "schreifs", "geschriwwen"],
    "iessen": ["ësst", "iess", "giess", "giesst"],
    "drénken": ["drénkt", "drénks", "gedronk", "gedronken"],
    "schlofen": ["schléift", "schléifs", "geschlof"],
    "fannen": ["fënnt", "fënns", "fonnt", "fonnt"],
    "stoen": ["steet", "stees", "stoung", "gestanen"],
    "leien": ["läit", "läis", "louch", "geleeën"],
    "sëtzen": ["sëtzt", "souz", "gesiess"],
}

# weak verbs: (infinitive, stem); forms: 2sg +s, 3sg +t, participle ge-+t
LB_WEAK = [
    ("wunnen", "wunn"), ("schaffen", "schaff"), ("spillen", "spill"),
    ("léieren", "léier"), ("kucken", "kuck"), ("schwätzen", "schwätz"),
    ("danzen", "danz"), ("sangen", "sang"), ("froen", "fro"),
    ("äntweren", "äntwer"), ("hëllefen", "hëllef"), ("wäschen", "wäsch"),
    ("botzen", "botz"), ("kachen", "kach"), ("molen", "mol"),
    ("bauen", "bau"), ("zielen", "ziel"), ("deelen", "deel"),
    ("sichen", "sich"), ("halen", "hal"), ("bezuelen", "bezuel"),
    ("benotzen", "benotz"), ("probéieren", "probéier"),
    ("studéieren", "studéier"), ("telefonéieren", "telefonéier"),
    ("fueren", "fuer"), ("lauschteren", "lauschter"),
    ("waarden", "waard"), ("weisen", "weis"), ("wielen", "wiel"),
    ("feieren", "feier"), ("spazéieren", "spazéier"),
]

LB_NOUN_PLURALS = {
    "Haiser": "Haus", "Bicher": "Buch", "Kanner": "Kand",
    "Dëscher": "Dësch", "Stied": "Stad", "Dierf": "Duerf",
    "Deeg": "Dag", "Nuechte": "Nuecht", "Männer": "Mann",
    "Fraen": "Fra", "Meedercher": "Meedchen", "Jongen": "Jong",
    "Autoen": "Auto", "Zären": "Zär", "Blummen": "Blumm",
    "Beem": "Bam", "Déieren": "Déier", "Kazen": "Kaz",
    "Hënn": "Hond", "Päerd": "Päerd", "Villercher": "Vull",
    "Zich": "Zuch", "Weeër": "Wee", "Brécken": "Bréck",
    "Kierchen": "Kierch", "Butteker": "Buttek", "Präisser": "Präis",
    "Wuerter": "Wuert", "Wierder": "Wuert", "Sproochen": "Sprooch",
    "Schoulen": "Schoul", "Gruppen": "Grupp", "Plazen": "Plaz",
    "Stéck": "Stéck", "Hänn": "Hand", "Aen": "A", "Nimm": "Numm",
    "Säiten": "Säit", "Dieren": "Dier", "Fënsteren": "Fënster",
    "Zëmmeren": "Zëmmer", "Geschichten": "Geschicht",
}


def build_lb() -> dict:
    t: dict = {}
    for lemma, forms in LB_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf, stem in LB_WEAK:
        part = "ge" + stem + ("t" if not stem.endswith("t") else "")
        _forms(t, inf, [stem, stem + "s", stem + "t", stem + "en",
                        part, stem + "te", stem + "ten"])
    for f, lemma in LB_NOUN_PLURALS.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Czech
# --------------------------------------------------------------------------

CS_IRREGULAR = {
    "být": ["jsem", "jsi", "je", "jsme", "jste", "jsou", "byl", "byla",
            "bylo", "byli", "byly", "budu", "budeš", "bude", "budeme",
            "budete", "budou", "buď", "jsa"],
    "mít": ["mám", "máš", "má", "máme", "máte", "mají", "měl", "měla",
            "mělo", "měli", "měly", "měj"],
    "jít": ["jdu", "jdeš", "jde", "jdeme", "jdete", "jdou", "šel",
            "šla", "šlo", "šli", "šly", "půjdu", "půjde", "půjdou"],
    "chtít": ["chci", "chceš", "chce", "chceme", "chcete", "chtějí",
              "chtěl", "chtěla", "chtělo", "chtěli", "chtěly"],
    "moci": ["můžu", "mohu", "můžeš", "může", "můžeme", "můžete",
             "můžou", "mohou", "mohl", "mohla", "mohlo", "mohli",
             "mohly"],
    "vědět": ["vím", "víš", "ví", "víme", "víte", "vědí", "věděl",
              "věděla", "vědělo", "věděli", "věděly"],
    "jíst": ["jím", "jíš", "jí", "jíme", "jíte", "jedí", "jedl",
             "jedla", "jedlo", "jedli", "jedly"],
    "říci": ["řeknu", "řekneš", "řekne", "řekneme", "řeknete",
             "řeknou", "řekl", "řekla", "řeklo", "řekli", "řekly"],
}

# -at class: present -ám, past -al
CS_AT_VERBS = ["dělat", "udělat", "hledat", "čekat", "poslouchat",
               "zpívat", "volat", "zavolat", "dávat", "říkat",
               "vstávat", "znát", "létat", "plavat", "ptát",
               "povídat", "pomáhat", "začínat", "končívat", "zavírat",
               "otvírat", "potkávat", "hrávat", "snídat", "obědvat"]
# -ovat class: present -uji/-uješ..., past -oval
CS_OVAT_VERBS = ["pracovat", "kupovat", "studovat", "potřebovat",
                 "děkovat", "jmenovat", "milovat", "cestovat",
                 "opakovat", "ukazovat", "telefonovat", "sportovat",
                 "tancovat", "malovat", "plánovat", "organizovat"]
# -it/-et class: present -ím, past -il/-el
CS_IT_VERBS = ["mluvit", "učit", "naučit", "končit", "skončit",
               "prosit", "poprosit", "platit", "zaplatit", "vařit",
               "koupit", "chodit", "nosit", "vozit", "bydlet",
               "rozumět", "sedět", "ležet", "slyšet", "myslet",
               "vidět", "držet", "běžet", "křičet"]

CS_NOUN_PLURALS = {
    "knihy": "kniha", "domy": "dům", "školy": "škola", "slova": "slovo",
    "města": "město", "ženy": "žena", "muži": "muž", "dny": "den",
    "roky": "rok", "otázky": "otázka", "odpovědi": "odpověď",
    "dveře": "dveře", "okna": "okno", "hlavy": "hlava", "týdny": "týden",
    "osoby": "osoba", "věci": "věc", "životy": "život", "hodiny": "hodina",
    "noci": "noc", "části": "část", "jména": "jméno", "měsíce": "měsíc",
    "stoly": "stůl", "židle": "židle", "stromy": "strom", "květiny": "květina",
    "zvířata": "zvíře", "kočky": "kočka", "psi": "pes", "koně": "kůň",
    "ptáci": "pták", "vlaky": "vlak", "cesty": "cesta", "mosty": "most",
    "kostely": "kostel", "obchody": "obchod", "ceny": "cena", "čísla": "číslo",
}


def build_cs() -> dict:
    t: dict = {}
    for lemma, forms in CS_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf in CS_AT_VERBS:
        stem = inf[:-2]  # minus 'at'
        _suffixed(t, inf, stem,
                  ["ám", "áš", "á", "áme", "áte", "ají",
                   "al", "ala", "alo", "ali", "aly", "ej", "ejte", "aje"])
    for inf in CS_OVAT_VERBS:
        stem = inf[:-4]  # minus 'ovat'
        _suffixed(t, inf, stem,
                  ["uji", "uju", "uješ", "uje", "ujeme", "ujete", "ují",
                   "ujou", "oval", "ovala", "ovalo", "ovali", "ovaly",
                   "uj", "ujte"])
    for inf in CS_IT_VERBS:
        stem = inf[:-2]  # minus 'it'/'et'
        vowel = inf[-2]
        _suffixed(t, inf, stem,
                  ["ím", "íš", "í", "íme", "íte",
                   vowel + "l", vowel + "la", vowel + "lo",
                   vowel + "li", vowel + "ly"])
    for f, lemma in CS_NOUN_PLURALS.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Croatian (ijekavian) / Serbian (ekavian, Latin script)
# --------------------------------------------------------------------------

def _bcs_core(jat: str) -> dict:
    """Shared Bosnian-Croatian-Serbian paradigms; ``jat`` picks the
    reflex ('ije' Croatian / 'e' Serbian) for the few differing stems."""
    t: dict = {}
    irregular = {
        "biti": ["sam", "si", "je", "smo", "ste", "su", "bio", "bila",
                 "bilo", "bili", "bile", "budem", "budeš", "bude",
                 "budemo", "budete", "budu", "bih", "bi", "bismo",
                 "biste"],
        "ići": ["idem", "ideš", "ide", "idemo", "idete", "idu", "išao",
                "išla", "išlo", "išli", "išle"],
        "moći": ["mogu", "možeš", "može", "možemo", "možete", "mogao",
                 "mogla", "moglo", "mogli", "mogle"],
        "doći": ["dođem", "dođeš", "dođe", "dođemo", "dođete", "dođu",
                 "došao", "došla", "došlo", "došli", "došle"],
        "reći": ["rekao", "rekla", "reklo", "rekli", "rekle", "kažem",
                 "kaže", "kažu"],
        "dati": ["dam", "daš", "da", "damo", "date", "daju", "dao",
                 "dala", "dalo", "dali", "dale"],
    }
    if jat == "ije":
        irregular["htjeti"] = ["hoću", "hoćeš", "hoće", "hoćemo",
                               "hoćete", "htio", "htjela", "htjelo",
                               "htjeli", "htjele", "ću", "ćeš", "će",
                               "ćemo", "ćete"]
        irregular["vidjeti"] = ["vidim", "vidiš", "vidi", "vidimo",
                                "vidite", "vide", "vidio", "vidjela",
                                "vidjelo", "vidjeli", "vidjele"]
        irregular["razumjeti"] = ["razumijem", "razumiješ", "razumije",
                                  "razumijemo", "razumijete", "razumiju",
                                  "razumio", "razumjela", "razumjelo",
                                  "razumjeli", "razumjele"]
        irregular["živjeti"] = ["živim", "živiš", "živi", "živimo",
                                "živite", "žive", "živio", "živjela",
                                "živjelo", "živjeli", "živjele"]
    else:
        irregular["hteti"] = ["hoću", "hoćeš", "hoće", "hoćemo",
                              "hoćete", "hteo", "htela", "htelo",
                              "hteli", "htele", "ću", "ćeš", "će",
                              "ćemo", "ćete"]
        irregular["videti"] = ["vidim", "vidiš", "vidi", "vidimo",
                               "vidite", "vide", "video", "videla",
                               "videlo", "videli", "videle"]
        irregular["razumeti"] = ["razumem", "razumeš", "razume",
                                 "razumemo", "razumete", "razumeju",
                                 "razumeo", "razumela", "razumelo",
                                 "razumeli", "razumele"]
        irregular["živeti"] = ["živim", "živiš", "živi", "živimo",
                               "živite", "žive", "živeo", "živela",
                               "živelo", "živeli", "živele"]
    for lemma, forms in irregular.items():
        _forms(t, lemma, forms)

    # -ati verbs, -am present class: full present + active participle
    am_verbs = ["imati", "gledati", "slušati", "pitati", "čekati",
                "igrati", "čitati", "znati", "plivati", "padati",
                "pričati", "spavati", "skakati", "pjevati" if jat == "ije"
                else "pevati", "kuhati" if jat == "ije" else "kuvati",
                "ručati", "večerati", "šetati", "slati", "čuvati",
                "stanovati", "kupovati", "putovati", "radovati"]
    for inf in am_verbs:
        stem = inf[:-2]
        if inf.endswith("ovati"):
            # -ujem present class
            ustem = inf[:-4]
            _suffixed(t, inf, ustem,
                      ["ujem", "uješ", "uje", "ujemo", "ujete", "uju"])
            _suffixed(t, inf, stem,
                      ["o", "la", "lo", "li", "le"])
        else:
            _suffixed(t, inf, stem,
                      ["m", "š", "", "mo", "te", "ju",
                       "o", "la", "lo", "li", "le"])
    # -iti verbs, -im present class
    im_verbs = ["raditi", "govoriti", "učiti", "voditi", "nositi",
                "voziti", "moliti", "misliti", "platiti", "pustiti",
                "kupiti", "ljubiti", "pamtiti", "javiti", "praviti",
                "staviti", "baciti", "trošiti", "nuditi", "buditi"]
    for inf in im_verbs:
        stem = inf[:-3]
        _suffixed(t, inf, stem,
                  ["im", "iš", "i", "imo", "ite", "e",
                   "io", "ila", "ilo", "ili", "ile"])
    # noun plurals (shared)
    nouns = {"knjige": "knjiga", "kuće": "kuća", "škole": "škola",
             "žene": "žena", "ljudi": "čovjek" if jat == "ije" else "čovek",
             "dani": "dan", "godine": "godina", "pitanja": "pitanje",
             "odgovori": "odgovor", "vrata": "vrata", "prozori": "prozor",
             "glave": "glava", "osobe": "osoba", "stvari": "stvar",
             "životi": "život", "sati": "sat", "noći": "noć",
             "dijelovi" if jat == "ije" else "delovi":
                 "dio" if jat == "ije" else "deo",
             "imena": "ime", "stolovi": "stol" if jat == "ije" else "sto",
             "stolice": "stolica", "drveća": "drveće", "mačke": "mačka",
             "psi": "pas", "konji": "konj", "ptice": "ptica",
             "vozovi": "voz", "putevi": "put", "mostovi": "most",
             "crkve": "crkva", "cijene" if jat == "ije" else "cene":
                 "cijena" if jat == "ije" else "cena",
             "brojevi": "broj", "gradovi": "grad", "sela": "selo"}
    for f, lemma in nouns.items():
        add(t, f, lemma)
    return t


def build_hr() -> dict:
    return _bcs_core("ije")


def build_sr() -> dict:
    return _bcs_core("e")


# --------------------------------------------------------------------------
# Macedonian
# --------------------------------------------------------------------------

# lemma convention: 3sg present (the Macedonian citation form)
MK_A_VERBS = ["гледа", "слуша", "чита", "игра", "вика", "пее", "живее",
              "работи", "зборува", "пишува", "купува", "патува",
              "студира", "вечера", "руча", "шета", "чека", "пита",
              "сака", "има", "нема", "знае", "оди", "учи", "носи",
              "вози", "моли", "мисли", "прави", "става", "дава",
              "бара", "гради", "пали", "мери"]


def _mk_conj(t: dict, lemma: str) -> None:
    """Present + imperfect + л-forms from the 3sg-present lemma."""
    if lemma.endswith(("а", "е")) and not lemma.endswith(("ува",)):
        if lemma.endswith("а"):
            stem = lemma[:-1]
            _suffixed(t, lemma, stem,
                      ["ам", "аш", "аме", "ате", "аат",
                       "ав", "аше", "авме", "авте", "аа",
                       "ал", "ала", "ало", "але"])
        else:  # -е presents (пее, живее, знае)
            stem = lemma[:-1]
            _suffixed(t, lemma, stem,
                      ["ам", "еш", "еме", "ете", "ат",
                       "ев", "еше", "евме", "евте", "еја",
                       "ел", "ела", "ело", "еле"])
    elif lemma.endswith("ува"):
        stem = lemma[:-1]
        _suffixed(t, lemma, stem,
                  ["ам", "аш", "аме", "ате", "аат",
                   "ав", "аше", "авме", "авте", "аа",
                   "ал", "ала", "ало", "але"])
    elif lemma.endswith("и"):
        stem = lemma[:-1]
        _suffixed(t, lemma, stem,
                  ["ам", "иш", "име", "ите", "ат",
                   "ев", "еше", "евме", "евте", "еа",
                   "ел", "ела", "ело", "еле",
                   "ил", "ила", "ило", "иле"])


MK_IRREGULAR = {
    "е": ["сум", "си", "сме", "сте", "се", "бев", "беше", "бевме",
          "бевте", "беа", "бил", "била", "било", "биле", "биде"],
    "има": ["имам", "имаш", "имаме", "имате", "имаат", "имав",
            "имаше", "имал", "имала", "имало", "имале"],
    "оди": ["одам", "одиш", "одиме", "одите", "одат", "одев",
            "одеше", "одел", "одела", "оделе", "отиде", "отишол",
            "отишла", "отишле"],
    "може": ["можам", "можеш", "можеме", "можете", "можат", "можев",
             "можеше", "можел", "можела", "можеле"],
    "сака": ["сакам", "сакаш", "сакаме", "сакате", "сакаат", "сакав",
             "сакаше", "сакал", "сакала", "сакале"],
}

# nouns: definite (-та/-от/-то), plural (-и/-а), plural definite
MK_NOUNS = [
    ("книга", "книгата", "книги", "книгите"),
    ("куќа", "куќата", "куќи", "куќите"),
    ("жена", "жената", "жени", "жените"),
    ("маса", "масата", "маси", "масите"),
    ("град", "градот", "градови", "градовите"),
    ("ден", "денот", "денови", "деновите"),
    ("човек", "човекот", "луѓе", "луѓето"),
    ("дете", "детето", "деца", "децата"),
    ("година", "годината", "години", "годините"),
    ("прашање", "прашањето", "прашања", "прашањата"),
    ("одговор", "одговорот", "одговори", "одговорите"),
    ("врата", "вратата", "врати", "вратите"),
    ("прозорец", "прозорецот", "прозорци", "прозорците"),
    ("глава", "главата", "глави", "главите"),
    ("живот", "животот", "животи", "животите"),
    ("час", "часот", "часови", "часовите"),
    ("ноќ", "ноќта", "ноќи", "ноќите"),
    ("име", "името", "имиња", "имињата"),
    ("стол", "столот", "столови", "столовите"),
    ("дрво", "дрвото", "дрва", "дрвата"),
    ("мачка", "мачката", "мачки", "мачките"),
    ("куче", "кучето", "кучиња", "кучињата"),
    ("коњ", "коњот", "коњи", "коњите"),
    ("птица", "птицата", "птици", "птиците"),
    ("воз", "возот", "возови", "возовите"),
    ("пат", "патот", "патишта", "патиштата"),
    ("мост", "мостот", "мостови", "мостовите"),
    ("црква", "црквата", "цркви", "црквите"),
    ("цена", "цената", "цени", "цените"),
    ("број", "бројот", "броеви", "броевите"),
    ("село", "селото", "села", "селата"),
    ("училиште", "училиштето", "училишта", "училиштата"),
    ("збор", "зборот", "зборови", "зборовите"),
]


def build_mk() -> dict:
    t: dict = {}
    for lemma, forms in MK_IRREGULAR.items():
        _forms(t, lemma, forms)
    for lemma in MK_A_VERBS:
        _mk_conj(t, lemma)
    for lemma, defsg, pl, defpl in MK_NOUNS:
        _forms(t, lemma, [defsg, pl, defpl])
    return t


# --------------------------------------------------------------------------
# Lithuanian
# --------------------------------------------------------------------------

# (infinitive, present 3, past 3); persons derived mechanically from the
# 3rd-person stems (regular -a/-i present, -o/-ė past); 1sg of -ė pasts is
# skipped (palatalization), -ėjo pasts are safe
LT_VERBS = [
    ("dirbti", "dirba", "dirbo"),
    ("gyventi", "gyvena", "gyveno"),
    ("norėti", "nori", "norėjo"),
    ("turėti", "turi", "turėjo"),
    ("galėti", "gali", "galėjo"),
    ("žinoti", "žino", "žinojo"),
    ("manyti", "mano", "manė"),
    ("kalbėti", "kalba", "kalbėjo"),
    ("klausyti", "klauso", "klausė"),
    ("žiūrėti", "žiūri", "žiūrėjo"),
    ("matyti", "mato", "matė"),
    ("daryti", "daro", "darė"),
    ("mokytis", "mokosi", "mokėsi"),
    ("mokėti", "moka", "mokėjo"),
    ("laukti", "laukia", "laukė"),
    ("gauti", "gauna", "gavo"),
    ("duoti", "duoda", "davė"),
    ("imti", "ima", "ėmė"),
    ("pirkti", "perka", "pirko"),
    ("parduoti", "parduoda", "pardavė"),
    ("valgyti", "valgo", "valgė"),
    ("gerti", "geria", "gėrė"),
    ("miegoti", "miega", "miegojo"),
    ("bėgti", "bėga", "bėgo"),
    ("plaukti", "plaukia", "plaukė"),
    ("skaityti", "skaito", "skaitė"),
    ("rašyti", "rašo", "rašė"),
    ("dainuoti", "dainuoja", "dainavo"),
    ("šokti", "šoka", "šoko"),
    ("žaisti", "žaidžia", "žaidė"),
    ("padėti", "padeda", "padėjo"),
    ("klausti", "klausia", "klausė"),
    ("atsakyti", "atsako", "atsakė"),
    ("suprasti", "supranta", "suprato"),
    ("prasidėti", "prasideda", "prasidėjo"),
    ("baigti", "baigia", "baigė"),
    ("atidaryti", "atidaro", "atidarė"),
    ("uždaryti", "uždaro", "uždarė"),
    ("mylėti", "myli", "mylėjo"),
    ("ieškoti", "ieško", "ieškojo"),
]

LT_IRREGULAR = {
    "būti": ["esu", "esi", "yra", "esame", "esate", "buvau", "buvai",
             "buvo", "buvome", "buvote", "bus", "būsiu", "būsi",
             "būsime", "būsite", "būtų", "buvęs", "buvusi"],
    "eiti": ["einu", "eini", "eina", "einame", "einate", "ėjo",
             "ėjau", "ėjai", "ėjome", "ėjote", "eis", "eisiu"],
}

# noun declensions: (lemma, [forms]) — explicit, no mechanical guessing
LT_NOUNS = {
    "vyras": ["vyrai", "vyrą", "vyro", "vyrui", "vyre", "vyrus",
              "vyrams", "vyruose", "vyrų"],
    "namas": ["namai", "namą", "namo", "namui", "name", "namus",
              "namams", "namuose", "namų"],
    "miestas": ["miestai", "miestą", "miesto", "miestui", "mieste",
                "miestus", "miestams", "miestuose", "miestų"],
    "žmogus": ["žmonės", "žmogų", "žmogaus", "žmogui", "žmones",
               "žmonėms", "žmonių"],
    "knyga": ["knygos", "knygą", "knygai", "knygoje", "knygas",
              "knygoms", "knygose", "knygų"],
    "moteris": ["moterys", "moterį", "moters", "moteriai", "moteris",
                "moterims", "moterų"],
    "diena": ["dienos", "dieną", "dienai", "dienoje", "dienas",
              "dienoms", "dienose", "dienų"],
    "metai": ["metus", "metams", "metuose", "metų"],
    "klausimas": ["klausimai", "klausimą", "klausimo", "klausimui",
                  "klausimus", "klausimų"],
    "atsakymas": ["atsakymai", "atsakymą", "atsakymo", "atsakymui",
                  "atsakymus", "atsakymų"],
    "durys": ["duris", "durims", "durų"],
    "langas": ["langai", "langą", "lango", "langui", "lange",
               "langus", "langų"],
    "galva": ["galvos", "galvą", "galvai", "galvoje", "galvas",
              "galvų"],
    "savaitė": ["savaitės", "savaitę", "savaitei", "savaitėje",
                "savaites", "savaičių"],
    "gyvenimas": ["gyvenimai", "gyvenimą", "gyvenimo", "gyvenimui",
                  "gyvenimus", "gyvenimų"],
    "valanda": ["valandos", "valandą", "valandai", "valandas",
                "valandų"],
    "naktis": ["naktys", "naktį", "nakties", "naktims", "naktų",
               "naktyje"],
    "vardas": ["vardai", "vardą", "vardo", "vardui", "vardus",
               "vardų"],
    "mokykla": ["mokyklos", "mokyklą", "mokyklai", "mokykloje",
                "mokyklas", "mokyklų"],
    "stalas": ["stalai", "stalą", "stalo", "stalui", "stalus",
               "stalų"],
    "kėdė": ["kėdės", "kėdę", "kėdei", "kėdėje", "kėdes", "kėdžių"],
    "medis": ["medžiai", "medį", "medžio", "medžiui", "medžius",
              "medžių"],
    "gėlė": ["gėlės", "gėlę", "gėlei", "gėlėje", "gėles", "gėlių"],
    "katė": ["katės", "katę", "katei", "kates", "kačių"],
    "šuo": ["šunys", "šunį", "šuns", "šuniui", "šunis", "šunims",
            "šunų"],
    "arklys": ["arkliai", "arklį", "arklio", "arkliui", "arklius",
               "arklių"],
    "paukštis": ["paukščiai", "paukštį", "paukščio", "paukščius",
                 "paukščių"],
    "traukinys": ["traukiniai", "traukinį", "traukinio", "traukinius",
                  "traukinių"],
    "kelias": ["keliai", "kelią", "kelio", "keliui", "kelius",
               "kelių"],
    "tiltas": ["tiltai", "tiltą", "tilto", "tiltui", "tiltus",
               "tiltų"],
    "kaina": ["kainos", "kainą", "kainai", "kainas", "kainų"],
    "skaičius": ["skaičiai", "skaičių", "skaičiaus", "skaičiui",
                 "skaičius"],
}


def build_lt() -> dict:
    t: dict = {}
    for lemma, forms in LT_IRREGULAR.items():
        _forms(t, lemma, forms)
    for inf, pres3, past3 in LT_VERBS:
        add(t, pres3, inf)
        add(t, past3, inf)
        if pres3.endswith("a"):
            _suffixed(t, inf, pres3, ["u", "i", "me", "te"])
            add(t, pres3 + "u", inf)
        elif pres3.endswith("i"):
            _suffixed(t, inf, pres3, ["u", "me", "te"])
        if past3.endswith("o"):
            _suffixed(t, inf, past3[:-1],
                      ["au", "ai", "ome", "ote"])
        elif past3.endswith("ėjo"):
            _suffixed(t, inf, past3[:-1],
                      ["au", "ai", "ome", "ote"])
        # future from infinitive stem
        fstem = inf[:-2]
        if not fstem.endswith(("s", "š", "ž", "z")):
            _suffixed(t, inf, fstem, ["siu", "si", "s", "sime", "site"])
    for lemma, forms in LT_NOUNS.items():
        _forms(t, lemma, forms)
    return t


# --------------------------------------------------------------------------
# Hungarian
# --------------------------------------------------------------------------

# verbs: (lemma=3sg-indef, harmony 'back'/'front'/'front_r', past stem)
# past stem given explicitly (linking-vowel and assimilation vary)
HU_VERBS = [
    ("lát", "back", "látott"),
    ("vár", "back", "várt"),
    ("mond", "back", "mondott"),
    ("ad", "back", "adott"),
    ("tud", "back", "tudott"),
    ("ír", "back", "írt"),
    ("olvas", "back", "olvasott"),
    ("tanul", "back", "tanult"),
    ("dolgozik", "back", "dolgozott"),
    ("lakik", "back", "lakott"),
    ("játszik", "back", "játszott"),
    ("hall", "back", "hallott"),
    ("gondol", "back", "gondolt"),
    ("használ", "back", "használt"),
    ("csinál", "back", "csinált"),
    ("talál", "back", "talált"),
    ("indul", "back", "indult"),
    ("marad", "back", "maradt"),
    ("fut", "back", "futott"),
    ("úszik", "back", "úszott"),
    ("beszél", "front", "beszélt"),
    ("él", "front", "élt"),
    ("néz", "front", "nézett"),
    ("kér", "front", "kért"),
    ("keres", "front", "keresett"),
    ("szeret", "front", "szeretett"),
    ("ért", "front", "értett"),
    ("érkezik", "front", "érkezett"),
    ("segít", "front", "segített"),
    ("épít", "front", "épített"),
    ("fizet", "front", "fizetett"),
    ("kérdez", "front", "kérdezett"),
    ("felel", "front", "felelt"),
    ("énekel", "front", "énekelt"),
    ("ül", "front_r", "ült"),
    ("küld", "front_r", "küldött"),
    ("főz", "front_r", "főzött"),
    ("jön", "front_r", "jött"),
]
_HU_PRES = {
    "back": ["ok", "sz", "unk", "tok", "nak"],
    "front": ["ek", "sz", "ünk", "tek", "nek"],
    "front_r": ["ök", "sz", "ünk", "tök", "nek"],
}
_HU_PAST_PERS = {
    "back": ["am", "ál", "unk", "atok", "ak"],
    "front": ["em", "él", "ünk", "etek", "ek"],
    "front_r": ["em", "él", "ünk", "etek", "ek"],
}

HU_IRREGULAR = {
    "van": ["vagyok", "vagy", "vagyunk", "vagytok", "vannak", "volt",
            "voltam", "voltál", "voltunk", "voltatok", "voltak",
            "lesz", "leszek", "leszel", "leszünk", "lesztek",
            "lesznek", "lenne", "volna", "legyen"],
    "megy": ["megyek", "mész", "megyünk", "mentek", "mennek", "ment",
             "mentem", "mentél", "mentünk", "mentetek"],
    "eszik": ["eszem", "eszel", "eszünk", "esztek", "esznek", "evett",
              "ettem", "ettél", "ettünk"],
    "iszik": ["iszom", "iszol", "iszunk", "isztok", "isznak", "ivott",
              "ittam", "ittál", "ittunk"],
    "tesz": ["teszek", "teszel", "teszünk", "tesztek", "tesznek",
             "tett", "tettem", "tettél", "tettünk"],
    "vesz": ["veszek", "veszel", "veszünk", "vesztek", "vesznek",
             "vett", "vettem", "vettél", "vettünk"],
    "visz": ["viszek", "viszel", "viszünk", "visztek", "visznek",
             "vitt", "vittem", "vittél", "vittünk"],
    "hisz": ["hiszek", "hiszel", "hiszünk", "hisztek", "hisznek",
             "hitt", "hittem", "hittél", "hittünk"],
    "alszik": ["alszom", "alszol", "alszunk", "alszotok", "alszanak",
               "aludt", "aludtam", "aludtál", "aludtunk"],
}

# nouns: (lemma, harmony, explicit plural, explicit accusative);
# only non-assimilating case endings are appended mechanically
HU_NOUNS = [
    ("ház", "back", "házak", "házat"),
    ("autó", "back", "autók", "autót"),
    ("asztal", "back", "asztalok", "asztalt"),
    ("ablak", "back", "ablakok", "ablakot"),
    ("ajtó", "back", "ajtók", "ajtót"),
    ("város", "back", "városok", "várost"),
    ("ország", "back", "országok", "országot"),
    ("nap", "back", "napok", "napot"),
    ("hónap", "back", "hónapok", "hónapot"),
    ("lány", "back", "lányok", "lányt"),
    ("fiú", "back", "fiúk", "fiút"),
    ("tanár", "back", "tanárok", "tanárt"),
    ("munka", "back", "munkák", "munkát"),
    ("iskola", "back", "iskolák", "iskolát"),
    ("szoba", "back", "szobák", "szobát"),
    ("utca", "back", "utcák", "utcát"),
    ("kutya", "back", "kutyák", "kutyát"),
    ("macska", "back", "macskák", "macskát"),
    ("virág", "back", "virágok", "virágot"),
    ("vonat", "back", "vonatok", "vonatot"),
    ("asszony", "back", "asszonyok", "asszonyt"),
    ("szó", "back", "szavak", "szót"),
    ("kérdés", "front", "kérdések", "kérdést"),
    ("év", "front", "évek", "évet"),
    ("hét", "front", "hetek", "hetet"),
    ("gyerek", "front", "gyerekek", "gyereket"),
    ("ember", "front", "emberek", "embert"),
    ("név", "front", "nevek", "nevet"),
    ("kéz", "front", "kezek", "kezet"),
    ("szék", "front", "székek", "széket"),
    ("kert", "front", "kertek", "kertet"),
    ("hely", "front", "helyek", "helyet"),
    ("élet", "front", "életek", "életet"),
    ("este", "front", "esték", "estét"),
    ("idő", "front", "idők", "időt"),
    ("könyv", "front_r", "könyvek", "könyvet"),
    ("föld", "front_r", "földek", "földet"),
    ("gyümölcs", "front_r", "gyümölcsök", "gyümölcsöt"),
]
_HU_CASES = {
    "back": ["ban", "ba", "ból", "nak", "hoz", "ig", "ért", "on",
             "ra", "ról", "tól", "nál"],
    "front": ["ben", "be", "ből", "nek", "hez", "ig", "ért", "en",
              "re", "ről", "től", "nél"],
    "front_r": ["ben", "be", "ből", "nek", "höz", "ig", "ért", "ön",
                "re", "ről", "től", "nél"],
}


def build_hu() -> dict:
    t: dict = {}
    for lemma, forms in HU_IRREGULAR.items():
        _forms(t, lemma, forms)
    for lemma, h, past in HU_VERBS:
        stem = lemma[:-2] if lemma.endswith("ik") else lemma
        pres = _HU_PRES[h]
        if lemma.endswith("ik"):
            # -ik verbs: 1sg -om/-em/-öm
            first = {"back": "om", "front": "em", "front_r": "öm"}[h]
            _suffixed(t, lemma, stem, [first] + pres[2:])
        else:
            _suffixed(t, lemma, stem, pres)
        add(t, past, lemma)
        # person endings attach to the bare -t past only (várt -> vártam);
        # -ott/-ett/-ött pasts switch to the short stem in persons
        # (mondott but mondtam), so only their given 3sg is emitted
        if past == stem + "t" or past == lemma + "t":
            for e in _HU_PAST_PERS[h]:
                add(t, past + e, lemma)
    for lemma, h, pl, acc in HU_NOUNS:
        add(t, pl, lemma)
        add(t, acc, lemma)
        add(t, pl + ("at" if h == "back" else "et"), lemma)  # plural acc
        for c in _HU_CASES[h]:
            add(t, lemma + c, lemma)
            add(t, pl + c, lemma)
    return t


# --------------------------------------------------------------------------
# Turkish
# --------------------------------------------------------------------------

# verbs: (infinitive, stem, past-3sg, progressive-3sg) — past and -iyor
# forms given explicitly (consonant devoicing git->gitti, vowel drop
# iste->istiyor are never computed)
TR_VERBS = [
    ("gelmek", "gel", "geldi", "geliyor"),
    ("gitmek", "git", "gitti", "gidiyor"),
    ("yapmak", "yap", "yaptı", "yapıyor"),
    ("etmek", "et", "etti", "ediyor"),
    ("olmak", "ol", "oldu", "oluyor"),
    ("almak", "al", "aldı", "alıyor"),
    ("vermek", "ver", "verdi", "veriyor"),
    ("görmek", "gör", "gördü", "görüyor"),
    ("bilmek", "bil", "bildi", "biliyor"),
    ("sevmek", "sev", "sevdi", "seviyor"),
    ("istemek", "iste", "istedi", "istiyor"),
    ("beklemek", "bekle", "bekledi", "bekliyor"),
    ("çalışmak", "çalış", "çalıştı", "çalışıyor"),
    ("konuşmak", "konuş", "konuştu", "konuşuyor"),
    ("okumak", "oku", "okudu", "okuyor"),
    ("yazmak", "yaz", "yazdı", "yazıyor"),
    ("dinlemek", "dinle", "dinledi", "dinliyor"),
    ("izlemek", "izle", "izledi", "izliyor"),
    ("oturmak", "otur", "oturdu", "oturuyor"),
    ("kalkmak", "kalk", "kalktı", "kalkıyor"),
    ("açmak", "aç", "açtı", "açıyor"),
    ("satmak", "sat", "sattı", "satıyor"),
    ("koşmak", "koş", "koştu", "koşuyor"),
    ("yüzmek", "yüz", "yüzdü", "yüzüyor"),
    ("uyumak", "uyu", "uyudu", "uyuyor"),
    ("içmek", "iç", "içti", "içiyor"),
    ("bakmak", "bak", "baktı", "bakıyor"),
    ("durmak", "dur", "durdu", "duruyor"),
    ("bulmak", "bul", "buldu", "buluyor"),
    ("kalmak", "kal", "kaldı", "kalıyor"),
    ("başlamak", "başla", "başladı", "başlıyor"),
    ("bitirmek", "bitir", "bitirdi", "bitiriyor"),
    ("öğrenmek", "öğren", "öğrendi", "öğreniyor"),
    ("anlamak", "anla", "anladı", "anlıyor"),
    ("duymak", "duy", "duydu", "duyuyor"),
    ("sormak", "sor", "sordu", "soruyor"),
]


def _tr_past_persons(past3: str) -> list:
    """geldi -> geldim geldin geldik geldiniz geldiler (4-way harmony is
    already encoded in the given 3sg vowel)."""
    v = past3[-1]  # ı i u ü
    return [past3 + "m", past3 + "n", past3 + "k",
            past3 + "n" + v + "z", past3 + "ler" if v in "iü" else past3 + "lar"]


def _tr_prog_persons(prog3: str) -> list:
    return [prog3 + "um", prog3 + "sun", prog3 + "uz", prog3 + "sunuz",
            prog3 + "lar"]


# nouns chosen to avoid final-consonant softening (k/p/t/ç alternations);
# suffix sets by vowel class, locative/ablative give both d- and t- forms
# where the stem-final consonant is voiceless
TR_NOUNS = [
    ("ev", "e"), ("araba", "a"), ("okul", "a"), ("oda", "a"),
    ("masa", "a"), ("kapı", "a"), ("yol", "a"), ("göz", "e"),
    ("el", "e"), ("gün", "e"), ("yıl", "a"), ("deniz", "e"),
    ("kız", "a"), ("adam", "a"), ("kadın", "a"), ("şehir", "e"),
    ("su", "a"), ("hava", "a"), ("para", "a"), ("iş", "e"),
    ("ses", "e"), ("söz", "e"), ("yer", "e"), ("zaman", "a"),
    ("dünya", "a"), ("ülke", "e"), ("insan", "a"), ("anne", "e"),
    ("baba", "a"), ("arkadaş", "a"), ("öğrenci", "e"), ("ders", "e"),
]
_TR_VOICELESS = set("fstkçşhp")


def build_tr() -> dict:
    # LEMMA CONVENTION: the verb STEM, not the infinitive — the
    # reference's own matrix maps çalıştı -> çalış
    # (test_lemmatization.py), i.e. the spaCy tr lookup convention.
    t: dict = {}
    for inf, stem, past3, prog3 in TR_VERBS:
        add(t, inf, stem)
        add(t, past3, stem)
        add(t, prog3, stem)
        for f in _tr_past_persons(past3):
            add(t, f, stem)
        for f in _tr_prog_persons(prog3):
            add(t, f, stem)
        # negative stem + infinitive-as-noun forms skipped (conservative)
    for noun, cls in TR_NOUNS:
        back = cls == "a"
        pl = noun + ("lar" if back else "ler")
        add(t, pl, noun)
        dt = "t" if noun[-1] in _TR_VOICELESS else "d"
        loc = noun + dt + ("a" if back else "e")
        abl = loc + "n"
        add(t, loc, noun)
        add(t, abl, noun)
        add(t, pl + ("da" if back else "de"), noun)
        add(t, pl + ("dan" if back else "den"), noun)
        if noun[-1] in "aeıioöuü":
            add(t, noun + "ya" if back else noun + "ye", noun)  # dative
            add(t, noun + ("yı" if back else "yi"), noun)  # accusative
            add(t, noun + ("nın" if back else "nin"), noun)  # genitive
        else:
            add(t, noun + ("a" if back else "e"), noun)
            # accusative/genitive high-vowel harmony from the last vowel
            last_v = [c for c in noun if c in "aeıioöuü"][-1]
            acc_v = {"a": "ı", "ı": "ı", "o": "u", "u": "u",
                     "e": "i", "i": "i", "ö": "ü", "ü": "ü"}[last_v]
            add(t, noun + acc_v, noun)
            add(t, noun + acc_v + "n", noun)
    return t


# --------------------------------------------------------------------------
# Greek
# --------------------------------------------------------------------------

# (lemma -ω, imperfect 1sg, aorist 1sg, aorist stem for plural persons)
EL_VERBS = [
    ("γράφω", "έγραφα", "έγραψα", "γράψ"),
    ("παίζω", "έπαιζα", "έπαιξα", "παίξ"),
    ("κάνω", "έκανα", "έκανα", "κάν"),
    ("διαβάζω", "διάβαζα", "διάβασα", "διαβάσ"),
    ("δουλεύω", "δούλευα", "δούλεψα", "δουλέψ"),
    ("μένω", "έμενα", "έμεινα", "μείν"),
    ("στέλνω", "έστελνα", "έστειλα", "στείλ"),
    ("αγοράζω", "αγόραζα", "αγόρασα", "αγοράσ"),
    ("πληρώνω", "πλήρωνα", "πλήρωσα", "πληρώσ"),
    ("ανοίγω", "άνοιγα", "άνοιξα", "ανοίξ"),
    ("κλείνω", "έκλεινα", "έκλεισα", "κλείσ"),
    ("αρχίζω", "άρχιζα", "άρχισα", "αρχίσ"),
    ("τελειώνω", "τελείωνα", "τελείωσα", "τελειώσ"),
    ("μαθαίνω", "μάθαινα", "έμαθα", "μάθ"),
    ("καταλαβαίνω", "καταλάβαινα", "κατάλαβα", "καταλάβ"),
    ("φτάνω", "έφτανα", "έφτασα", "φτάσ"),
    ("αφήνω", "άφηνα", "άφησα", "αφήσ"),
    ("δείχνω", "έδειχνα", "έδειξα", "δείξ"),
    ("ψάχνω", "έψαχνα", "έψαξα", "ψάξ"),
    ("ακούω", "άκουγα", "άκουσα", "ακούσ"),
]
# -άω/-ώ contract verbs: (lemma, 2sg, 3sg, 1pl, 2pl, 3pl, imperfect, aorist)
EL_CONTRACT = [
    ("αγαπώ", "αγαπάς", "αγαπά", "αγαπάμε", "αγαπάτε", "αγαπούν",
     "αγαπούσα", "αγάπησα"),
    ("μιλάω", "μιλάς", "μιλά", "μιλάμε", "μιλάτε", "μιλούν",
     "μιλούσα", "μίλησα"),
    ("ρωτάω", "ρωτάς", "ρωτά", "ρωτάμε", "ρωτάτε", "ρωτούν",
     "ρωτούσα", "ρώτησα"),
    ("ζητάω", "ζητάς", "ζητά", "ζητάμε", "ζητάτε", "ζητούν",
     "ζητούσα", "ζήτησα"),
    ("περπατάω", "περπατάς", "περπατά", "περπατάμε", "περπατάτε",
     "περπατούν", "περπατούσα", "περπάτησα"),
    ("τραγουδάω", "τραγουδάς", "τραγουδά", "τραγουδάμε",
     "τραγουδάτε", "τραγουδούν", "τραγουδούσα", "τραγούδησα"),
]
EL_IRREGULAR = {
    "είμαι": ["είσαι", "είναι", "είμαστε", "είστε", "ήμουν", "ήσουν",
              "ήταν", "ήμασταν", "ήσασταν"],
    "έχω": ["έχεις", "έχει", "έχουμε", "έχετε", "έχουν", "είχα",
            "είχες", "είχε", "είχαμε", "είχατε", "είχαν"],
    "πηγαίνω": ["πηγαίνεις", "πηγαίνει", "πηγαίνουμε", "πηγαίνετε",
                "πηγαίνουν", "πήγαινα", "πήγα", "πήγες", "πήγε",
                "πήγαμε", "πήγατε", "πήγαν"],
    "βλέπω": ["βλέπεις", "βλέπει", "βλέπουμε", "βλέπετε", "βλέπουν",
              "έβλεπα", "είδα", "είδες", "είδε", "είδαμε", "είδατε",
              "είδαν"],
    "λέω": ["λες", "λέει", "λέμε", "λέτε", "λένε", "έλεγα", "είπα",
            "είπες", "είπε", "είπαμε", "είπατε", "είπαν"],
    "τρώω": ["τρως", "τρώει", "τρώμε", "τρώτε", "τρώνε", "έτρωγα",
             "έφαγα", "έφαγες", "έφαγε", "φάγαμε", "φάγατε", "έφαγαν"],
    "δίνω": ["δίνεις", "δίνει", "δίνουμε", "δίνετε", "δίνουν",
             "έδινα", "έδωσα", "έδωσες", "έδωσε", "δώσαμε", "δώσατε",
             "έδωσαν"],
    "παίρνω": ["παίρνεις", "παίρνει", "παίρνουμε", "παίρνετε",
               "παίρνουν", "έπαιρνα", "πήρα", "πήρες", "πήρε",
               "πήραμε", "πήρατε", "πήραν"],
    "ξέρω": ["ξέρεις", "ξέρει", "ξέρουμε", "ξέρετε", "ξέρουν",
             "ήξερα", "ήξερες", "ήξερε", "ξέραμε", "ξέρατε", "ήξεραν"],
    "θέλω": ["θέλεις", "θέλει", "θέλουμε", "θέλετε", "θέλουν",
             "ήθελα", "ήθελες", "ήθελε", "θέλαμε", "θέλατε", "ήθελαν"],
    "μπορώ": ["μπορείς", "μπορεί", "μπορούμε", "μπορείτε", "μπορούν",
              "μπορούσα", "μπόρεσα"],
}

EL_NOUNS = {
    # -ος masculine: plural -οι, acc -ο, gen -ου, acc pl -ους
    "δρόμος": ["δρόμοι", "δρόμο", "δρόμου", "δρόμους", "δρόμων"],
    "άνθρωπος": ["άνθρωποι", "άνθρωπο", "ανθρώπου", "ανθρώπους",
                 "ανθρώπων"],
    "φίλος": ["φίλοι", "φίλο", "φίλου", "φίλους", "φίλων"],
    "κόσμος": ["κόσμο", "κόσμου"],
    "χρόνος": ["χρόνοι", "χρόνο", "χρόνου", "χρόνια", "χρόνων"],
    "τρόπος": ["τρόποι", "τρόπο", "τρόπου", "τρόπους"],
    "λόγος": ["λόγοι", "λόγο", "λόγου", "λόγους", "λόγων"],
    "τόπος": ["τόποι", "τόπο", "τόπου", "τόπους"],
    # feminine -α/-η
    "ημέρα": ["ημέρες", "ημέρας", "ημερών"],
    "ώρα": ["ώρες", "ώρας", "ωρών"],
    "γλώσσα": ["γλώσσες", "γλώσσας", "γλωσσών"],
    "θάλασσα": ["θάλασσες", "θάλασσας"],
    "χώρα": ["χώρες", "χώρας", "χωρών"],
    "δουλειά": ["δουλειές", "δουλειάς"],
    "καρδιά": ["καρδιές", "καρδιάς"],
    "πόλη": ["πόλεις", "πόλης", "πόλεων"],
    "αγάπη": ["αγάπες", "αγάπης"],
    "ζωή": ["ζωές", "ζωής"],
    "αρχή": ["αρχές", "αρχής", "αρχών"],
    "φωνή": ["φωνές", "φωνής", "φωνών"],
    "ερώτηση": ["ερωτήσεις", "ερώτησης", "ερωτήσεων"],
    "απάντηση": ["απαντήσεις", "απάντησης", "απαντήσεων"],
    # neuter -ι/-ο/-μα
    "παιδί": ["παιδιά", "παιδιού", "παιδιών"],
    "σπίτι": ["σπίτια", "σπιτιού", "σπιτιών"],
    "τραπέζι": ["τραπέζια", "τραπεζιού"],
    "βιβλίο": ["βιβλία", "βιβλίου", "βιβλίων"],
    "νερό": ["νερά", "νερού"],
    "χρήμα": ["χρήματα", "χρήματος", "χρημάτων"],
    "όνομα": ["ονόματα", "ονόματος", "ονομάτων"],
    "πράγμα": ["πράγματα", "πράγματος", "πραγμάτων"],
    "μάθημα": ["μαθήματα", "μαθήματος", "μαθημάτων"],
}
_EL_PRES = ["εις", "ει", "ουμε", "ετε", "ουν"]


def build_el() -> dict:
    t: dict = {}
    for lemma, forms in EL_IRREGULAR.items():
        _forms(t, lemma, forms)
    for lemma, imperf, aor, aor_stem in EL_VERBS:
        stem = lemma[:-1]  # minus ω
        _suffixed(t, lemma, stem, _EL_PRES)
        add(t, imperf, lemma)
        add(t, aor, lemma)
        # aorist persons from the sigmatic stem
        _suffixed(t, lemma, aor_stem, ["αμε", "ατε", "ανε"])
        if aor.startswith("έ") or aor.startswith("ά"):
            _suffixed(t, lemma, aor[:-1], ["ες", "ε"])
        # subjunctive/future stem persons
        _suffixed(t, lemma, aor_stem, ["ω", "εις", "ει", "ουμε",
                                       "ετε", "ουν"])
    for row in EL_CONTRACT:
        lemma = row[0]
        _forms(t, lemma, list(row[1:]))
        if lemma.endswith("άω"):
            add(t, lemma[:-2] + "ώ", lemma)  # contracted variant
    for lemma, forms in EL_NOUNS.items():
        _forms(t, lemma, forms)
    return t


# --------------------------------------------------------------------------
# Indonesian
# --------------------------------------------------------------------------

# roots with their meN- form given explicitly (nasal assimilation is
# lexical: baca->membaca, tulis->menulis, kirim->mengirim, ...)
ID_VERBS = [
    ("baca", "membaca"), ("tulis", "menulis"), ("lihat", "melihat"),
    ("beli", "membeli"), ("buat", "membuat"), ("beri", "memberi"),
    ("ambil", "mengambil"), ("kirim", "mengirim"), ("jual", "menjual"),
    ("tonton", "menonton"), ("cari", "mencari"), ("bawa", "membawa"),
    ("masak", "memasak"), ("tunggu", "menunggu"), ("tutup", "menutup"),
    ("buka", "membuka"), ("dengar", "mendengar"), ("jawab", "menjawab"),
    ("minum", "meminum"), ("makan", "memakan"), ("pakai", "memakai"),
    ("bayar", "membayar"), ("simpan", "menyimpan"), ("sewa", "menyewa"),
    ("cuci", "mencuci"), ("potong", "memotong"), ("pilih", "memilih"),
    ("mulai", "memulai"), ("bantu", "membantu"), ("panggil", "memanggil"),
    ("angkat", "mengangkat"), ("hitung", "menghitung"),
    ("gambar", "menggambar"), ("ajar", "mengajar"), ("ubah", "mengubah"),
    ("isi", "mengisi"), ("ikut", "mengikuti"), ("susun", "menyusun"),
    ("terima", "menerima"), ("tanya", "menanyakan"),
]
ID_BER_VERBS = ["bertanya", "berjalan", "berbicara", "bekerja",
                "belajar", "bermain", "berenang", "berlari", "berdiri",
                "berangkat", "berhenti", "berpikir", "bernyanyi",
                "berbelanja", "berlibur", "bertemu", "berharap",
                "bercerita", "berkata", "berubah"]
ID_NOUNS = ["buku", "anak", "orang", "rumah", "mobil", "jalan", "kota",
            "negara", "hari", "tahun", "bulan", "minggu", "kata",
            "pertanyaan", "jawaban", "pintu", "jendela", "kepala",
            "sekolah", "meja", "kursi", "pohon", "bunga", "binatang",
            "kucing", "anjing", "kuda", "burung", "kereta", "jembatan",
            "gereja", "toko", "harga", "angka", "teman", "guru",
            "murid", "pasar", "kantor", "kamar", "makanan", "minuman",
            "pakaian", "sepatu", "topi", "tas", "uang", "waktu",
            "tempat", "barang"]


def build_id() -> dict:
    t: dict = {}
    for root, men in ID_VERBS:
        add(t, men, root)
        add(t, "di" + root, root)
        add(t, men + "kan" if not men.endswith("kan") else men, root)
        add(t, "di" + root + "kan", root)
        add(t, root + "lah", root)
        add(t, root + "nya", root)
        add(t, "ter" + root, root)
    for v in ID_BER_VERBS:
        root = v[3:] if not v.startswith("bel") else v[3:]
        if v == "belajar":
            root = "ajar"
        add(t, v, root)
        add(t, v + "lah", root)
    for n in ID_NOUNS:
        add(t, f"{n}-{n}", n)  # reduplicated plural
        add(t, n + "nya", n)
        add(t, n + "ku", n)
        add(t, n + "mu", n)
    return t


# --------------------------------------------------------------------------
# Tagalog
# --------------------------------------------------------------------------

_TL_VOWELS = "aeiou"


def _tl_um(root: str) -> str:
    """-um- infix after the initial consonant (kain -> kumain); prefixed
    for vowel-initial roots (inom -> uminom)."""
    if root[0] in _TL_VOWELS:
        return "um" + root
    return root[0] + "um" + root[1:]


def _tl_redup(root: str) -> str:
    """first-CV reduplication (kain -> kakain, inom -> iinom)."""
    if root[0] in _TL_VOWELS:
        return root[0] + root
    return root[:2] + root


def _tl_in(root: str) -> str:
    """-in- infix after the initial consonant (bili -> binili); prefixed
    for vowel-initial roots (inom -> ininom)."""
    if root[0] in _TL_VOWELS:
        return "in" + root
    return root[0] + "in" + root[1:]


TL_UM_ROOTS = ["kain", "inom", "bili", "sulat", "takbo", "lakad",
               "basa", "punta", "alis", "dating", "upo", "tayo",
               "sayaw", "kanta", "iyak", "tawa", "langoy", "akyat",
               "baba", "pasok", "labas", "tulog", "gising", "ligo",
               "luto", "bukas", "sara", "tingin", "dinig", "hawak"]
TL_MAG_ROOTS = ["luto", "aral", "trabaho", "laro", "linis", "hugas",
                "bigay", "salita", "tanong", "sagot", "hintay",
                "lakbay", "simula", "tapos", "handa", "bayad",
                "padala", "tanim", "gawa", "ayos"]
TL_NOUNS = ["bahay", "bata", "tao", "araw", "taon", "buwan", "linggo",
            "salita", "tanong", "sagot", "pinto", "bintana", "ulo",
            "paaralan", "mesa", "upuan", "puno", "bulaklak", "hayop",
            "pusa", "aso", "kabayo", "ibon", "tren", "tulay",
            "simbahan", "tindahan", "presyo", "bilang", "kaibigan",
            "guro", "estudyante", "palengke", "opisina", "kuwarto",
            "pagkain", "inumin", "damit", "sapatos", "pera"]


def build_tl() -> dict:
    t: dict = {}
    for root in TL_UM_ROOTS:
        um = _tl_um(root)
        redup = _tl_redup(root)
        add(t, um, root)  # kumain (completed)
        # kumakain (progressive) = infix + redup: k-um-a-kain
        if root[0] in _TL_VOWELS:
            add(t, "um" + redup, root)
        else:
            add(t, root[0] + "um" + redup[1:], root)
        add(t, redup, root)  # kakain (contemplated)
        inf = _tl_in(root)
        add(t, inf, root)  # binili (object focus, completed)
        add(t, _tl_in(redup) if root[0] in _TL_VOWELS else
            redup[0] + "in" + redup[1:], root)  # binibili
        add(t, redup + "in", root)  # bibilhin-ish regular form
        add(t, root + "in", root)
    for root in TL_MAG_ROOTS:
        redup = _tl_redup(root)
        add(t, "mag" + root, root)
        add(t, "nag" + root, root)
        add(t, "nag" + redup, root)
        add(t, "mag" + redup, root)
        add(t, "magpa" + root, root)
        add(t, "pag" + root, root)
    for n in TL_NOUNS:
        add(t, f"mga {n}", n)
        add(t, n + "s" if n.endswith("o") else n, n)
    return t


# --------------------------------------------------------------------------
# Urdu (Arabic script)
# --------------------------------------------------------------------------

# verbs: infinitive ends in نا; stem = infinitive minus نا.  Consonant-stem
# verbs take the mechanical paradigm; vowel-stem verbs list perfectives
# explicitly (glide insertion).
UR_VERBS = ["کرنا", "جانا", "آنا", "دینا", "لینا", "کھانا", "پینا",
            "دیکھنا", "لکھنا", "پڑھنا", "بولنا", "چلنا", "ملنا",
            "رہنا", "سننا", "سمجھنا", "بیٹھنا", "اٹھنا", "سونا",
            "رونا", "ہنسنا", "دوڑنا", "خریدنا", "بیچنا", "بنانا",
            "پکانا", "کھیلنا", "سیکھنا", "سکھانا", "بتانا", "پوچھنا",
            "کہنا", "رکھنا", "ڈالنا", "مانگنا", "بھیجنا", "پہننا",
            "اترنا", "چڑھنا", "گرنا"]
_UR_VOWEL_FINAL = set("اآویے")
UR_IRREG_PERF = {
    "کرنا": ["کیا", "کی", "کیے", "کئے"],
    "جانا": ["گیا", "گئی", "گئے"],
    "دینا": ["دیا", "دی", "دیے", "دئے"],
    "لینا": ["لیا", "لی", "لیے", "لئے"],
    "ہونا": ["ہوا", "ہوئی", "ہوئے", "ہے", "ہیں", "تھا", "تھی",
             "تھے", "تھیں", "ہو", "ہوں", "ہوگا", "ہوگی", "ہوگے"],
    "آنا": ["آیا", "آئی", "آئے"],
    "کھانا": ["کھایا", "کھائی", "کھائے"],
    "پینا": ["پیا", "پی", "پیے"],
    "سونا": ["سویا", "سوئی", "سوئے"],
    "رونا": ["رویا", "روئی", "روئے"],
    "بنانا": ["بنایا", "بنائی", "بنائے"],
    "پکانا": ["پکایا", "پکائی", "پکائے"],
    "سکھانا": ["سکھایا", "سکھائی", "سکھائے"],
    "بتانا": ["بتایا", "بتائی", "بتائے"],
}

UR_NOUN_PLURALS = {
    "لڑکے": "لڑکا", "لڑکوں": "لڑکا", "کتابیں": "کتاب",
    "کتابوں": "کتاب", "آدمیوں": "آدمی", "عورتیں": "عورت",
    "عورتوں": "عورت", "بچے": "بچہ", "بچوں": "بچہ", "گھروں": "گھر",
    "دنوں": "دن", "سالوں": "سال", "باتیں": "بات", "باتوں": "بات",
    "سوالوں": "سوال", "جوابوں": "جواب", "دروازے": "دروازہ",
    "دروازوں": "دروازہ", "کھڑکیاں": "کھڑکی", "کھڑکیوں": "کھڑکی",
    "سکولوں": "سکول", "میزیں": "میز", "میزوں": "میز",
    "کرسیاں": "کرسی", "کرسیوں": "کرسی", "درختوں": "درخت",
    "پھولوں": "پھول", "جانوروں": "جانور", "بلیاں": "بلی",
    "بلیوں": "بلی", "کتوں": "کتا", "کتے": "کتا", "گھوڑے": "گھوڑا",
    "گھوڑوں": "گھوڑا", "پرندوں": "پرندہ", "پرندے": "پرندہ",
    "راستے": "راستہ", "راستوں": "راستہ", "دکانوں": "دکان",
    "دکانیں": "دکان", "قیمتیں": "قیمت", "قیمتوں": "قیمت",
    "دوستوں": "دوست", "استادوں": "استاد", "کمروں": "کمرہ",
    "کمرے": "کمرہ", "کپڑے": "کپڑا", "کپڑوں": "کپڑا",
    "جوتے": "جوتا", "جوتوں": "جوتا", "پیسے": "پیسہ",
    "پیسوں": "پیسہ", "جگہوں": "جگہ", "جگہیں": "جگہ",
    "چیزیں": "چیز", "چیزوں": "چیز", "شہروں": "شہر", "ہاتھوں": "ہاتھ",
    "آنکھیں": "آنکھ", "آنکھوں": "آنکھ", "ناموں": "نام",
}


def build_ur() -> dict:
    t: dict = {}
    for lemma, forms in UR_IRREG_PERF.items():
        _forms(t, lemma, forms)
    for inf in UR_VERBS:
        stem = inf[:-2]  # minus نا
        # habitual + progressive-participle + imperative + subjunctive
        _suffixed(t, inf, stem,
                  ["تا", "تی", "تے", "تیں", "و", "یں", "ے", "وں",
                   "نے", "نی"])
        # perfective only for consonant-final stems (no glide needed)
        if stem and stem[-1] not in _UR_VOWEL_FINAL and inf not in UR_IRREG_PERF:
            _suffixed(t, inf, stem, ["ا", "ی", "یں"])
    for f, lemma in UR_NOUN_PLURALS.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Bengali
# --------------------------------------------------------------------------

# consonant-stem verbs: lemma = verbal noun in -া; stem = lemma minus া
BN_VERBS = ["করা", "বলা", "দেখা", "শোনা", "লেখা", "পড়া", "চলা",
            "বসা", "থাকা", "জানা", "ভাবা", "বোঝা", "শেখা", "খেলা",
            "হাসা", "কাঁদা", "কেনা", "বেচা", "ধরা", "ছাড়া", "মারা",
            "মরা", "ফেরা", "ঘোরা", "ডাকা", "রাখা", "পরা", "চালানো",
            "বানানো", "দেখানো", "শেখানো", "পাঠানো"]
_BN_ENDINGS = ["ি", "ে", "েন", "িস", "ছি", "ছে", "ছেন", "ছিস",
               "ছিলাম", "ছিলে", "ছিল", "ছিলেন", "লাম", "লে", "ল",
               "লেন", "েছি", "েছে", "েছেন", "ব", "বে", "বেন", "বি",
               "তাম", "তে", "ত", "তেন"]
BN_IRREGULAR = {
    "হওয়া": ["হই", "হয়", "হন", "হচ্ছি", "হচ্ছে", "হলাম", "হলে",
             "হল", "হলেন", "হয়েছি", "হয়েছে", "হব", "হবে", "হবেন",
             "ছিলাম", "ছিল", "ছিলেন", "আছি", "আছে", "আছেন", "আছ"],
    "যাওয়া": ["যাই", "যায়", "যান", "যাচ্ছি", "যাচ্ছে", "যাচ্ছেন",
              "গেলাম", "গেলে", "গেল", "গেলেন", "গিয়েছি", "গিয়েছে",
              "গেছি", "গেছে", "গেছেন", "যাব", "যাবে", "যাবেন"],
    "আসা": ["আসি", "আসে", "আসেন", "আসছি", "আসছে", "এলাম", "এলে",
            "এল", "এলেন", "এসেছি", "এসেছে", "এসেছেন", "আসব",
            "আসবে", "আসবেন"],
    "খাওয়া": ["খাই", "খায়", "খান", "খাচ্ছি", "খাচ্ছে", "খেলাম",
              "খেলে", "খেল", "খেয়েছি", "খেয়েছে", "খাব", "খাবে",
              "খাবেন"],
    "দেওয়া": ["দিই", "দেয়", "দেন", "দিচ্ছি", "দিচ্ছে", "দিলাম",
              "দিলে", "দিল", "দিলেন", "দিয়েছি", "দিয়েছে", "দেব",
              "দেবে", "দেবেন"],
    "নেওয়া": ["নিই", "নেয়", "নেন", "নিচ্ছি", "নিচ্ছে", "নিলাম",
              "নিলে", "নিল", "নিলেন", "নিয়েছি", "নিয়েছে", "নেব",
              "নেবে", "নেবেন"],
    "পাওয়া": ["পাই", "পায়", "পান", "পাচ্ছি", "পাচ্ছে", "পেলাম",
              "পেলে", "পেল", "পেয়েছি", "পেয়েছে", "পাব", "পাবে",
              "পাবেন"],
}

BN_NOUN_FORMS = {
    "ছেলেরা": "ছেলে", "মেয়েরা": "মেয়ে", "লোকেরা": "লোক",
    "মানুষেরা": "মানুষ", "বইগুলো": "বই", "বইগুলি": "বই",
    "ঘরগুলো": "ঘর", "দিনগুলো": "দিন", "বছরগুলো": "বছর",
    "কথাগুলো": "কথা", "প্রশ্নগুলো": "প্রশ্ন", "উত্তরগুলো": "উত্তর",
    "দরজাগুলো": "দরজা", "জানালাগুলো": "জানালা",
    "স্কুলগুলো": "স্কুল", "টেবিলগুলো": "টেবিল", "চেয়ারগুলো": "চেয়ার",
    "গাছগুলো": "গাছ", "ফুলগুলো": "ফুল", "পশুগুলো": "পশু",
    "বিড়ালগুলো": "বিড়াল", "কুকুরগুলো": "কুকুর", "ঘোড়াগুলো": "ঘোড়া",
    "পাখিগুলো": "পাখি", "ট্রেনগুলো": "ট্রেন", "রাস্তাগুলো": "রাস্তা",
    "দোকানগুলো": "দোকান", "দামগুলো": "দাম", "সংখ্যাগুলো": "সংখ্যা",
    "বন্ধুরা": "বন্ধু", "শিক্ষকেরা": "শিক্ষক", "ছাত্ররা": "ছাত্র",
    "শহরগুলো": "শহর", "হাতগুলো": "হাত", "চোখগুলো": "চোখ",
    "নামগুলো": "নাম", "জিনিসগুলো": "জিনিস", "জায়গাগুলো": "জায়গা",
}


def build_bn() -> dict:
    t: dict = {}
    for lemma, forms in BN_IRREGULAR.items():
        _forms(t, lemma, forms)
    for lemma in BN_VERBS:
        if lemma.endswith("ানো"):
            stem = lemma[:-2]  # চালানো -> চালা
            _suffixed(t, lemma, stem,
                      ["ই", "য়", "ন", "চ্ছি", "চ্ছে", "লাম", "ল",
                       "লেন", "ব", "বে", "বেন"])
        else:
            stem = lemma[:-1]  # minus া
            _suffixed(t, lemma, stem, _BN_ENDINGS)
    for f, lemma in BN_NOUN_FORMS.items():
        add(t, f, lemma)
    return t


# --------------------------------------------------------------------------
# Persian (Farsi)
# --------------------------------------------------------------------------

# (infinitive, present stem); past stem = infinitive minus ن
FA_VERBS = [
    ("رفتن", "رو"), ("آمدن", "آ"), ("گفتن", "گو"), ("دیدن", "بین"),
    ("خوردن", "خور"), ("کردن", "کن"), ("شدن", "شو"), ("دادن", "ده"),
    ("گرفتن", "گیر"), ("خواندن", "خوان"), ("نوشتن", "نویس"),
    ("دانستن", "دان"), ("خواستن", "خواه"), ("توانستن", "توان"),
    ("زدن", "زن"), ("بردن", "بر"), ("آوردن", "آور"), ("رسیدن", "رس"),
    ("ماندن", "مان"), ("نشستن", "نشین"), ("ایستادن", "ایست"),
    ("فروختن", "فروش"), ("خریدن", "خر"), ("ساختن", "ساز"),
    ("انداختن", "انداز"), ("شنیدن", "شنو"), ("پرسیدن", "پرس"),
    ("دویدن", "دو"), ("خوابیدن", "خواب"), ("ترسیدن", "ترس"),
    ("داشتن", "دار"), ("گذشتن", "گذر"), ("افتادن", "افت"),
    ("شکستن", "شکن"), ("بستن", "بند"), ("جستن", "جو"),
]
_FA_PERSONS = ["م", "ی", "یم", "ید", "ند"]
_ZWNJ = "‌"

FA_NOUN_FORMS = {}
for _n in ["کتاب", "خانه", "مرد", "زن", "بچه", "روز", "سال", "ماه",
           "هفته", "سخن", "پرسش", "پاسخ", "در", "پنجره", "سر",
           "مدرسه", "میز", "صندلی", "درخت", "گل", "حیوان", "گربه",
           "سگ", "اسب", "پرنده", "قطار", "راه", "پل", "مغازه",
           "قیمت", "شماره", "دوست", "معلم", "دانشجو", "بازار",
           "دفتر", "اتاق", "غذا", "لباس", "کفش", "پول", "زمان",
           "جا", "چیز", "شهر", "دست", "چشم", "نام"]:
    FA_NOUN_FORMS[_n + "ها"] = _n
    FA_NOUN_FORMS[_n + _ZWNJ + "ها"] = _n
FA_NOUN_FORMS["مردان"] = "مرد"
FA_NOUN_FORMS["زنان"] = "زن"
FA_NOUN_FORMS["دوستان"] = "دوست"
FA_NOUN_FORMS["معلمان"] = "معلم"
FA_NOUN_FORMS["درختان"] = "درخت"
FA_NOUN_FORMS["پرندگان"] = "پرنده"


def build_fa() -> dict:
    t: dict = {}
    for inf, pres in FA_VERBS:
        past = inf[:-1]  # minus ن
        add(t, past, inf)
        _suffixed(t, inf, past, _FA_PERSONS)
        # imperfect می‌ + past (ZWNJ-joined, one token)
        add(t, "می" + _ZWNJ + past, inf)
        for p in _FA_PERSONS:
            add(t, "می" + _ZWNJ + past + p, inf)
        # present می‌ + present stem + persons (3sg = bare -د)
        add(t, "می" + _ZWNJ + pres + "د", inf)
        for p in _FA_PERSONS:
            add(t, "می" + _ZWNJ + pres + p, inf)
        # subjunctive ب + present stem
        add(t, "ب" + pres + "د", inf)
        for p in _FA_PERSONS:
            add(t, "ب" + pres + p, inf)
        # perfect participle + 3sg perfect
        add(t, past + "ه", inf)
        add(t, past + "ه" + _ZWNJ + "ام", inf)
        add(t, past + "ه" + _ZWNJ + "ای", inf)
        add(t, past + "ه" + _ZWNJ + "اند", inf)
    for f, lemma in FA_NOUN_FORMS.items():
        add(t, f, lemma)
    return t

if __name__ == "__main__":
    main()
