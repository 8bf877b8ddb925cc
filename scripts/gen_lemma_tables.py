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
# approximate the dominant regular paradigms (past tense + the clean
# present-tense classes) for a curated high-frequency verb list, exactly
# like the other generators: conservative, identity on anything unlisted.

# Polish past stem = infinitive minus 'ć'; -eć verbs shift e->a in the
# singular/non-virile forms but keep e in the virile plural (widzieć ->
# widział / widzieli).
PL_REGULAR_VERBS = [
    # -ać (and prefixed forms); present -am class added for bare -ać stems
    "działać", "zadziałać", "czytać", "mieszkać", "pytać", "zapytać",
    "słuchać", "oglądać", "otwierać", "zamykać", "zaczynać", "kochać",
    "szukać", "pamiętać", "opowiadać", "pomagać", "sprzątać", "spotykać",
    "czekać", "grać", "zagrać", "przepraszać", "odwiedzać", "zwiedzać",
    # -ić / -yć
    "robić", "zrobić", "mówić", "lubić", "uczyć", "nauczyć", "kończyć",
    "skończyć", "tańczyć", "liczyć", "palić", "dzwonić", "zadzwonić",
    "prosić", "poprosić", "płacić", "zapłacić",
    # -eć (e->a shift handled)
    "widzieć", "słyszeć", "myśleć", "siedzieć", "leżeć", "woleć",
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
        # present tense, only for the unambiguous -ać/-am class
        if inf.endswith("ać"):
            pres = inf[:-1]  # picka 'działa'
            for suf in ("m", "sz", "", "my", "cie", "ją"):
                add(t, pres + suf, inf)
    return t


# Russian: past = infinitive minus 'ть' + л/ла/ло/ли (reliable for -ать/
# -ять/-еть/-ить); present only for the clean first-conjugation -ать/-ять
# class (stem + ю/ешь/ет/ем/ете/ют).
RU_PAST_VERBS = [
    "работать", "делать", "сделать", "думать", "знать", "читать",
    "прочитать", "играть", "слушать", "спрашивать", "отвечать",
    "понимать", "начинать", "покупать", "открывать", "закрывать",
    "рассказывать", "показывать", "помогать", "гулять", "терять",
    "менять", "мечтать", "решать", "решить", "говорить", "смотреть",
    "видеть", "слышать", "держать", "лежать", "сидеть", "звонить",
    "позвонить", "строить", "готовить", "ставить", "учить", "выучить",
]
RU_PRESENT_ACLASS = [
    "работать", "делать", "думать", "знать", "читать", "играть",
    "слушать", "спрашивать", "отвечать", "понимать", "начинать",
    "покупать", "открывать", "закрывать", "рассказывать", "показывать",
    "помогать", "гулять", "терять", "менять", "мечтать", "решать",
]
RU_IRREGULARS = [
    ("быть", "был", "была", "было", "были", "есть", "будет", "будут"),
    ("идти", "шёл", "шла", "шло", "шли", "идёт", "идут"),
    ("мочь", "мог", "могла", "могло", "могли", "может", "могут"),
    ("хотеть", "хотел", "хотела", "хотело", "хотели", "хочет", "хотят"),
    ("жить", "жил", "жила", "жило", "жили", "живёт", "живут"),
]


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
    return t


def main() -> None:
    built = {"en": build_en(), "fr": build_fr(), "de": build_de(),
             "es": build_es(), "pl": build_pl(), "ru": build_ru()}
    # the remaining lookup languages keep their (fixture-backed) tables;
    # the 6 with no file yet get an explicit empty table — identity
    # behavior, matching the reference fixtures for those languages, and a
    # documented plug-point for full tables via RAYKG_LEMMA_DIR
    for lang in ("bn", "el", "fa", "nb", "nl", "tl"):
        path = os.path.join(OUT_DIR, f"{lang}.json")
        if not os.path.exists(path):
            with open(path, "w", encoding="utf-8") as f:
                json.dump({}, f)
    for lang, table in built.items():
        path = os.path.join(OUT_DIR, f"{lang}.json")
        existing = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                existing = json.load(f)
        table.update(existing)  # fixture entries win
        with open(path, "w", encoding="utf-8") as f:
            json.dump(table, f, ensure_ascii=False, indent=0, sort_keys=True)
        print(f"{lang}: {len(table)} entries")


if __name__ == "__main__":
    main()
