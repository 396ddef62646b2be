"""Snowball English ("Porter2") — replays the reference's
``TestSnowball.testEnglish`` expectation (abhorred->abhor, accents->accent,
``analysis/common/src/test/.../snowball/TestSnowball.java:41``) plus a
hand-traced vector set exercising every step of the published algorithm
(exception lists, 1a plural rules, 1b undoubling/e-restore, 1c y->i,
R1/R2 suffix maps, step-5 e/l deletion, gener/commun/arsen R1 overrides)."""

import pytest

from lucene_spark.analysis.snowball import english_snowball_stem, snowball_stem

VECTORS = {
    # TestSnowball.testEnglish
    "he": "he", "abhorred": "abhor", "accents": "accent",
    # step 0 / exceptions
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "ugly": "ugli", "early": "earli", "only": "onli", "news": "news",
    "bias": "bias", "inning": "inning", "proceed": "proceed",
    # 1a
    "flies": "fli", "dies": "die", "ties": "tie", "cries": "cri",
    "gas": "gas", "this": "this", "gaps": "gap", "kiwis": "kiwi",
    "meetings": "meet",
    # 1b incl. undoubling / e-restore / short-word rule
    "agreed": "agre", "feed": "feed", "hoping": "hope", "hopping": "hop",
    "luxuriated": "luxuri", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "falling": "fall", "fizzing": "fizz",
    "failing": "fail", "filing": "file", "exceeding": "exceed",
    # 1c
    "cry": "cri", "by": "by", "say": "say",
    # steps 2-5
    "consolation": "consol", "generously": "generous",
    "generation": "generat", "national": "nation", "rational": "ration",
    "sensational": "sensat", "conditional": "condit",
    "happiness": "happi", "goodness": "good", "radically": "radic",
    "hopefulness": "hope", "adjustable": "adjust", "formalize": "formal",
    "electrical": "electr", "dependent": "depend", "adoption": "adopt",
    "adopted": "adopt", "roll": "roll", "meeting": "meet",
    "cement": "cement", "communism": "communism", "arsenal": "arsenal",
}


@pytest.mark.parametrize("word,stem", sorted(VECTORS.items()))
def test_porter2_vectors(word, stem):
    assert english_snowball_stem(word) == stem


def test_snowball_language_lookup():
    assert snowball_stem("English")("accents") == "accent"
    # 'Porter' is the ORIGINAL algorithm: it differs from Porter2 here
    assert snowball_stem("Porter")("abhorred") == "abhor"
    with pytest.raises(NotImplementedError):
        snowball_stem("Klingon")


def test_filtered_analyzer_snowball_chain():
    from lucene_spark.analysis.filters import FilteredAnalyzer

    a = FilteredAnalyzer(filters=("snowball_en",))
    assert a.terms("he abhorred accents") == ["he", "abhor", "accent"]


# ---------------------------------------------------------------------------
# Round-4: German / French / Dutch / Russian — hand-traced per-step vectors
# of the published snowballstem.org algorithm descriptions (no vocabulary
# fixtures exist in the reference tree, only snowball/languages.txt; the
# spec texts' own worked examples are included and marked).

from lucene_spark.analysis.snowball import (  # noqa: E402
    dutch_snowball_stem,
    french_snowball_stem,
    german_snowball_stem,
    russian_snowball_stem,
)

DE_VECTORS = {
    # spec worked example: group-(b) deletion exposing 'niss'
    "bedürfnissen": "bedurfnis",
    # step 1 groups: ern/er/em | e/en/es | s with valid s-ending
    "kinder": "kind", "kindern": "kind", "grenzen": "grenz",
    "häuser": "haus", "kategorie": "kategori", "aufeinander": "aufeinand",
    "ausgefeilteres": "ausgefeilt",
    # ß -> ss, umlaut postlude
    "abschließen": "abschliess", "verständnis": "verstandnis",
    # 'em' blocked after 'syst'
    "system": "system", "systematisch": "systemat",
    # step 3 needs R2 — 'heit' here is NOT in R2
    "schönheit": "schonheit",
    # step 3 'lich' must lie in R2 — here it does not, steps 1-2 only
    "freundlicheren": "freundlich",
    # step 3 keit chain: keit in R2 deletes, then the exposed lich too
    "wunderlichkeiten": "wunder",
    # R1 floor of 3 letters keeps short stems intact
    "ehe": "ehe", "keit": "keit",
    # u between vowels is a consonant (no R1 vowel-pair across it)
    "bauen": "bau",
}


@pytest.mark.parametrize("word,stem", sorted(DE_VECTORS.items()))
def test_german_snowball(word, stem):
    assert german_snowball_stem(word) == stem


FR_VECTORS = {
    # spec worked examples: -ement deletion + step-5 undoubling
    "continuellement": "continuel", "traditionnellement": "traditionnel",
    # -ement preceded by eus in R2
    "majestueusement": "majestu",
    # ation/ateur family with ic -> iqU handling
    "justification": "justif", "citations": "citat",
    # aux -> al in R1; eaux -> eau always
    "nationaux": "national", "tableaux": "tableau",
    # euse: delete in R2 (not the R1 eux fallback here)
    "dangereuse": "danger",
    # issement after a non-vowel in R1
    "investissement": "invest",
    # step 2a verb endings after non-vowel in RV
    "finissions": "fin", "punissait": "pun",
    # step 2b é-group and a-group (with preceding-e eating)
    "chanterions": "chant", "mangeassent": "mang",
    # step 4: s-removal then ion after t in R2
    "conditions": "condit",
    # step 6 un-accent before trailing non-vowels
    "procéder": "proced",
    # ité: delete in R2, abil -> abl fallback out of R2
    "possibilité": "possibil", "qualités": "qualit",
    # logie -> log
    "technologie": "technolog",
    # no change at all: step 4 e-removal in RV only
    "jouer": "jou",
}


@pytest.mark.parametrize("word,stem", sorted(FR_VECTORS.items()))
def test_french_snowball(word, stem):
    assert french_snowball_stem(word) == stem


NL_VECTORS = {
    # spec worked examples: lijk chain + repeated step 2
    "lichamelijk": "licham", "lichamelijke": "licham",
    "opheffen": "opheff",
    # step 1 en with undoubling; s with valid s-ending (not after j)
    "gekken": "gek", "boeken": "boek", "appels": "appel",
    "baais": "baais",
    # heden -> heid (R1), then heid deletion needs R2
    "mogelijkheden": "mogelijk",
    # step 2 e-removal + undouble, enabling step-3b 'bar'
    "eetbare": "eetbar",
    # step 4 vowel undoubling CVD
    "groot": "grot", "gebiedsdeel": "gebiedsdel",
    # accents fold first
    "geïntroduceerd": "geintroduceerd",
    # i between vowels is a consonant mark, restored in the postlude
    "draaien": "draai",
}


@pytest.mark.parametrize("word,stem", sorted(NL_VECTORS.items()))
def test_dutch_snowball(word, stem):
    assert dutch_snowball_stem(word) == stem


RU_VECTORS = {
    # spec worked example: adjective ending + step-4 superlative
    "важнейшими": "важн",
    # reflexive + verb group 1 (а stays)
    "закрывается": "закрыва",
    # noun endings
    "книгами": "книг", "новости": "новост", "учителей": "учител",
    # verb group 1/2
    "читал": "чита", "говорит": "говор",
    # perfective gerund group 2 beats shorter group 1 (longest match)
    "прочитавшись": "прочита",
    # group-1 gerund without preceding а/я fails the WHOLE among
    # (no fallback to shorter entries) — noun 'в'? not an ending; word
    # keeps its ending until the noun pass handles 'и'
    "держави": "держав",
    # step 2 final и, step 3 derivational ость in R2
    "возможности": "возможн",
    # нн undoubling
    "странно": "стран",
    # ё folds to е; RV is empty for a word whose only vowel is final
    "всё": "все",
}


@pytest.mark.parametrize("word,stem", sorted(RU_VECTORS.items()))
def test_russian_snowball(word, stem):
    assert russian_snowball_stem(word) == stem


def test_snowball_language_lookup_round4():
    assert snowball_stem("German")("kinder") == "kind"
    assert snowball_stem("German2")("kinder") == "kind"
    assert snowball_stem("French")("continuellement") == "continuel"
    # "Dutch" is the 2024-revised algorithm (like the reference's
    # SnowballFilter name resolution); the classic one is Dutch_porter
    assert snowball_stem("Dutch")("opheffen") == "ophef"
    assert snowball_stem("Dutch_porter")("opheffen") == "opheff"
    assert snowball_stem("Russian")("книгами") == "книг"


def test_filtered_analyzer_round4_chains():
    from lucene_spark.analysis.filters import FilteredAnalyzer

    assert FilteredAnalyzer(filters=("snowball_de",)).terms(
        "die kinder der häuser"
    ) == ["die", "kind", "der", "haus"]
    assert FilteredAnalyzer(filters=("snowball_fr",)).terms(
        "continuellement majestueusement"
    ) == ["continuel", "majestu"]
    assert FilteredAnalyzer(filters=("snowball_nl",)).terms(
        "lichamelijke boeken"
    ) == ["licham", "boek"]
    assert FilteredAnalyzer(filters=("snowball_ru",)).terms(
        "книгами важнейшими"
    ) == ["книг", "важн"]


from lucene_spark.analysis.snowball import (  # noqa: E402
    danish_snowball_stem,
    norwegian_snowball_stem,
    swedish_snowball_stem,
)

SV_VECTORS = {
    # step 1 a-list (definite plurals / superlatives)
    "bilarna": "bil", "flickorna": "flick", "klockorna": "klock",
    "jakten": "jakt", "starkast": "stark",
    # s with valid s-ending; -et is NOT a Swedish suffix
    "husets": "huset",
    # step 2 consonant shortening gated on R1 ('tt' here is NOT in R1)
    "tröttast": "trött",
    # step 2 + step 3 chain
    "möjligt": "möj",
    # step 3 replacements
    "meningslöst": "meningslös", "kraftfullt": "kraftfull",
}


@pytest.mark.parametrize("word,stem", sorted(SV_VECTORS.items()))
def test_swedish_snowball(word, stem):
    assert swedish_snowball_stem(word) == stem


NO_VECTORS = {
    "hundene": "hund", "hetene": "het", "bankens": "bank",
    "vaskes": "vask",
    # erte/ert -> er
    "varierte": "varier",
    # step 1 then step 3 lig
    "billige": "bil",
    # step 2 'dt' must lie in R1 (here it does not)
    "godt": "godt",
    # k as s-ending only when not after a vowel
    "bakkens": "bakk",
}


@pytest.mark.parametrize("word,stem", sorted(NO_VECTORS.items()))
def test_norwegian_snowball(word, stem):
    assert norwegian_snowball_stem(word) == stem


DA_VECTORS = {
    # spec worked example: e + els + undouble
    "bestemmelse": "bestem",
    "undersøgelse": "undersøg",
    # igst head rule then lig
    "venligst": "ven", "billigst": "bil",
    # step 2 gt then step 3 lig
    "dejligt": "dej",
    "hundens": "hund",
    # løst -> løs
    "pålidelighedsløst": "pålidelighedsløs",
}


@pytest.mark.parametrize("word,stem", sorted(DA_VECTORS.items()))
def test_danish_snowball(word, stem):
    assert danish_snowball_stem(word) == stem


def test_snowball_scandinavian_lookup():
    assert snowball_stem("Swedish")("bilarna") == "bil"
    assert snowball_stem("Norwegian")("hundene") == "hund"
    assert snowball_stem("Danish")("bestemmelse") == "bestem"


from lucene_spark.analysis.snowball import spanish_snowball_stem  # noqa: E402

ES_VECTORS = {
    # verb suffixes in RV
    "cantando": "cant", "comiendo": "com", "hablaría": "habl",
    # step 0 attached pronoun after an accented gerund marker
    "cantándoselo": "cant",
    # y-verbs after u
    "construyendo": "constru",
    # standard suffixes: ismo / ación (with de-accent) / ador+es
    "nacionalismo": "nacional", "organización": "organiz",
    "trabajadores": "trabaj",
    # amente in R1 vs mente in R2; ic pre-suffix gated on R2
    "felizmente": "feliz", "lógicamente": "logic", "rápidamente": "rapid",
    # idad chain, then the UNCONDITIONAL step-3 residual 'os'
    "generosidades": "gener",
    # residual vowels
    "niños": "niñ", "importante": "import",
}


@pytest.mark.parametrize("word,stem", sorted(ES_VECTORS.items()))
def test_spanish_snowball(word, stem):
    assert spanish_snowball_stem(word) == stem


def test_snowball_spanish_lookup():
    assert snowball_stem("Spanish")("cantando") == "cant"


from lucene_spark.analysis.snowball import italian_snowball_stem  # noqa: E402

IT_VECTORS = {
    # step 1 families
    "abbandonata": "abbandon", "organizzazione": "organizz",
    "nazionalismo": "nazional", "felicità": "felic",
    "rapidamente": "rapid", "pericolosa": "pericol",
    "importante": "import",
    # step 0 pronoun after a gerund marker, then verb suffix + 3a chain
    "mangiandolo": "mang",
    # step 2 verb suffixes in RV
    "cantando": "cant", "parlare": "parl",
    # step 3a final vowel (+ preceding i), then 3b ch -> c — gioco and
    # giochi conflate, crocchio passes through crocch to crocc
    "giochi": "gioc", "gioco": "gioc", "crocchio": "crocc",
    "baci": "bac",
}


@pytest.mark.parametrize("word,stem", sorted(IT_VECTORS.items()))
def test_italian_snowball(word, stem):
    assert italian_snowball_stem(word) == stem


def test_snowball_italian_lookup():
    assert snowball_stem("Italian")("cantando") == "cant"


from lucene_spark.analysis.snowball import portuguese_snowball_stem  # noqa: E402

PT_VECTORS = {
    # ção family (ã marked as a~ internally)
    "organização": "organiz", "trabalhadores": "trabalh",
    # amente in R1 / mente in R2
    "felizmente": "feliz", "rapidamente": "rapid",
    "nacionalismo": "nacional", "importante": "import",
    # verb + residual suffixes in RV
    "cantando": "cant", "falar": "fal", "meninos": "menin",
    "bonecas": "bonec",
    # residual o-deletion leaves the marked ã; acute accents are KEPT
    # (Portuguese postlude only unmarks a~/o~, unlike Spanish)
    "proposição": "proposiçã", "quilométricas": "quilométr",
}


@pytest.mark.parametrize("word,stem", sorted(PT_VECTORS.items()))
def test_portuguese_snowball(word, stem):
    assert portuguese_snowball_stem(word) == stem


def test_snowball_portuguese_lookup():
    assert snowball_stem("Portuguese")("cantando") == "cant"


# -------------------------------------------------------------- Romanian
# Suffix tables and step conditions verified against the reference's
# generated program (org/tartarus/snowball/ext/RomanianStemmer.java:
# a_2 plurals, a_3 combining, a_4 standard incl. the tiune->t and
# ist-marker cases, a_5 verb groups with the consonant-or-u gate, a_6
# final vowel, I/U prelude + postlude, cedilla normalization).

RO_VECTORS = {
    # step 0 plural/article (R1)
    "copilul": "copil", "copilului": "copil",
    "copiilor": "cop",           # iilor->i, then final-vowel i in RV
    # combining suffixes repeat to fixpoint (R1)
    "contabilitate": "contabil", "contabilități": "contabil",
    # standard suffixes (R2)
    "electronic": "electron", "electronică": "electron",
    "abandonate": "abandon",
    "constituțiune": "constitut",   # iune preceded by ț -> t
    "fracționist": "fracționist",   # ist -> ist marker (removal-flag set)
    # verb suffixes (RV; group 1 needs consonant/u before)
    "lucrează": "lucr", "mergeam": "merg", "cântați": "cânt",
    "abandonaseră": "abandon",
    # final vowel (RV)
    "casă": "cas", "masa": "mas", "cartea": "cart",
    # prelude marks intervocalic i/u as consonants
    "ploaie": "ploai", "femeie": "femei",
    # cedilla forms normalize to comma-below before stemming
    "staţiune": "stațiun",
    # R2 too short -> oasă/oși survive on 2-syllable words
    "frumoasă": "frumoas", "frumoși": "frumoș",
}


@pytest.mark.parametrize("word,stem", sorted(RO_VECTORS.items()))
def test_romanian_snowball(word, stem):
    assert snowball_stem("Romanian")(word) == stem


# --------------------------------------------------------------- Finnish
# Tables a_0..a_9, the vowel groupings (V1 incl. y, V2 without, AEI,
# the consonant set, particle_end = vowels + n t) and the window
# semantics of the conditional Amongs (VI/LONG inside the R1-limited
# find_among_b; the switch-case preceded-by checks unrestricted)
# verified against org/tartarus/snowball/ext/FinnishStemmer.java.

FI_VECTORS = {
    # case endings + tidy
    "kirjasta": "kirj", "kirja": "kirj", "kirjan": "kirj",
    "taloissa": "talo", "talo": "talo",
    "talojen": "talo",            # n-del, AEI-tidy, oj-tidy chain
    "tyttönä": "tytö", "tyttö": "tytö",   # double-consonant undoubling
    # possessive + case + i-plural
    "edeltäjistään": "edeltäj", "edeltäjiinsä": "edeltäj",
    # particles
    "olisiko": "oli",             # ko particle, then si possessive
    "taloineenkin": "talo",       # kin particle, ine case, n ending
    # t-plural + imma/mma in R2 + tidy
    "kauneimmat": "kauneim", "suurimmat": "suurim",
    # n + long-vowel extension, then kk undoubling
    "kaikkiaan": "kaikia",
    # seen after long vowel (conditional Among)
    "lukuun": "luku",
    # sti needs R2 -> survives here; final i drops in tidy
    "nopeasti": "nopeast",
    "järjestelmä": "järjestelm", "järjestelmässä": "järjestelm",
    "oikeus": "oikeus", "oikeudet": "oikeud",
}


@pytest.mark.parametrize("word,stem", sorted(FI_VECTORS.items()))
def test_finnish_snowball(word, stem):
    assert snowball_stem("Finnish")(word) == stem


# -------------------------------------------------------------- Hungarian
# Tables a_0..a_10, the vowel-start/consonant-start R1 definition and the
# double-consonant undoubling (incl. trigraph doubles like zz+s) verified
# against org/tartarus/snowball/ext/HungarianStemmer.java.

HU_VECTORS = {
    # case endings + á/é -> a/e v_ending
    "babát": "bab", "babák": "baba", "házakban": "ház",
    "számítógépeken": "számítógép",
    # instrumental with undoubling
    "tollal": "tol", "kézzel": "kéz",
    # factive with undoubling
    "várossá": "város", "könyvvé": "könyv",
    # plural / owned / sing_owner / plur_owner
    "házak": "ház", "házam": "ház", "házaim": "ház",
    "házaikban": "ház", "almájuk": "alma", "barátaimé": "barát",
    # case_special accented forms
    "magyarán": "magyar", "ajtóján": "ajtó",
    # the algorithm's own over-stemming on short a-finals is pinned
    # (find_among_b takes 'ba' with R1 at 2 — the generated program
    # does exactly this)
    "baba": "ba",
    "ház": "ház", "városi": "város", "városok": "város",
}


@pytest.mark.parametrize("word,stem", sorted(HU_VECTORS.items()))
def test_hungarian_snowball(word, stem):
    assert snowball_stem("Hungarian")(word) == stem


def test_snowball_ro_fi_hu_lookup_and_filter_specs():
    from lucene_spark.analysis.filters import FilteredAnalyzer

    assert snowball_stem("Romanian")("abandonate") == "abandon"
    assert snowball_stem("Finnish")("taloissa") == "talo"
    assert snowball_stem("Hungarian")("házak") == "ház"
    for spec, word, stem in [
        ("snowball_ro", "lucrează", "lucr"),
        ("snowball_fi", "taloissa", "talo"),
        ("snowball_hu", "tollal", "tol"),
    ]:
        an = FilteredAnalyzer(filters=(spec,))
        assert an.terms(word) == [stem]


# ------------------------------------------------------- Turkish + fixture
# Turkish was validated the strongest way available in-tree: the
# reference's OWN generated programs (org/tartarus/snowball/ext/
# {Turkish,Romanian,Finnish,Hungarian}Stemmer.java + the org/tartarus/
# snowball runtime) were compiled with the installed JDK and fuzz-diffed
# against this implementation over ~18k random words plus ~5k
# stem+suffix composites per language — zero mismatches. A frozen sample
# of those Java-produced pairs is checked in as
# tests/data/snowball_ref_pairs.json and replays here.

TR_VECTORS = {
    "kitaplar": "kitap", "kitabı": "kitap",      # postlude b->p devoicing
    "çocuklar": "çocuk", "arabaya": "araba",
    "evinde": "ev", "evlerinde": "ev",
    "okuldaki": "okul",
    "değildi": "değil", "gelmişti": "gelmiş",    # yDU past-tense chains
    "güzeldir": "güzel", "güzelmiş": "güzel",
    "kediler": "kedi", "kediye": "kedi",
    "ağacı": "ağaç", "ağaçlar": "ağaç",          # c->ç devoicing
    "öğrencilerin": "öğrenci",
    "Türkiye'nin": "Türki",                      # proper-noun apostrophe
    "soyad": "soyad", "ad": "ad",                # reserved words
    "ev": "ev",                                  # single syllable -> kept
}


@pytest.mark.parametrize("word,stem", sorted(TR_VECTORS.items()))
def test_turkish_snowball(word, stem):
    assert snowball_stem("Turkish")(word) == stem


def test_snowball_reference_program_pairs():
    """Replay the frozen (word -> stem) pairs produced by COMPILING AND
    RUNNING the reference's own generated Snowball programs (see the
    fixture header comment above): every pair must match bit-for-bit."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "snowball_ref_pairs.json")
    with open(path, encoding="utf-8") as f:
        fx = json.load(f)
    assert set(fx) == {"Turkish", "Romanian", "Finnish", "Hungarian",
                       "Irish", "Hindi", "Armenian", "Lithuanian",
                       "Nepali", "Basque", "Catalan", "Polish",
                       "Serbian", "Estonian", "Esperanto", "Dutch_porter",
                       "Yiddish", "Arabic", "Tamil", "Greek", "Dutch"}
    total = 0
    for lang, pairs in fx.items():
        stemmer = snowball_stem(lang)
        bad = [(w, stemmer(w), s) for w, s in pairs.items()
               if stemmer(w) != s]
        assert not bad, (lang, bad[:5])
        total += len(pairs)
    assert total > 10000


def test_snowball_irish_and_hindi():
    """Irish (initial mutation stripping + RV/R1/R2 suffix steps) and
    Hindi (single conditional-Among table, first char protected) — both
    fuzz-diffed to zero mismatches against the reference's compiled
    generated programs; spot vectors here, full pairs in the fixture."""
    ga = snowball_stem("Irish")
    assert ga("bhfuil") == "fuil"          # eclipsis bhf -> f
    assert ga("scoileanna") == "scoileanna"
    assert ga("amhránaíochta") == "amhrán"  # noun íochta in R1
    assert ga("d'fhear") == "fear"          # d'fh -> f
    assert ga("n-athair") == "athair"
    hi = snowball_stem("Hindi")
    assert hi("लड़कों") == "लड़क"
    assert hi("खा") == "ख"
    assert hi("क") == "क"         # single char protected

    from lucene_spark.analysis.filters import FilteredAnalyzer

    an = FilteredAnalyzer(filters=("snowball_tr",))
    assert an.terms("kitaplar") == ["kitap"]
