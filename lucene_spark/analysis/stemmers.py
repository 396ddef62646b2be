"""Light stemmers and script normalizers for non-English corpora.

The UniNE family (Jacques Savoy's light stemming algorithms — *Light
Stemming Approaches for the French, Portuguese, German and Hungarian
Languages*, SAC 2006 — and the CLEF experiment reports) plus the other
algorithmic per-language stemmers/normalizers in the reference's
analysis-common module (Larkey's Arabic, Tala's Indonesian, BulStem,
Sorani, Latvian, Devanagari/Persian normalization, the minimal
plural-only variants), as per-token callables that plug into
``FilteredAnalyzer`` (``filters=("light_de",)`` etc.) exactly like
``porter_stem``. Fidelity: the reference's ENTIRE stemmer test-data
files — 428k word/stem pairs — replay with zero mismatches
(``tests/test_filters.py``). Semantics match:

- German  — analysis/common/.../de/GermanLightStemmer.java:63
- French  — analysis/common/.../fr/FrenchLightStemmer.java:64
- Spanish — analysis/common/.../es/SpanishLightStemmer.java:59
- Italian — analysis/common/.../it/ItalianLightStemmer.java:59
- Portuguese — analysis/common/.../pt/PortugueseLightStemmer.java:59
- Hungarian — analysis/common/.../hu/HungarianLightStemmer.java:59
- Swedish — analysis/common/.../sv/SwedishLightStemmer.java:42
- Norwegian (Bokmål) — analysis/common/.../no/NorwegianLightStemmer.java:44
- Russian — analysis/common/.../ru/RussianLightStemmer.java:40
- Finnish — analysis/common/.../fi/FinnishLightStemmer.java:44
- Czech — analysis/common/.../cz/CzechStemmer.java:31
- Arabic — analysis/common/.../ar/ArabicStemmer.java:30 (+ normalizer)
- Bulgarian — analysis/common/.../bg/BulgarianStemmer.java:27
- Persian normalizer — analysis/common/.../fa/PersianNormalizer.java:31
- Hindi — analysis/common/.../hi/HindiStemmer.java:26 (+ normalizer)
- Indonesian — analysis/common/.../id/IndonesianStemmer.java:27
- German/French minimal — de/GermanMinimalStemmer.java:44, fr/FrenchMinimalStemmer.java:44
- Sorani Kurdish — ckb/SoraniStemmer.java:27 (+ normalizer :40)
- Spanish plural-only — es/SpanishPluralStemmer.java:37
- Latvian — lv/LatvianStemmer.java:30
- Norwegian minimal — no/NorwegianMinimalStemmer.java:44

Light stemmers only conflate plural/gender/derivational endings (no
measure conditions like Porter's), so they are tiny rule cascades: each
is expressed here as accent folding + ordered suffix rewrites over
Python strings. Unlike Porter these operate on already-lowercased
tokens (the chain order in the reference analyzers puts them after
LowerCaseFilter), which ``FilteredAnalyzer`` guarantees.
"""

from __future__ import annotations

__all__ = [
    "german_light_stem",
    "german_normalize",
    "french_light_stem",
    "spanish_light_stem",
    "italian_light_stem",
    "portuguese_light_stem",
    "hungarian_light_stem",
    "swedish_light_stem",
    "norwegian_light_stem",
    "russian_light_stem",
    "finnish_light_stem",
    "czech_light_stem",
    "arabic_normalize",
    "arabic_stem",
    "bulgarian_stem",
    "persian_normalize",
    "hindi_normalize",
    "english_minimal_stem",
    "english_possessive_strip",
    "hindi_light_stem",
    "indonesian_stem",
    "german_minimal_stem",
    "french_minimal_stem",
    "sorani_normalize",
    "sorani_stem",
    "spanish_plural_stem",
    "latvian_stem",
    "norwegian_minimal_stem",
]

# shared accent-folding maps (each language folds a slightly different set)
_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_ROMANCE_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")
_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")
_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")

_DE_ST_ENDING = set("bdfghklmnt")


def german_light_stem(word: str) -> str:
    """Fold umlauts/accents, then two passes of plural/case endings:
    -ern/-em/-en/-er/-es/-e/-s(after bdfghklmnt), then -est/-er/-en/-st."""
    s = word.translate(_DE_FOLD)
    n = len(s)
    # pass 1
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_ENDING:
        n -= 1
    # pass 2 (superlative/comparative endings on the pass-1 result)
    if n > 5 and s[n - 3 : n] == "est":
        n -= 3
    elif n > 4 and (s[n - 2 : n] == "er" or s[n - 2 : n] == "en"):
        n -= 2
    elif n > 4 and s[n - 2 : n] == "st" and s[n - 3] in _DE_ST_ENDING:
        n -= 2
    return s[:n]


def _fr_norm(s: str) -> str:
    """French final normalization: fold accents, collapse letter runs,
    strip -ie, then trailing r/e/e and a doubled final letter — applied
    only while the stem stays longer than 4."""
    if len(s) > 4:
        s = s.translate(_FR_FOLD)
        # collapse consecutive identical letters anywhere in the stem
        out = [s[0]]
        for ch in s[1:]:
            if ch == out[-1] and ch.isalpha():
                continue
            out.append(ch)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(word: str) -> str:
    """Plural -x/-s removal, a cascade of derivational rewrites
    (-issement→-ir, -ateur→-er, -trice→-teur, …), then ``_fr_norm``.
    Rule order and length guards follow the UniNE algorithm."""
    s = word
    if len(s) > 5 and s[-1] == "x":
        if s[-3:] == "aux" and s[-4] != "e":
            s = s[:-3] + "al"  # chevaux -> cheval
        else:
            s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    n = len(s)
    if n > 9 and s.endswith("issement"):
        return _fr_norm(s[: n - 7] + "r")  # -issement -> -ir
    if n > 8 and s.endswith("issant"):
        return _fr_norm(s[: n - 5] + "r")  # -issant -> -ir
    if n > 6 and s.endswith("ement"):
        s = s[: n - 4]  # keep the trailing e
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-2] + "f"  # -ivement -> -if
        return _fr_norm(s)
    if n > 11 and s.endswith("ficatrice"):
        return _fr_norm(s[: n - 7] + "er")  # -ficatrice -> -fier
    if n > 10 and s.endswith("ficateur"):
        return _fr_norm(s[: n - 6] + "er")  # -ficateur -> -fier
    if n > 9 and s.endswith("catrice"):
        return _fr_norm(s[: n - 7] + "quer")  # -catrice -> -quer
    if n > 8 and s.endswith("cateur"):
        return _fr_norm(s[: n - 6] + "quer")  # -cateur -> -quer
    if n > 8 and s.endswith("atrice"):
        return _fr_norm(s[: n - 6] + "er")  # -atrice -> -er
    if n > 7 and s.endswith("ateur"):
        return _fr_norm(s[: n - 5] + "er")  # -ateur -> -er
    if n > 6 and s.endswith("trice"):
        s = s[: n - 5] + "teur"  # falls through, no return
        n = len(s)
    if n > 5 and s.endswith("ième"):
        return _fr_norm(s[: n - 4])
    if n > 7 and s.endswith("teuse"):
        return _fr_norm(s[: n - 3] + "r")  # -teuse -> -ter
    if n > 6 and s.endswith("teur"):
        return _fr_norm(s[: n - 2] + "r")  # -teur -> -ter
    if n > 5 and s.endswith("euse"):
        return _fr_norm(s[: n - 2])  # -euse -> -eu
    if n > 8 and s.endswith("ère"):
        return _fr_norm(s[: n - 3] + "er")
    if n > 7 and s.endswith("ive"):
        return _fr_norm(s[: n - 2] + "f")  # -ive -> -if
    if n > 4 and (s.endswith("folle") or s.endswith("molle")):
        return _fr_norm(s[: n - 3] + "u")  # folle -> fou
    if n > 9 and s.endswith("nnelle"):
        return _fr_norm(s[: n - 5])
    if n > 9 and s.endswith("nnel"):
        return _fr_norm(s[: n - 3])
    if n > 4 and s.endswith("ète"):
        s = s[: n - 3] + "et"  # falls through, no return
        n = len(s)
    if n > 8 and s.endswith("ique"):
        s = s[: n - 4]
        n = len(s)
    if n > 8 and s.endswith("esse"):
        return _fr_norm(s[: n - 3])  # -esse -> -e
    if n > 7 and s.endswith("inage"):
        return _fr_norm(s[: n - 3])  # -inage -> -in
    if n > 9 and s.endswith("isation"):
        s = s[: n - 7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-3] + "uel"  # -ualisation -> -uel
        return _fr_norm(s)
    if n > 9 and s.endswith("isateur"):
        return _fr_norm(s[: n - 7])
    if n > 8 and s.endswith("ation"):
        return _fr_norm(s[: n - 5])
    if n > 8 and s.endswith("ition"):
        return _fr_norm(s[: n - 5])
    return _fr_norm(s)


def spanish_light_stem(word: str) -> str:
    """Accent folding + plural/gender endings: -os/-as/-es, final
    -o/-a/-e; -ces conflates to -z (voces -> voz)."""
    if len(word) < 5:
        return word
    s = word.translate(_ROMANCE_FOLD)
    if s[-1] in "oae":
        return s[:-1]
    if s[-1] == "s":
        if s.endswith("eses"):
            return s[:-2]
        if s.endswith("ces"):
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


def italian_light_stem(word: str) -> str:
    """Accent folding + plural/gender vowel endings, with the -i/-h
    spelling adjustments (amiche -> amic, cani -> can)."""
    if len(word) < 6:
        return word
    s = word.translate(_ROMANCE_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last in "ao":
        return s[:-2] if prev == "i" else s[:-1]
    return s


def _pt_remove_suffix(s: str) -> str:
    n = len(s)
    if n > 4 and s.endswith("es") and s[n - 3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"  # bons -> bom
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"  # papéis -> papel
    if n > 4 and s.endswith("ais"):
        return s[:-2] + "l"  # animais -> animal
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"  # lençóis -> lençol
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"  # barris -> barril
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"  # botões -> botão
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(word: str) -> str:
    """Plural suffix rewrites (-ões→-ão, -ais→-al, …), feminine→masculine
    conflation, final-vowel drop, then accent folding (folding comes LAST
    so the ã/ê rewrites above take part in conflation)."""
    if len(word) < 4:
        return word
    s = _pt_remove_suffix(word)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_PT_FOLD)


def german_normalize(word: str) -> str:
    """GermanNormalizationFilter (de/GermanNormalizationFilter.java:26): a
    three-state FSM that folds umlauts to base letters, expands ß to ss,
    and deletes the 'e' of spelled-out umlauts (ue→u, ae→a, oe→o) —
    except after q/i/y/another vowel-consumed position, so 'quelle' and
    'die' keep their e. Run BEFORE ``german_light_stem`` to conflate both
    umlaut spellings."""
    # states: N ordinary, V blocks e-deletion, U allows it
    N, V, U = 0, 1, 2
    out: list[str] = []
    state = N
    for c in word:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V  # spelled-out umlaut: drop the e
                continue
            out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


# Hungarian — analysis/common/.../hu/HungarianLightStemmer.java:59
_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = set("aeiouy")

_HU_CASE3 = (
    "nak", "nek", "val", "vel", "ert", "rol", "ban", "ben", "bol", "nal",
    "nel", "hoz", "hez", "tol",
)
_HU_CASE2 = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s[-3:] in _HU_CASE3:
            return s[:-3]
        if s[-2:] in ("al", "el") and s[-3] not in _HU_VOWELS and s[-3] == s[-4]:
            return s[:-3]
    if n > 4:
        if s[-2:] in _HU_CASE2:
            return s[:-2]
        if s[-2:] in ("on", "en") and s[-3] not in _HU_VOWELS:
            return s[:-2]
        if s[-1] in "tn":
            return s[:-1]
        if s[-1] in "ae" and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s[-4:] in ("atok", "otok", "etek"):
            return s[:-4]
        if s[-4:] in ("itek", "itok"):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s[-3:] in ("unk", "tok", "tek"):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s[-3:] == "juk":
            return s[:-3]
        if s[-3:] == "ink":
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s[-2:] in (
            "am", "em", "om", "ad", "ed", "od", "uk",
        ):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s[-2:] in ("nk", "ja", "je"):
            return s[:-2]
        if s[-2:] in ("im", "id", "ik"):
            return s[:-2]
    if n > 3:
        if s[-1] in "ae" and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if s[-1] in "md" and s[-2] in _HU_VOWELS:
            return s[:-1]
        if s[-1] == "i":
            return s[:-1]
    return s


def hungarian_light_stem(word: str) -> str:
    """Fold accents, then strip case endings, possessives, plural -k and a
    final vowel — the fourth language of the UniNE light-stemming paper
    (hu/HungarianLightStemmer.java:59)."""
    s = word.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    # plural: -k with a/o/e before it drops both (len > 4), else just -k
    if len(s) > 3 and s[-1] == "k":
        s = s[:-2] if (s[-2] in "aoe" and len(s) > 4) else s[:-1]
    if len(s) > 3 and s[-1] in "aeio":
        s = s[:-1]
    return s


def swedish_light_stem(word: str) -> str:
    """sv/SwedishLightStemmer.java:42 — possessive -s, then one pass of
    noun/adjective endings by descending length."""
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and s[-5:] in ("elser", "heten"):
        return s[:-5]
    if n > 6 and s[-4:] in (
        "arne", "erna", "ande", "else", "aste", "orna", "aren",
    ):
        return s[:-4]
    if n > 5 and s[-3:] in ("are", "ast", "het"):
        return s[:-3]
    if n > 4 and s[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


def norwegian_light_stem(word: str) -> str:
    """no/NorwegianLightStemmer.java:44 with the default BOKMAAL flag:
    possessive -s, -het(er/en), -else(r/n), participle/adjective endings,
    definite/indefinite noun endings, final a/e/n."""
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and s[-5:] in ("heter", "heten", "elser", "elsen"):
        return s[:-5]
    if n > 5 and s[-3:] in ("dom", "het"):
        return s[:-3]
    if n > 6 and s[-4:] in ("ende", "else", "este", "eren"):
        return s[:-4]
    if n > 5 and s[-3:] in ("ere", "est", "ene"):
        return s[:-3]
    if n > 4 and s[-2:] in ("er", "en", "et", "st", "te"):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


_RU_CASE4 = ("иями", "оями")
_RU_CASE3 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему", "ери",
    "ими", "ого", "ому", "ыми", "оев",
)
_RU_CASE2 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою", "ую",
    "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им", "ое", "ой",
    "ом", "ов", "ые", "ый", "ым", "ми",
)


def russian_light_stem(word: str) -> str:
    """ru/RussianLightStemmer.java:40 — case endings by descending length,
    then the normalize pass (final ь/и, doubled н)."""
    s = word
    n = len(s)
    if n > 6 and s[-4:] in _RU_CASE4:
        s = s[:-4]
    elif n > 5 and s[-3:] in _RU_CASE3:
        s = s[:-3]
    elif n > 4 and s[-2:] in _RU_CASE2:
        s = s[:-2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[:-1]
    if len(s) > 3:
        if s[-1] in "ьи":
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


# Finnish — analysis/common/.../fi/FinnishLightStemmer.java:44
_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = set("aeiouy")


def _fi_step1(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("kin"):
            return _fi_step1(s[:-3])  # clitic -kin recurses
        if s.endswith("ko"):
            return _fi_step1(s[:-2])  # clitic -ko recurses
    if n > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    if len(s) > 5:
        if s[-3:] in ("lla", "tse", "sti"):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"  # -nnen -> -s
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s[-4:] in ("neen", "niin", "seen", "teen", "inen"):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _FI_VOWELS and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return s[:-3]
    if n > 5:
        if s[-2:] in ("na", "ne"):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s[-2:] in ("ja", "ta"):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _FI_VOWELS:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"  # in-place rewrite, falls through
    if len(s) > 4 and s[-2:] in ("ei", "at"):
        return s[:-2]
    if len(s) > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # collapse doubled k/p/t anywhere (consonant gradation)
            out = [s[0]]
            for ch in s[1:]:
                if ch == out[-1] and ch in "kpt":
                    continue
                out.append(ch)
            s = "".join(out)
    return s


def finnish_light_stem(word: str) -> str:
    """fi/FinnishLightStemmer.java:44 — clitic recursion, case-ending
    cascade (incl. the -nnen/-den/-ksen → -s rewrites and -hde → -ksi),
    then the two normalization passes with k/p/t de-doubling."""
    if len(word) < 4:
        return word
    s = word.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))


# Czech — analysis/common/.../cz/CzechStemmer.java:31 (Dolamic & Savoy's
# light stemmer for Czech)
_CZ_CASE3 = (
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete", "ěti",
    "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata", "aty", "ých",
    "ama", "ami", "ové", "ovi", "ými",
)
_CZ_CASE2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou")


def _cz_remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and s[-4:] in ("ětem", "etem", "atům"):
        return s[:-4]
    if n > 5 and s[-3:] in _CZ_CASE3:
        return s[:-3]
    if n > 4 and s[-2:] in _CZ_CASE2:
        return s[:-2]
    if n > 3 and s[-1] in "aeiouůyáéíýě":
        return s[:-1]
    return s


def czech_light_stem(word: str) -> str:
    """cz/CzechStemmer.java:31 — case endings, possessive -ov/-in/-ův,
    then palatalization-undoing normalization (čt→ck, št→sk, c/č→k,
    z/ž→h, e-insertion removal, ů→o)."""
    s = _cz_remove_case(word)
    if len(s) > 5 and s[-2:] in ("ov", "in", "ův"):
        s = s[:-2]
    if not s:
        return s
    # normalize
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in "cč":
        return s[:-1] + "k"
    if s[-1] in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]  # e-insertion: e* -> *
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


# Arabic — analysis/common/.../ar/ArabicStemmer.java:30 (Larkey's light
# stemmer) + ArabicNormalizer.java:30; chain order in ArabicAnalyzer:
# normalize THEN stem
_AR_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")
_AR_DIACRITICS = set("ـًٌٍَُِّْ")


def arabic_normalize(word: str) -> str:
    """Hamza'd alefs -> bare alef, dotless yeh -> yeh, teh marbuta -> heh,
    tatweel + harakat deleted (ArabicNormalizer.java:30)."""
    out = []
    for ch in word:
        if ch in "آأإ":  # alef madda / hamza above / below
            out.append("ا")
        elif ch == "ى":  # dotless yeh
            out.append("ي")
        elif ch == "ة":  # teh marbuta
            out.append("ه")
        elif ch in _AR_DIACRITICS:
            continue
        else:
            out.append(ch)
    return "".join(out)


def arabic_stem(word: str) -> str:
    """One definite-article/conjunction prefix (first match; the bare waw
    needs a 4-char word, others 2 chars after the strip), then EVERY
    matching suffix in table order (the reference loops the whole suffix
    table, stripping repeatedly)."""
    s = word
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(s) >= 4 and s.startswith(p):
                s = s[1:]
                break
        elif len(s) >= len(p) + 2 and s.startswith(p):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: -len(suf)]
    return s


# Bulgarian — analysis/common/.../bg/BulgarianStemmer.java:27 (the light
# stemmer from Nakov et al.'s BulStem paper, with the ен->н fix)


def _bg_remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:-3]
    if n > 5 and s[-2:] in ("ът", "то", "те", "та", "ия"):
        return s[:-2]
    if n > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _bg_remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:-3]  # keeps the о
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]  # е -> я, drop the и
    if n > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s


def bulgarian_stem(word: str) -> str:
    """Definite article, plural (with the ц/з/с -> к/г/х and е -> я
    palatalization reversals), final я/а/о/е, ен -> н, ъN -> N."""
    if len(word) < 4:
        return word
    s = word
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _bg_remove_article(s)
    s = _bg_remove_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s[-1] in "аое":
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


def persian_normalize(word: str) -> str:
    """fa/PersianNormalizer.java:31 — farsi yeh / yeh barree -> arabic
    yeh, keheh -> kaf, heh+yeh / heh goal -> heh, combining hamza above
    deleted. Run together with ``arabic_normalize`` for mixed text (the
    PersianAnalyzer chains both)."""
    out = []
    for ch in word:
        if ch in "یے":
            out.append("ي")
        elif ch == "ک":
            out.append("ك")
        elif ch in "ۀہ":
            out.append("ه")
        elif ch == "ٔ":
            continue
        else:
            out.append(ch)
    return "".join(out)


# Hindi — analysis/common/.../hi/HindiNormalizer.java:43 (Devanagari
# orthographic normalization per Ljiljana Dolamic's UniNE runs) and
# hi/HindiStemmer.java:26 (light suffix stripping)
_HI_MAP = {
    "ँ": "ं",  # candrabindu -> bindu
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",  # nukta forms
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",  # chandra/short e -> e
    "ॉ": "ो", "ॊ": "ो",  # chandra/short o -> o
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",  # long->short
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = {"़", "‍", "‌", "्"}  # nukta, zwj/zwnj, virama

_HI_SUF5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF4 = (
    "ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
    "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
    "ियों", "ियां",
)
_HI_SUF3 = (
    "ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने", "ाना",
    "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं",
)
_HI_SUF2 = (
    "कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
    "ता", "ाँ", "ां", "ों", "ें",
)
_HI_SUF1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_normalize(word: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(word):
        ch = word[i]
        if ch == "न" and i + 1 < len(word) and word[i + 1] == "्":
            out.append("ं")  # dead n -> bindu (consumes the virama)
            i += 2
            continue
        if ch in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


def hindi_light_stem(word: str) -> str:
    """One suffix strip, longest table first with the reference's length
    guards (HindiStemmer.java:26)."""
    n = len(word)
    if n > 6 and word[-5:] in _HI_SUF5:
        return word[:-5]
    if n > 5 and word[-4:] in _HI_SUF4:
        return word[:-4]
    if n > 4 and word[-3:] in _HI_SUF3:
        return word[:-3]
    if n > 3 and word[-2:] in _HI_SUF2:
        return word[:-2]
    if n > 2 and word[-1] in _HI_SUF1:
        return word[:-1]
    return word


# Indonesian — analysis/common/.../id/IndonesianStemmer.java:27 (Tala's
# stemmer: inflectional particles/possessives, then derivational
# prefix/suffix rules with recoding and combination constraints)
_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64,
)
_ID_VOWELS = set("aeiou")


def _id_first_prefix(s, syll, flags):
    if s.startswith("meng"):
        return s[4:], syll - 1, flags | _ID_MENG
    if s.startswith("meny") and len(s) > 4 and s[4] in _ID_VOWELS:
        return "s" + s[4:], syll - 1, flags | _ID_MENG  # meny+V -> s (recode)
    if s.startswith(("men", "mem")):
        return s[3:], syll - 1, flags | _ID_MENG
    if s.startswith("me"):
        return s[2:], syll - 1, flags | _ID_MENG
    if s.startswith("peng"):
        return s[4:], syll - 1, flags | _ID_PENG
    if s.startswith("peny") and len(s) > 4 and s[4] in _ID_VOWELS:
        return "s" + s[4:], syll - 1, flags | _ID_PENG
    if s.startswith("peny"):
        return s[4:], syll - 1, flags | _ID_PENG
    if s.startswith("pen") and len(s) > 3 and s[3] in _ID_VOWELS:
        return "t" + s[3:], syll - 1, flags | _ID_PENG  # pen+V -> t (recode)
    if s.startswith("pen"):
        return s[3:], syll - 1, flags | _ID_PENG
    if s.startswith("pem"):
        return s[3:], syll - 1, flags | _ID_PENG
    if s.startswith("di"):
        return s[2:], syll - 1, flags | _ID_DI
    if s.startswith("ter"):
        return s[3:], syll - 1, flags | _ID_TER
    if s.startswith("ke"):
        return s[2:], syll - 1, flags | _ID_KE
    return s, syll, flags


def _id_second_prefix(s, syll, flags):
    if s.startswith("ber"):
        return s[3:], syll - 1, flags | _ID_BER
    if s == "belajar":
        return s[3:], syll - 1, flags | _ID_BER
    if (
        s.startswith("be")
        and len(s) > 4
        and s[2] not in _ID_VOWELS
        and s[3] == "e"
        and s[4] == "r"
    ):
        return s[2:], syll - 1, flags | _ID_BER
    if s.startswith("per"):
        return s[3:], syll - 1, flags
    if s == "pelajar":
        return s[3:], syll - 1, flags
    if s.startswith("pe"):
        return s[2:], syll - 1, flags | _ID_PE
    return s, syll, flags


def _id_suffix(s, syll, flags):
    if s.endswith("kan") and not flags & (_ID_KE | _ID_PENG | _ID_PE):
        return s[:-3], syll - 1, flags
    if s.endswith("an") and not flags & (_ID_DI | _ID_MENG | _ID_TER):
        return s[:-2], syll - 1, flags
    if (
        s.endswith("i")
        and not s.endswith("si")
        and not flags & (_ID_BER | _ID_KE | _ID_PENG)
    ):
        return s[:-1], syll - 1, flags
    return s, syll, flags


def indonesian_stem(word: str, stem_derivational: bool = True) -> str:
    """id/IndonesianStemmer.java:27: inflectional particles (-kah/-lah/
    -pun) and possessives (-ku/-mu/-nya) always strip; derivational
    prefixes/suffixes apply with the reference's fired-rule sequencing
    and prefix/suffix combination constraints. Every rule requires the
    word to keep more than two syllables (vowel count)."""
    syll = sum(1 for ch in word if ch in _ID_VOWELS)
    flags = 0
    s = word
    if syll > 2 and s[-3:] in ("kah", "lah", "pun"):
        syll -= 1
        s = s[:-3]
    if syll > 2:
        if s[-2:] in ("ku", "mu"):
            syll -= 1
            s = s[:-2]
        elif s.endswith("nya"):
            syll -= 1
            s = s[:-3]
    if stem_derivational:
        old = len(s)
        if syll > 2:
            s, syll, flags = _id_first_prefix(s, syll, flags)
        if len(s) != old:  # a first-order rule fired
            old = len(s)
            if syll > 2:
                s, syll, flags = _id_suffix(s, syll, flags)
            if len(s) != old and syll > 2:  # a suffix rule fired too
                s, syll, flags = _id_second_prefix(s, syll, flags)
        else:
            if syll > 2:
                s, syll, flags = _id_second_prefix(s, syll, flags)
            if syll > 2:
                s, syll, flags = _id_suffix(s, syll, flags)
    return s


def german_minimal_stem(word: str) -> str:
    """de/GermanMinimalStemmer.java:44 — umlaut fold + plural-only
    endings (-nen, -en/-se/-es/-er, single -n/-e/-s/-r)."""
    if len(word) < 5:
        return word
    s = word.translate(str.maketrans("äöü", "aou"))
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s[-2:] in ("en", "se", "es", "er"):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


def french_minimal_stem(word: str) -> str:
    """fr/FrenchMinimalStemmer.java:44 — plural-only: -x (with -aux ->
    -al), then sequential s/r/e/é drops and a final-double-letter
    collapse."""
    if len(word) < 6:
        return word
    s = word
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            return s[:-2] + "l"  # chevaux -> cheval
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if s[-1] == s[-2]:
        s = s[:-1]
    return s


# Sorani Kurdish — analysis/common/.../ckb/SoraniNormalizer.java:40 and
# SoraniStemmer.java:27
_CKB_DIACRITICS = set("ـًٌٍَُِّْ")


def sorani_normalize(word: str) -> str:
    """Arabic-script variants onto the Sorani forms: yeh -> farsi yeh,
    kaf -> keheh, final/ZWNJ-joined heh -> ae, heh doachashmee -> heh,
    initial reh -> rreh, tatweel/harakat deleted."""
    out: list[str] = []
    for i, ch in enumerate(word):
        if ch in "يى":  # yeh / dotless yeh
            out.append("ی")
        elif ch == "ك":  # kaf
            out.append("ک")
        elif ch == "‌":  # ZWNJ: heh before it becomes ae
            if out and out[-1] == "ه":
                out[-1] = "ە"
            continue
        elif ch == "ه":  # heh: word-final becomes ae
            out.append("ە" if i == len(word) - 1 else "ه")
        elif ch == "ة":  # teh marbuta
            out.append("ە")
        elif ch == "ھ":  # heh doachashmee
            out.append("ه")
        elif ch == "ر":  # reh: initial becomes rreh
            out.append("ڕ" if i == 0 else "ر")
        elif ch == "ڒ":  # rreh above
            out.append("ڕ")
        elif ch in _CKB_DIACRITICS:
            continue
        else:
            out.append(ch)
    return "".join(out)


def sorani_stem(word: str) -> str:
    """Postposition, possessive pronoun, then ONE of the ezafe/definite/
    plural/demonstrative endings (the reference's else-if chain)."""
    s = word
    # postposition
    if len(s) > 5 and s.endswith("دا"):
        s = s[:-2]
    elif len(s) > 4 and s.endswith("نا"):
        s = s[:-1]
    elif len(s) > 6 and s.endswith("ەوە"):
        s = s[:-3]
    # possessive pronoun
    if len(s) > 6 and s[-3:] in ("مان", "یان", "تان"):
        s = s[:-3]
    n = len(s)
    if n > 6 and s.endswith("ێکی"):  # indefinite singular ezafe
        return s[:-3]
    if n > 7 and s.endswith("یەکی"):
        return s[:-4]
    if n > 5 and s.endswith("ێک"):  # indefinite singular
        return s[:-2]
    if n > 6 and s.endswith("یەک"):
        return s[:-3]
    if n > 6 and s.endswith("ەکە"):  # definite singular
        return s[:-3]
    if n > 5 and s.endswith("کە"):
        return s[:-2]
    if n > 7 and s.endswith("ەکان"):  # definite plural
        return s[:-4]
    if n > 6 and s.endswith("کان"):
        return s[:-3]
    if n > 7 and s.endswith("یانی"):  # indefinite plural ezafe
        return s[:-4]
    if n > 6 and s.endswith("انی"):
        return s[:-3]
    if n > 6 and s.endswith("یان"):  # indefinite plural
        return s[:-3]
    if n > 5 and s.endswith("ان"):
        return s[:-2]
    if n > 7 and s.endswith("یانە"):  # demonstrative plural
        return s[:-4]
    if n > 6 and s.endswith("انە"):
        return s[:-3]
    if n > 5 and (s.endswith("ایە") or s.endswith("ەیە")):  # dem. singular
        return s[:-2]
    if n > 4 and s.endswith("ە"):
        return s[:-1]
    if n > 4 and s.endswith("ی"):  # absolute singular ezafe
        return s[:-1]
    return s


# Spanish plural-only — analysis/common/.../es/SpanishPluralStemmer.java:37
_ES_INVARIANTS = frozenset("""abrebotellas abrecartas abrelatas afueras
albatros albricias aledaños alexis alicates analisis andurriales antitesis
añicos apendicitis apocalipsis arcoiris aries bilis boletus boris brindis
cactus canutas caries cascanueces cascarrabias ciempies cifosis cortaplumas
corpus cosmos cosquillas creces crisis cuatrocientas cuatrocientos
cuelgacapas cuentacuentos cuentapasos cumpleaños doscientas doscientos dosis
enseres entonces esponsales estatus exequias fauces forceps fotosintesis
gafas gafotas gargaras gris honorarios ictus jueves lapsus lavacoches
lavaplatos limpiabotas lunes maitines martes mondadientes novecientas
novecientos nupcias ochocientas ochocientos pais paris parabrisas paracaidas
parachoques paraguas pararrayos pisapapeles piscis portaaviones portamaletas
portamantas quinientas quinientos quitamanchas recogepelotas rictus
rompeolas sacacorchos sacapuntas saltamontes salvavidas seis seiscientas
seiscientos setecientas setecientos sintesis tenis tifus trabalenguas
vacaciones venus versus viacrucis virus viveres volandas""".split())
_ES_SPECIAL = frozenset(
    "yoes noes sies clubes faralaes albalaes itemes albumes sandwiches "
    "relojes bojes contrarreloj carcajes".split()
)


def spanish_plural_stem(word: str) -> str:
    """Plural-only Spanish stemming with invariant/special word lists and
    the qu/gu, -Vres/-Vdes, -ues/-ies, -ces -> -z rules. NOTE: the
    reference's qu/gu condition short-circuits on 'q' alone (operator
    precedence in the Java source) — mirrored faithfully."""
    if len(word) < 4:
        return word
    s = word.translate(_ROMANCE_FOLD)
    if s in _ES_INVARIANTS:
        return s
    if s in _ES_SPECIAL:
        return s[:-2]
    if s[-1] != "s":
        return s
    v = _ID_VOWELS  # a e i o u
    if s[-2] not in v:
        return s[:-1]
    if s[-4] == "q" or (s[-4] == "g" and s[-3] == "u" and s[-2] in "ie"):
        return s[:-1]
    if s[-4] in v and s[-3] == "r" and s[-2] == "e":
        return s[:-2]
    if s[-4] in v and s[-3] in "dlnx" and s[-2] == "e":
        return s[:-2]
    if s[-3] in "yu" and s[-2] == "e":
        return s[:-2]
    if s[-4] in "ulrtn" and s[-3] == "i" and s[-2] == "e":
        return s[:-2]
    if s[-3] == "s" and s[-2] == "e":
        return s[:-2]
    if s[-3] in v and s[-2] == "i":
        return s[:-2] + "y"
    if s[-3] == "d" and s[-2] == "i":
        return s[:-2] + "y"
    if s[-3] == "c" and s[-2] == "e":
        return s[:-3] + "z"
    if s[-2] in v:
        return s[:-1]
    return s


# Latvian — analysis/common/.../lv/LatvianStemmer.java:30 (light stemmer
# per Karlis Kreslins: one affix strip gated on remaining vowel count,
# then palatalization undoing)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False), ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = set("aeiouāīēū")


def _lv_unpalatalize(s: str, removed_first: str) -> str:
    if removed_first == "u":
        if s.endswith("kš"):
            return s[:-1] + "st"  # kš -> kst (2nd/5th/6th decl. gen. pl.)
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    if s.endswith(("pj", "bj", "mj", "vj")):  # labial consonant
        return s[:-1]
    for pal, plain in (
        ("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"), ("žļ", "zl"),
        ("ļņ", "ln"), ("ļļ", "ll"),
    ):
        if s.endswith(pal):
            return s[:-2] + plain
    if s and s[-1] in "čļņ":
        return s[:-1] + {"č": "c", "ļ": "l", "ņ": "n"}[s[-1]]
    return s


def latvian_stem(word: str) -> str:
    """One affix from the ordered table, only when the remainder keeps
    more vowels than the affix consumed and at least 3 characters;
    palatalized declensions un-palatalize."""
    nv = sum(1 for c in word if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(word) >= len(affix) + 3 and word.endswith(affix):
            s = word[: -len(affix)]
            return _lv_unpalatalize(s, affix[0]) if palatalizes else s
    return word


def norwegian_minimal_stem(word: str) -> str:
    """no/NorwegianMinimalStemmer.java:44 (Bokmål flag): genitive -s,
    definite plural -ene, -er/-en/-et, final -a/-e only."""
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 5 and s.endswith("ene"):
        return s[:-3]
    if n > 4 and s[-2:] in ("er", "en", "et"):
        return s[:-2]
    if n > 3 and s[-1] in "ae":
        return s[:-1]
    return s

def english_minimal_stem(word: str) -> str:
    """Harman's S-Stemmer (en/EnglishMinimalStemmer.java:24): strip one
    plural -s with the u/s/e guards; -ies -> -y when not -aies/-eies."""
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    p = word[-2]
    if p in ("u", "s"):
        return word
    if p == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("i", "a", "o", "e"):
            return word
    return word[:-1]


def english_possessive_strip(word: str) -> str:
    """EnglishPossessiveFilter.java:31: strip a trailing 's (ASCII,
    right-single-quote or fullwidth apostrophe variants)."""
    if (
        len(word) >= 2
        and word[-2] in ("'", "\u2019", "\uff07")
        and word[-1] in ("s", "S")
    ):
        return word[:-2]
    return word

