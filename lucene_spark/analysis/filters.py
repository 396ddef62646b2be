"""Token filters beyond the StandardAnalyzer chain (clean-room, Python).

Behavioral parity targets in the reference analysis-common module:

- ``miscellaneous/ASCIIFoldingFilter.java:74`` — fold Latin accented
  codepoints to their ASCII base letters. The reference enumerates the
  full Unicode Latin ranges in a giant switch; here the same mapping is
  produced from ``unicodedata`` NFKD decomposition (strip combining
  marks) plus the special-cased ligatures/letters NFKD cannot decompose
  (æ, ø, đ, þ, ß, œ…), which is exactly the set the Java switch special-
  cases. Pinned by goldens in ``tests/test_filters.py``.
- ``en/PorterStemFilter.java:51`` — Porter's original algorithm (the
  reference's PorterStemmer.java is a mechanical translation of Porter's
  public-domain C; this is an independent implementation of the published
  algorithm, steps 1a-5b).
- ``synonym/SynonymGraphFilter.java:78`` — the position-preserving subset:
  single-token synonym mapping (the multi-token graph output is what the
  reference's TermAutomatonQuery/graph queries consume; out of scope
  here, noted in COVERAGE.md).
- ``shingle/ShingleFilter.java`` — word n-gram shingles with the
  ``_``-free joined form; emitted as EXTRA tokens at the position of
  their first word (posIncr 0 overlaps, so norms discount them,
  ``FieldInvertState.java:38-43``).
- ``ngram/NGramTokenFilter.java`` — character n-grams per token, emitted
  at the source token's position (overlaps, like the reference with
  preserveOriginal=false emits at the same position).

All filters are pure functions over (terms, positions) arrays so both the
tokenizer fast path and the oracle index share them; a filtered chain
forces the Python invert pass (the JVM SQL twin covers only the plain
StandardAnalyzer chain).
"""

from __future__ import annotations

import unicodedata

__all__ = [
    "ascii_fold",
    "porter_stem",
    "SynonymMap",
    "cjk_width",
    "CJKBigrams",
    "WordDelimiterGraph",
    "FilteredAnalyzer",
    "make_filter",
]

# ligatures & letters NFKD cannot decompose — the ASCIIFoldingFilter
# special cases (both cases; output per the reference's switch)
_FOLD_SPECIAL = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
    "ß": "ss", "ı": "i", "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H", "ŋ": "n", "Ŋ": "N",
    "ŧ": "t", "Ŧ": "T", "ĸ": "k",
}


def ascii_fold(term: str) -> str:
    """ASCIIFoldingFilter: accented Latin -> ASCII base; non-Latin passes
    through unchanged (the reference folds only the Latin ranges)."""
    if term.isascii():
        return term
    out = []
    for ch in term:
        if ch.isascii():
            out.append(ch)
            continue
        special = _FOLD_SPECIAL.get(ch)
        if special is not None:
            out.append(special)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(folded if folded.isascii() and folded else ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# Porter stemmer — independent implementation of the published algorithm
# (M.F. Porter, 1980), the algorithm PorterStemFilter.java applies.
# ---------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    if len(word) <= 2 or not word.isascii() or not word.isalpha():
        return word
    w = word
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif (w.endswith("ed") and _has_vowel(w[:-2])) or (
        w.endswith("ing") and _has_vowel(w[:-3])
    ):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w = w + "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


class SynonymMap:
    """Synonym mapping with SynonymGraphFilter's two shapes
    (``synonym/SynonymGraphFilter.java:78``):

    - single-token members rewrite 1:1 to the group's canonical form
      (first member) — position-preserving, applied per token;
    - MULTI-WORD members ("wide area network") match as phrases; the
      canonical token is emitted as an OVERLAP at the match's first
      position (posIncr 0 — the index-time FlattenGraphFilter projection
      of the graph's posLength=n arc, ``core/.../FlattenGraphFilter.java``),
      with the original tokens kept. A query for the canonical term then
      matches docs containing the phrase — the graph use-case — while
      field length still counts only base tokens (overlaps discounted,
      ``FieldInvertState.java:38-43``).

    Apply at index AND query time. Longest match wins at a given start
    (the reference's greedy parse), matches never overlap.
    """

    def __init__(self, groups: list[list[str]]):
        self.mapping: dict[str, str] = {}
        self.phrases: dict[tuple, str] = {}
        for g in groups:
            canon = g[0]
            if " " in canon:
                raise ValueError("canonical (first) member must be single-token")
            for t in g:
                words = tuple(t.split())
                if len(words) == 1:
                    self.mapping[t] = canon
                else:
                    self.phrases[words] = canon
        self.max_phrase_len = max((len(w) for w in self.phrases), default=0)

    def __call__(self, term: str) -> str:
        return self.mapping.get(term, term)

    def phrase_matches(self, terms: list, pos) -> list:
        """(first_position, canonical) for every greedy longest phrase
        match over a contiguous token run."""
        out = []
        i, n = 0, len(terms)
        while i < n:
            hit = None
            for ln in range(min(self.max_phrase_len, n - i), 1, -1):
                if int(pos[i + ln - 1]) - int(pos[i]) != ln - 1:
                    continue  # bridges a gap left by a skipped token
                cand = tuple(terms[i : i + ln])
                if cand in self.phrases:
                    hit = (ln, self.phrases[cand])
                    break
            if hit:
                out.append((int(pos[i]), hit[1]))
                i += hit[0]
            else:
                i += 1
        return out


# CJKWidthFilter (analysis/cjk/CJKWidthFilter.java:36): fold fullwidth
# ASCII variants to halfwidth and halfwidth katakana variants to fullwidth.
# Per-codepoint table from NFKC over the Halfwidth/Fullwidth-Forms block,
# except the halfwidth voiced marks, which map to COMBINING marks and then
# compose (the reference combines them onto the preceding kana the same way).
_WIDTH_TABLE = {}
for _cp in range(0xFF01, 0xFFEF):
    _ch = chr(_cp)
    if _cp == 0xFF9E:
        _WIDTH_TABLE[_ch] = "゙"
    elif _cp == 0xFF9F:
        _WIDTH_TABLE[_ch] = "゚"
    else:
        _n = unicodedata.normalize("NFKC", _ch)
        if _n != _ch:
            _WIDTH_TABLE[_ch] = _n
del _cp, _ch


def cjk_width(term: str) -> str:
    """CJKWidthFilter: width-normalize one token (fullwidth ASCII ->
    halfwidth, halfwidth kana -> fullwidth, voiced marks composed)."""
    if not any(ch in _WIDTH_TABLE for ch in term):
        return term
    mapped = "".join(_WIDTH_TABLE.get(ch, ch) for ch in term)
    return unicodedata.normalize("NFC", mapped)


class CJKBigrams:
    """CJK bigram combining (``analysis/cjk/CJKBigramFilter.java:120``,
    default flags HAN | HIRAGANA | KATAKANA | HANGUL, outputUnigrams=false).

    The tokenizer emits ideographs/hiragana one token per character and
    katakana/hangul as runs (StandardTokenizerImpl.jflex:220-279); this
    filter flattens each maximal run of position-consecutive CJK tokens
    into its codepoint sequence and emits overlapping bigrams, one
    position each (posIncr 1 — the outputUnigrams=false stream shape).
    A lone single-character run passes through as a unigram, exactly the
    reference's singleton case. Scripts mix within a run when both are
    enabled (the reference's buffer only flushes on non-CJK tokens).

    Positions downstream are renumbered by accumulated increments — the
    TokenStream contract — so a run of n chars consumes n-1 positions and
    the pre-run gap (e.g. a removed stopword) is preserved.
    """

    def __init__(
        self,
        han: bool = True,
        hiragana: bool = True,
        katakana: bool = True,
        hangul: bool = True,
    ):
        import re as _re

        from lucene_spark.analysis.tokenizer import (
            HAN_RANGES,
            HANGUL_RANGES,
            HIRAGANA_RANGES,
            KATAKANA_RANGES,
        )

        ranges = ""
        if han:
            ranges += HAN_RANGES
        if hiragana:
            ranges += HIRAGANA_RANGES
        if katakana:
            ranges += KATAKANA_RANGES
        if hangul:
            ranges += HANGUL_RANGES
        if not ranges:
            raise ValueError("at least one CJK script flag must be enabled")
        self._cjk_re = _re.compile(rf"^[{ranges}]+$")

    def is_cjk(self, term: str) -> bool:
        return bool(self._cjk_re.match(term))

    def apply(self, terms: list, pos) -> tuple[list, list]:
        """(terms, positions) -> bigrammed (terms, positions)."""
        out_t: list = []
        out_p: list = []
        i, n = 0, len(terms)
        new_pos = -1
        prev_orig = -1
        while i < n:
            if not self.is_cjk(terms[i]):
                new_pos += int(pos[i]) - prev_orig
                prev_orig = int(pos[i])
                out_t.append(terms[i])
                out_p.append(new_pos)
                i += 1
                continue
            j = i
            while (
                j + 1 < n
                and int(pos[j + 1]) == int(pos[j]) + 1
                and self.is_cjk(terms[j + 1])
            ):
                j += 1
            chars = "".join(terms[i : j + 1])
            incr_first = int(pos[i]) - prev_orig
            if len(chars) == 1:  # singleton: unigram passes through
                new_pos += incr_first
                out_t.append(chars)
                out_p.append(new_pos)
            else:
                for t in range(len(chars) - 1):
                    new_pos += incr_first if t == 0 else 1
                    out_t.append(chars[t : t + 2])
                    out_p.append(new_pos)
            prev_orig = int(pos[j])
            i = j + 1
        return out_t, out_p


class WordDelimiterGraph:
    """WordDelimiterGraphFilter — split tokens at intra-word delimiters,
    case changes and letter/number transitions
    (``miscellaneous/WordDelimiterGraphFilter.java:121``; boundary rules
    from ``miscellaneous/WordDelimiterIterator.java:40``). The filter the
    reference reaches for on source-code-like tokens: ``fooBar_baz2`` ->
    ``foo bar baz 2``.

    Index-time (post-FlattenGraphFilter) stream shape:

    - generated PARTS consume consecutive positions (posIncr 1 each; the
      first part takes the source token's position, preserving any
      stopword hole before it);
    - CATENATIONS (``catenate_words`` joins adjacent alpha parts,
      ``catenate_numbers`` adjacent digit parts, ``catenate_all`` joins
      everything) and the ``preserve_original`` token are OVERLAPS at
      their run's first emitted position (posIncr 0), so norms discount
      them — unless the run generated no parts at all (e.g.
      ``generate_word_parts=False, catenate_words=True``), in which case
      the catenation itself takes the position, matching the reference's
      single-token output for that config;
    - a run-of-one catenation is emitted only when its parts were NOT
      generated (the reference suppresses the verbatim duplicate);
    - a token with no split points passes through untouched (the
      iterator's isSingleWord fast path);
    - an all-delimiter token emits nothing and leaves a position hole
      (``preserve_original`` still emits it).

    ``stem_english_possessive`` strips a trailing ``'s`` (straight or
    curly apostrophe) before splitting, so ``O'Neil's`` -> ``O Neil``.

    Case rules: a lower->UPPER boundary splits; an UPPER-run followed by
    lowercase splits before its last upper (``ABCDef`` -> ``ABC Def``).
    Digits split from letters in both directions under
    ``split_on_numerics``.

    Pure (terms, positions) -> (terms, positions, emitted_n) transform
    over the CASED token texts — ``FilteredAnalyzer`` recovers them from
    the tokenizer's character offsets, because the reference chain runs
    this filter BEFORE LowerCaseFilter.
    """

    def __init__(
        self,
        generate_word_parts: bool = True,
        generate_number_parts: bool = True,
        split_on_case_change: bool = True,
        split_on_numerics: bool = True,
        stem_english_possessive: bool = True,
        catenate_words: bool = False,
        catenate_numbers: bool = False,
        catenate_all: bool = False,
        preserve_original: bool = False,
    ):
        self.generate_word_parts = generate_word_parts
        self.generate_number_parts = generate_number_parts
        self.split_on_case_change = split_on_case_change
        self.split_on_numerics = split_on_numerics
        self.stem_english_possessive = stem_english_possessive
        self.catenate_words = catenate_words
        self.catenate_numbers = catenate_numbers
        self.catenate_all = catenate_all
        self.preserve_original = preserve_original

    @staticmethod
    def _kind(ch: str) -> int:
        """0 delimiter, 1 lower, 2 upper, 3 digit (caseless letters count
        as lower — the iterator's ALPHA default)."""
        if ch.isdigit():
            return 3
        if ch.isalpha():
            return 2 if ch.isupper() else 1
        return 0

    def _parts(self, token: str) -> list[tuple[str, bool, bool]]:
        """(text, has_alpha, has_digit) per subword, in order."""
        if self.stem_english_possessive and len(token) >= 2:
            if token[-1] in ("s", "S") and token[-2] in ("'", "’"):
                token = token[:-2]
        kinds = [self._kind(ch) for ch in token]
        parts: list[tuple[str, bool, bool]] = []
        start = None
        n = len(token)
        for i in range(n + 1):
            k = kinds[i] if i < n else 0
            if start is None:
                if k != 0:
                    start = i
                continue
            boundary = False
            if k == 0:
                boundary = True
            else:
                prev = kinds[i - 1]
                if self.split_on_numerics and (prev == 3) != (k == 3):
                    boundary = True
                elif self.split_on_case_change and prev == 1 and k == 2:
                    boundary = True
                elif (
                    self.split_on_case_change
                    and prev == 2
                    and k == 1
                    and i - 1 > start
                    and kinds[i - 2] == 2
                ):
                    # UPPER-run followed by lower: split before last upper
                    sub = token[start : i - 1]
                    parts.append(
                        (sub, any(c.isalpha() for c in sub), any(c.isdigit() for c in sub))
                    )
                    start = i - 1
                    continue
            if boundary:
                sub = token[start:i]
                parts.append(
                    (sub, any(c.isalpha() for c in sub), any(c.isdigit() for c in sub))
                )
                start = None if k == 0 else i
        return parts

    def split(self, token: str) -> list[str]:
        """Generated part texts for one token (no catenations)."""
        return [
            t
            for t, ha, hd in self._parts(token)
            if (self.generate_word_parts and ha) or (self.generate_number_parts and hd)
        ]

    def _emit_token(self, token: str):
        """One input token -> ([(text, takes_position)], is_passthrough)."""
        parts = self._parts(token)
        if (
            len(parts) == 1
            and parts[0][0] == token
        ):
            return [(token, True)], True
        out: list[tuple[str, bool]] = []
        gen = [
            (self.generate_word_parts and ha) or (self.generate_number_parts and hd)
            for _, ha, hd in parts
        ]
        out.extend((t, True) for (t, _, _), g in zip(parts, gen) if g)

        def _catenate(select):
            runs: list[tuple[str, int, bool]] = []  # (joined, n_parts, any_generated)
            buf: list[str] = []
            any_gen = False
            for (t, ha, hd), g in zip(parts, gen):
                if select(ha, hd):
                    buf.append(t)
                    any_gen = any_gen or g
                elif buf:
                    runs.append(("".join(buf), len(buf), any_gen))
                    buf, any_gen = [], False
            if buf:
                runs.append(("".join(buf), len(buf), any_gen))
            for joined, n_parts, any_gen in runs:
                if n_parts >= 2 or not any_gen:
                    out.append((joined, False))

        if self.catenate_words:
            _catenate(lambda ha, hd: ha)
        if self.catenate_numbers:
            _catenate(lambda ha, hd: hd and not ha)
        if self.catenate_all and len(parts) >= 2:
            out.append(("".join(t for t, _, _ in parts), False))
        if self.preserve_original:
            out.append((token, False))
        return out, False

    def apply(self, terms: list, pos) -> tuple[list, list, int]:
        """(cased terms, positions) -> (terms, positions, emitted_n).

        ``emitted_n`` counts position-consuming tokens only (overlaps
        discounted, ``FieldInvertState.java:38-43``).
        """
        out_t: list = []
        out_p: list = []
        new_pos = -1
        prev_in = -1
        pending = 0
        emitted_n = 0
        for i, tok in enumerate(terms):
            gap = int(pos[i]) - prev_in
            prev_in = int(pos[i])
            emissions, _ = self._emit_token(tok)
            positional = [e for e in emissions if e[1]]
            overlaps = [e for e in emissions if not e[1]]
            if not positional and not overlaps:
                pending += gap
                continue
            if positional:
                first = True
                for t, _ in positional:
                    new_pos += (gap + pending) if first else 1
                    first = False
                    out_t.append(t)
                    out_p.append(new_pos)
                    emitted_n += 1
                anchor = out_p[-len(positional)]
                for t, _ in overlaps:
                    out_t.append(t)
                    out_p.append(anchor)
            else:
                # no generated parts: the catenation/original itself is
                # the token (reference single-token output)
                first = True
                for t, _ in overlaps:
                    new_pos += (gap + pending) if first else 0
                    first = False
                    out_t.append(t)
                    out_p.append(new_pos)
                emitted_n += 1
            pending = 0
        order = sorted(range(len(out_p)), key=lambda j: out_p[j])
        return [out_t[j] for j in order], [out_p[j] for j in order], emitted_n


def make_filter(spec):
    """Resolve a filter spec to a per-token callable:
    "ascii_folding" | "porter" | "light_de"/"light_fr"/"light_es"/
    "light_it"/"light_pt" (UniNE light stemmers, ``stemmers.py``) |
    SynonymMap instance | any callable."""
    if callable(spec):
        return spec
    if spec == "ascii_folding":
        return ascii_fold
    if spec == "scandinavian_normalization":
        return scandinavian_normalize
    if spec == "scandinavian_folding":
        return scandinavian_fold
    if spec == "elision_fr":
        return make_elision()
    if spec == "reverse_string":
        return reverse_string
    if spec == "porter":
        return porter_stem
    if spec == "cjk_width":
        return cjk_width
    if spec == "icu_folding":
        from lucene_spark.analysis.icu import icu_fold

        return icu_fold
    if spec == "icu_normalize":
        from lucene_spark.analysis.icu import icu_normalize

        return icu_normalize
    if isinstance(spec, str) and spec.startswith("snowball_"):
        from lucene_spark.analysis import snowball as sb

        by_lang = {
            "snowball_en": sb.english_snowball_stem,
            "snowball_de": sb.german_snowball_stem,
            "snowball_fr": sb.french_snowball_stem,
            "snowball_nl": sb.dutch_snowball_stem,
            "snowball_ru": sb.russian_snowball_stem,
            "snowball_sv": sb.swedish_snowball_stem,
            "snowball_no": sb.norwegian_snowball_stem,
            "snowball_da": sb.danish_snowball_stem,
            "snowball_es": sb.spanish_snowball_stem,
            "snowball_it": sb.italian_snowball_stem,
            "snowball_pt": sb.portuguese_snowball_stem,
            "snowball_ro": sb.romanian_snowball_stem,
            "snowball_fi": sb.finnish_snowball_stem,
            "snowball_hu": sb.hungarian_snowball_stem,
            "snowball_tr": sb.turkish_snowball_stem,
            "snowball_ga": sb.irish_snowball_stem,
            "snowball_hi": sb.hindi_snowball_stem,
            "snowball_hy": sb.armenian_snowball_stem,
            "snowball_lt": sb.lithuanian_snowball_stem,
            "snowball_ne": sb.nepali_snowball_stem,
            "snowball_eu": sb.basque_snowball_stem,
            "snowball_ca": sb.catalan_snowball_stem,
            "snowball_pl": sb.polish_snowball_stem,
            "snowball_sr": sb.serbian_snowball_stem,
            "snowball_et": sb.estonian_snowball_stem,
            "snowball_eo": sb.esperanto_snowball_stem,
            "snowball_yi": sb.yiddish_snowball_stem,
            "snowball_ar": sb.arabic_snowball_stem,
            "snowball_ta": sb.tamil_snowball_stem,
            "snowball_el": sb.greek_snowball_stem,
            # nl = the classic algorithm (round-3 spec, Dutch_porter);
            # nl_2024 = the revised Snowball 3.0 Dutch
            "snowball_nl_2024": sb.dutch2024_snowball_stem,
        }
        if spec in by_lang:
            return by_lang[spec]
    if isinstance(spec, str) and spec.startswith("phonetic_"):
        from lucene_spark.analysis import phonetic as ph

        encoders = {
            "phonetic_soundex": ph.soundex,
            "phonetic_refined_soundex": ph.refined_soundex,
            "phonetic_metaphone": ph.metaphone,
            "phonetic_double_metaphone": ph.double_metaphone,
            "phonetic_caverphone2": ph.caverphone2,
            "phonetic_nysiis": ph.nysiis,
            "phonetic_cologne": ph.cologne_phonetic,
        }
        if spec in encoders:
            # PhoneticFilter(inject=false) semantics: replace the token
            # with its code; empty/equal/raising encodes pass through
            return ph.phonetic_replace(encoders[spec])
    if isinstance(spec, str) and spec.startswith(("light_", "german_", "arabic_", "persian_", "hindi_", "minimal_", "sorani_", "plural_", "possessive_")):
        from lucene_spark.analysis import stemmers

        by_lang = {
            "light_de": stemmers.german_light_stem,
            "light_fr": stemmers.french_light_stem,
            "light_es": stemmers.spanish_light_stem,
            "light_it": stemmers.italian_light_stem,
            "light_pt": stemmers.portuguese_light_stem,
            "light_hu": stemmers.hungarian_light_stem,
            "light_sv": stemmers.swedish_light_stem,
            "light_no": stemmers.norwegian_light_stem,
            "light_ru": stemmers.russian_light_stem,
            "light_fi": stemmers.finnish_light_stem,
            "light_cs": stemmers.czech_light_stem,
            "arabic_normalization": stemmers.arabic_normalize,
            "light_ar": stemmers.arabic_stem,
            "light_bg": stemmers.bulgarian_stem,
            "persian_normalization": stemmers.persian_normalize,
            "hindi_normalization": stemmers.hindi_normalize,
            "light_hi": stemmers.hindi_light_stem,
            "minimal_en": stemmers.english_minimal_stem,
            "possessive_en": stemmers.english_possessive_strip,
            "light_id": stemmers.indonesian_stem,
            "minimal_de": stemmers.german_minimal_stem,
            "minimal_fr": stemmers.french_minimal_stem,
            "sorani_normalization": stemmers.sorani_normalize,
            "light_ckb": stemmers.sorani_stem,
            "plural_es": stemmers.spanish_plural_stem,
            "light_lv": stemmers.latvian_stem,
            "minimal_no": stemmers.norwegian_minimal_stem,
            "german_normalization": stemmers.german_normalize,
        }
        if spec in by_lang:
            return by_lang[spec]
    raise ValueError(f"unknown token filter {spec!r}")


class FilteredAnalyzer:
    """StandardAnalyzer + a chain of per-token filters, plus optional
    word-shingle / char-ngram expansion.

    1:1 filters (fold/stem/synonym) preserve positions and counts; the
    expanders emit EXTRA tokens at the source position (posIncr 0), so
    field length (= norm input) still counts only the base tokens minus
    overlaps, matching ``FieldInvertState`` discountOverlaps semantics.
    Drop-in for StandardAnalyzer in the index build (forces the Python
    invert pass) and in ``tests/oracle.py``'s OracleIndex.
    """

    def __init__(
        self,
        base=None,
        filters: tuple = (),
        shingle_size: int = 0,
        char_ngram: int = 0,
        cjk_bigrams: CJKBigrams | None = None,
        word_delimiter: WordDelimiterGraph | None = None,
        common_grams=None,
        overlay_filters: tuple = (),
        char_filters: tuple = (),
        shingle_min_size: int = 0,
        shingle_filler: str | None = None,
    ):
        from lucene_spark.analysis.tokenizer import StandardAnalyzer

        self.base = base or StandardAnalyzer()
        #: runs FIRST, on the CASED token texts recovered via character
        #: offsets (the reference chain puts WordDelimiterGraphFilter
        #: before LowerCaseFilter); its outputs are then lowercased and
        #: flow through the 1:1 filters / expanders like base tokens
        self.word_delimiter = word_delimiter
        self.filters = tuple(make_filter(f) for f in filters)
        self.shingle_size = shingle_size
        #: faithful ShingleFilter mode: set a filler (e.g. "_") to bridge
        #: stopword holes and optionally a min size for [min, max] ranges
        self.shingle_min_size = shingle_min_size
        self.shingle_filler = shingle_filler
        self.char_ngram = char_ngram
        #: applied right after the tokenizer, before 1:1 filters and
        #: expanders — the reference chain order (CJKAnalyzer:
        #: StandardTokenizer -> CJKBigramFilter -> LowerCaseFilter ...;
        #: lowercasing commutes with bigramming on CJK codepoints)
        self.cjk_bigrams = cjk_bigrams
        #: commongrams/CommonGramsFilter.java:43 — bigram overlays over
        #: common words (analysis/commongrams.py CommonGrams instance)
        self.common_grams = common_grams
        #: generic per-token overlay expanders: each callable maps a term
        #: to EXTRA terms emitted at the same position (posIncr-0, norms
        #: discount them) — the KeywordRepeatFilter.java:33 shape (emit
        #: the original plus its stem) and PhoneticFilter inject=true
        self.overlay_filters = tuple(overlay_filters)
        #: text->text transforms applied BEFORE tokenization (the
        #: charfilter package: html_strip / mapping / pattern replace);
        #: offsets are uncorrected, so offset paths raise with these
        self.char_filters = tuple(char_filters)
        self.max_token_length = self.base.max_token_length
        self.stopwords = self.base.stopwords

    def _apply(self, term: str) -> str:
        for f in self.filters:
            term = f(term)
        return term

    def _chars(self, text: str) -> str:
        for cf in self.char_filters:
            text = cf(text)
        return text

    def term_position_arrays(self, text: str):
        import numpy as np

        text = self._chars(text)

        if self.word_delimiter is not None:
            from lucene_spark.analysis.tokenizer import java_lower

            _, bpos, offs, _ = self.base.term_position_offset_arrays(text)
            cased = [text[int(s) : int(e)] for s, e in offs]
            wterms, wpos, n = self.word_delimiter.apply(cased, bpos)
            terms = [java_lower(t) for t in wterms]
            pos = np.asarray(wpos, dtype=np.int32)
        else:
            terms, pos, n = self.base.term_position_arrays(text)
        # 1:1 filters run BEFORE bigramming — the reference chain order
        # (CJKAnalyzer: tokenizer -> CJKWidthFilter -> LowerCase ->
        # CJKBigramFilter), so width-folded halfwidth kana join bigrams
        terms = [self._apply(t) for t in terms]
        if "" in terms:
            # removal filters (Length/KeepWord/...) emit "" to DROP the
            # token: positions keep their holes, field length shrinks
            keep = [i for i, t in enumerate(terms) if t != ""]
            n -= len(terms) - len(keep)
            terms = [terms[i] for i in keep]
            pos = np.asarray([int(pos[i]) for i in keep], dtype=np.int32)
        if self.cjk_bigrams is not None:
            terms, pos = self.cjk_bigrams.apply(terms, pos)
            pos = np.asarray(pos, dtype=np.int32)
            n = len(terms)  # bigrams consume positions: norm length changes
        phrase_maps = [
            f for f in self.filters if isinstance(f, SynonymMap) and f.phrases
        ]
        if (
            not self.shingle_size
            and not self.char_ngram
            and not phrase_maps
            and self.common_grams is None
            and not self.overlay_filters
        ):
            return terms, pos, n
        out_t = list(terms)
        out_p = list(pos)
        if self.common_grams is not None:
            gt, gp = self.common_grams.grams(terms, pos)
            out_t.extend(gt)
            out_p.extend(gp)
        for ov in self.overlay_filters:
            for t, p in zip(terms, pos):
                for extra in ov(t):
                    if extra and extra != t:
                        out_t.append(extra)
                        out_p.append(int(p))
        for m in phrase_maps:
            for p, canon in m.phrase_matches(terms, pos):
                out_t.append(canon)
                out_p.append(p)
        if self.shingle_filler is not None and self.shingle_size >= 2:
            # FULL ShingleFilter semantics: windows bridge stopword holes
            # with the filler token (unigrams are the base tokens already
            # in the stream; the index layer has no end-state attribute,
            # so trailing holes do not extend the window space)
            st, sp = shingle_stream(
                terms,
                [int(x) for x in pos],
                min_size=self.shingle_min_size or self.shingle_size,
                max_size=self.shingle_size,
                filler=self.shingle_filler,
                output_unigrams=False,
            )
            out_t.extend(st)
            out_p.extend(sp)
        elif self.shingle_size >= 2:
            s = self.shingle_size
            for i in range(len(terms) - s + 1):
                # contiguous-position check: shingles never bridge gaps
                # left by skipped over-long tokens (the no-filler fast path)
                if pos[i + s - 1] - pos[i] == s - 1:
                    out_t.append(" ".join(terms[i : i + s]))
                    out_p.append(pos[i])
        if self.char_ngram >= 2:
            g = self.char_ngram
            for t, p in zip(terms, pos):
                for j in range(len(t) - g + 1):
                    out_t.append(t[j : j + g])
                    out_p.append(p)
        order = np.argsort(np.asarray(out_p, dtype=np.int64), kind="stable")
        return (
            [out_t[i] for i in order],
            np.asarray(out_p, dtype=np.int32)[order],
            n,  # emitted length counts base tokens only (overlaps discounted)
        )

    def term_position_offset_arrays(self, text: str):
        """Offsets variant for ``IndexConfig(with_offsets=True)``.

        Char filters raise here — they shift character offsets and this
        engine does not carry the reference's offset-correction map.

        1:1 term filters rewrite the term text but keep each token's
        character span in the ORIGINAL text (OffsetAttribute is untouched
        by TokenFilters like LowerCaseFilter/PorterStemFilter in the
        reference), so the base offsets pass through. Expanding filters
        (shingles, char n-grams, phrase synonyms) emit tokens with no
        single source span and raise.
        """
        if (
            self.shingle_size
            or self.char_ngram
            or self.cjk_bigrams is not None
            or self.word_delimiter is not None
            or self.common_grams is not None
            or self.overlay_filters
            or self.char_filters
            or any(isinstance(f, SynonymMap) and f.phrases for f in self.filters)
        ):
            raise NotImplementedError(
                "offsets with expanding filters (shingle/char_ngram/"
                "cjk_bigrams/word_delimiter/common_grams/overlays/"
                "phrase synonyms) are not "
                "supported — expanded tokens have no single character span"
            )
        terms, pos, offs, n = self.base.term_position_offset_arrays(text)
        terms = [self._apply(t) for t in terms]
        if "" in terms:
            keep = [i for i, t in enumerate(terms) if t != ""]
            n -= len(terms) - len(keep)
            terms = [terms[i] for i in keep]
            pos = pos[keep]
            offs = offs[keep]
        return terms, pos, offs, n

    def tokens(self, text: str):
        """Token objects (overlap-emitting expanders raise; CJK bigrams
        are a 1-token-per-position stream, so tokens() stays well-defined —
        bigram character offsets are not tracked and read -1)."""
        if (
            self.shingle_size
            or self.char_ngram
            or self.common_grams is not None
            or self.overlay_filters
            or any(isinstance(f, SynonymMap) and f.phrases for f in self.filters)
        ):
            raise NotImplementedError("tokens() with expanders; use arrays")
        from lucene_spark.analysis.tokenizer import Token

        if (
            self.cjk_bigrams is not None
            or self.word_delimiter is not None
            or self.char_filters
        ):
            terms, pos, _ = self.term_position_arrays(text)
            return [Token(t, int(p), -1, -1) for t, p in zip(terms, pos)]
        return [
            Token(self._apply(t.term), t.position, t.start_offset, t.end_offset)
            for t in self.base.tokens(text)
        ]

    def terms(self, text: str) -> list[str]:
        t, _, _ = self.term_position_arrays(text)
        return t

    def emitted_count(self, text: str) -> int:
        if (
            self.cjk_bigrams is not None
            or self.word_delimiter is not None
            or self.char_filters
            # removal filters shrink the field length; factories mark
            # themselves with `removes_tokens = True` (custom removing
            # callables must set the same attribute)
            or any(getattr(f, "removes_tokens", False) for f in self.filters)
        ):
            # bigramming changes the emitted-token count (n chars -> n-1
            # bigrams per run); norms must see the post-filter count
            _, _, n = self.term_position_arrays(text)
            return n
        return self.base.emitted_count(text)


# ---------------------------------------------------------------------------
# Scandinavian interchange filters
# (miscellaneous/ScandinavianNormalizer.java:30 — å/ä→æ/ö→ø plus the
# aa/ao/ae/oe/oo digraph foldings — and ScandinavianFoldingFilter.java:30,
# the more aggressive fold-to-ascii variant)
# ---------------------------------------------------------------------------


def scandinavian_normalize(term: str) -> str:
    out: list[str] = []
    i, n = 0, len(term)
    while i < n:
        ch = term[i]
        nxt = term[i + 1] if i + 1 < n else ""
        if ch == "ä":
            out.append("æ")
        elif ch == "Ä":
            out.append("Æ")
        elif ch == "ö":
            out.append("ø")
        elif ch == "Ö":
            out.append("Ø")
        elif ch == "a" and nxt in ("a", "A", "o", "O"):
            out.append("å")
            i += 1
        elif ch == "A" and nxt in ("a", "A", "o", "O"):
            out.append("Å")
            i += 1
        elif ch == "a" and nxt in ("e", "E"):
            out.append("æ")
            i += 1
        elif ch == "A" and nxt in ("e", "E"):
            out.append("Æ")
            i += 1
        elif ch == "o" and nxt in ("e", "E", "o", "O"):
            out.append("ø")
            i += 1
        elif ch == "O" and nxt in ("e", "E", "o", "O"):
            out.append("Ø")
            i += 1
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def scandinavian_fold(term: str) -> str:
    out: list[str] = []
    i, n = 0, len(term)
    while i < n:
        ch = term[i]
        nxt = term[i + 1] if i + 1 < n else ""
        if ch in "åäæ":
            out.append("a")
        elif ch in "ÅÄÆ":
            out.append("A")
        elif ch in "øö":
            out.append("o")
        elif ch in "ØÖ":
            out.append("O")
        elif ch in "aA" and nxt in ("a", "A", "e", "E", "o", "O"):
            out.append(ch)
            i += 1
        elif ch in "oO" and nxt in ("e", "E", "o", "O"):
            out.append(ch)
            i += 1
        else:
            out.append(ch)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# ElisionFilter (util/ElisionFilter.java:33) — strip a leading article
# before an apostrophe: l'avion -> avion. Default article set =
# FrenchAnalyzer.DEFAULT_ARTICLES.
# ---------------------------------------------------------------------------

FRENCH_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)


def make_elision(articles=FRENCH_ARTICLES):
    articles = frozenset(a.lower() for a in articles)

    def elide(term: str) -> str:
        for apo in ("'", "’"):
            idx = term.find(apo)
            if idx >= 0:
                if term[:idx].lower() in articles:
                    return term[idx + 1 :]
                return term
        return term

    return elide


# ---------------------------------------------------------------------------
# Token-removing filters: a chain filter that returns "" DROPS the token
# (FilteringTokenFilter role — the position hole is kept because our
# positions are absolute; field length shrinks like the reference's)
# ---------------------------------------------------------------------------


def make_length_filter(min_len: int, max_len: int):
    """miscellaneous/LengthFilter.java:29 — keep tokens whose char count
    is within [min_len, max_len]."""

    def f(term: str) -> str:
        return term if min_len <= len(term) <= max_len else ""

    f.removes_tokens = True
    return f


def make_codepoint_count_filter(min_cp: int, max_cp: int):
    """miscellaneous/CodepointCountFilter.java:29 — like LengthFilter but
    counting codepoints (identical in Python, where len() is codepoints;
    kept as its own factory for parity)."""
    return make_length_filter(min_cp, max_cp)


def make_keep_word_filter(words):
    """miscellaneous/KeepWordFilter.java:27 — keep ONLY the listed words."""
    keep = frozenset(words)

    def f(term: str) -> str:
        return term if term in keep else ""

    f.removes_tokens = True
    return f


def make_truncate_filter(length: int):
    """miscellaneous/TruncateTokenFilter.java:27 — cap every token at
    `length` chars."""

    def f(term: str) -> str:
        return term[:length]

    return f


def reverse_string(term: str) -> str:
    """reverse/ReverseStringFilter.java:38 — the leading-wildcard trick."""
    return term[::-1]


def make_keyword_marker(protected, stemmer):
    """KeywordMarkerFilter + a downstream stemmer
    (miscellaneous/SetKeywordMarkerFilter.java:28): tokens in the
    protected set skip stemming (the KeywordAttribute contract every
    stemmer in the reference honors)."""
    protected = frozenset(protected)

    def f(term: str) -> str:
        return term if term in protected else stemmer(term)

    return f


def make_stemmer_override(overrides, stemmer):
    """StemmerOverrideFilter (miscellaneous/StemmerOverrideFilter.java:36):
    dictionary-forced stems win over the algorithmic stemmer (and mark
    the token as keyword, so the stemmer never touches it)."""
    table = dict(overrides)

    def f(term: str) -> str:
        forced = table.get(term)
        return forced if forced is not None else stemmer(term)

    return f


def shingle_stream(
    terms,
    positions,
    min_size: int = 2,
    max_size: int = 2,
    separator: str = " ",
    filler: str = "_",
    output_unigrams: bool = True,
    trailing_holes: int = 0,
):
    """The FULL ShingleFilter semantics (shingle/ShingleFilter.java:72)
    over a (terms, positions) stream with stopword holes:

    - windows of every size in [min_size, max_size] start at EVERY
      position (holes included), substituting ``filler`` for positions
      with no token; windows containing no real token are dropped, and a
      window never extends past the last position (+ the stream-end
      ``trailing_holes``, the reference's end-state posIncr);
    - unigrams are emitted for real tokens when ``output_unigrams``;
    - emission order per position: unigram, then sizes ascending — the
      reference fixture order, replayed exactly for the bigram/trigram,
      internal-hole and trailing-hole tables of TestShingleFilter in
      ``tests/test_shingles.py``.

    Returns (out_terms, out_positions); shingles sit at their window's
    start position (posIncr-0 overlays after a unigram, fresh positions
    at holes, matching the reference's increments)."""
    occupied = {int(p): t for t, p in zip(terms, positions)}
    if not occupied:
        return [], []
    max_pos = max(occupied) + int(trailing_holes)
    out_t: list[str] = []
    out_p: list[int] = []
    for p in range(0, max_pos + 1):
        tok = occupied.get(p)
        if tok is not None and output_unigrams:
            out_t.append(tok)
            out_p.append(p)
        for s in range(min_size, max_size + 1):
            if p + s - 1 > max_pos:
                break
            if not any(i in occupied for i in range(p, p + s)):
                continue  # all-filler windows never emit
            window = [occupied.get(i, filler) for i in range(p, p + s)]
            out_t.append(separator.join(window))
            out_p.append(p)
    return out_t, out_p
