"""Beider-Morse Phonetic Matching (BMPM) — the engine behind the
reference's ``analysis/phonetic/.../BeiderMorseFilter.java:39`` (which
wraps commons-codec's ``language/bm/PhoneticEngine``).

This is a clean-room implementation of the PUBLISHED algorithm (Beider &
Morse, "Phonetic Matching: A Better Soundex", Avotaynu 2008; the
commons-codec ``language/bm`` rule-file format documentation) — the part
the reference itself treats as an external engine:

- **language guessing**: ordered (pattern, language-set, accept) rules
  narrow a name's candidate languages before phonetic rules apply;
- **phonetic rules**: 4-tuples ``(pattern, left-context, right-context,
  phoneme-alternatives)``; at each position the FIRST rule (file order)
  whose pattern matches and whose anchored regex contexts hold fires,
  appending its phoneme alternatives and advancing by the pattern length;
- **language-qualified phonemes**: an alternative like ``ts[slavic]``
  only survives for names whose language set intersects the qualifier —
  tracked per phoneme expression through the whole derivation;
- **final rules** (common + language-specific, approx or exact tier)
  post-process each phoneme the same way;
- the result is the ``|``-joined set of surviving phonemes (capped), the
  exact shape BeiderMorseFilter splits back into tokens with its
  ``([^()|-]+)`` matcher.

Like hunspell's .dic/.aff and the CJK segmenter's word table, the RULE
SET is data: ``Ruleset`` accepts any rules in the commons-codec
``lang.X`` / phoneme-tuple format, so the full published BMPM tables
drop in as files. The built-in ``DEFAULT_RULES`` is a compact
starter set (documented below) that exercises every engine feature and
produces the headline BMPM behavior — cross-spelling matches like
Schwarz/Shvarts or Weiss/Vais — without bundling the full tables.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass

__all__ = [
    "Lang",
    "Rule",
    "Ruleset",
    "PhoneticEngine",
    "DEFAULT_RULES",
    "beider_morse",
]

ANY_LANGUAGE = frozenset(["any"])


def _lang_match(a: frozenset, b: frozenset) -> bool:
    return "any" in a or "any" in b or bool(a & b)


def _lang_restrict(a: frozenset, b: frozenset) -> frozenset:
    if "any" in a:
        return b
    if "any" in b:
        return a
    return a & b


@dataclass(frozen=True)
class Lang:
    """One language-guessing rule (lang.X file row): if ``pattern``
    matches anywhere in the name, the languages are accepted
    (``accept=True``) or struck out (``accept=False``)."""

    pattern: str
    languages: frozenset
    accept: bool

    def __post_init__(self):
        object.__setattr__(self, "_rx", re.compile(self.pattern))


@dataclass(frozen=True)
class Rule:
    """One phonetic rule: ``pattern`` at the cursor, ``lcontext`` as an
    end-anchored regex over the text to the left, ``rcontext`` as a
    start-anchored regex over the text to the right, and ``phonemes`` as
    ``|``-separated alternatives, each optionally ``[lang1+lang2]``
    qualified. Empty contexts always match."""

    pattern: str
    lcontext: str
    rcontext: str
    phoneme: str

    def __post_init__(self):
        object.__setattr__(
            self, "_l", re.compile("(" + (self.lcontext or "") + ")$")
        )
        object.__setattr__(
            self, "_r", re.compile("^(" + (self.rcontext or "") + ")")
        )
        alts = []
        for alt in self.phoneme.split("|"):
            m = re.fullmatch(r"([^\[\]]*)(?:\[([^\]]+)\])?", alt)
            text, langs = m.group(1), m.group(2)
            alts.append(
                (text, frozenset(langs.split("+")) if langs else ANY_LANGUAGE)
            )
        object.__setattr__(self, "_alts", tuple(alts))

    def matches(self, word: str, pos: int) -> bool:
        if not word.startswith(self.pattern, pos):
            return False
        if self.lcontext and not self._l.search(word[:pos]):
            return False
        if self.rcontext and not self._r.search(word[pos + len(self.pattern):]):
            return False
        return True


@dataclass
class Ruleset:
    """A full BMPM rule database: language guessing + main phonetic
    rules + approx/exact final rules (common and per-language)."""

    languages: frozenset
    lang_rules: tuple
    rules: tuple           # main phonetic rules (file order)
    final_common: dict     # {"approx": (...), "exact": (...)}
    final_by_lang: dict    # {"approx": {lang: (...)}, "exact": {...}}

    def guess_languages(self, name: str) -> frozenset:
        remaining = set(self.languages)
        for lr in self.lang_rules:
            if lr._rx.search(name):
                if lr.accept:
                    remaining &= set(lr.languages)
                else:
                    remaining -= set(lr.languages)
        return frozenset(remaining) if remaining else self.languages


class PhoneticEngine:
    """commons-codec PhoneticEngine's role: encode(name) -> 'a|b|...'."""

    def __init__(self, ruleset: Ruleset, rule_type: str = "approx",
                 max_phonemes: int = 20):
        if rule_type not in ("approx", "exact"):
            raise ValueError("rule_type must be approx or exact")
        self.ruleset = ruleset
        self.rule_type = rule_type
        self.max_phonemes = max_phonemes

    def _apply_rules(self, word: str, rules, langs: frozenset):
        """-> set of (phoneme, language-set) for the whole word."""
        results = {("", langs)}
        i = 0
        n = len(word)
        while i < n:
            fired = None
            for r in rules:
                if r.matches(word, i):
                    fired = r
                    break
            if fired is None:
                step, alts = 1, (("", ANY_LANGUAGE),)
                # unmatched characters are dropped (commons-codec appends
                # nothing for letters no rule covers)
                alts = ((word[i], ANY_LANGUAGE),)
            else:
                step = len(fired.pattern) or 1
                alts = fired._alts
            nxt = set()
            for (acc, alangs) in results:
                for (text, plangs) in alts:
                    if not _lang_match(alangs, plangs):
                        continue
                    nxt.add((acc + text, _lang_restrict(alangs, plangs)))
                if not nxt:
                    pass
            if nxt:
                results = nxt
            if len(results) > 4 * self.max_phonemes:
                results = set(itertools.islice(sorted(results), 4 * self.max_phonemes))
            i += step
        return results

    def encode(self, name: str, languages: frozenset | None = None) -> str:
        name = name.lower()
        rs = self.ruleset
        langs = languages or rs.guess_languages(name)
        # multi-part names (d'angelo, de la cruz): encode each part and
        # the concatenation, join with '-', like the reference's engine
        parts = [p for p in re.split(r"[\s'-]+", name) if p]
        if len(parts) > 1:
            encoded = [self._encode_word(p, langs) for p in parts]
            encoded.append(self._encode_word("".join(parts), langs))
            return "-".join("(" + e + ")" for e in encoded)
        return self._encode_word(name, langs)

    def _encode_word(self, word: str, langs: frozenset) -> str:
        results = self._apply_rules(word, self.ruleset.rules, langs)
        finals = list(self.ruleset.final_common.get(self.rule_type, ()))
        out = set()
        for (ph, plangs) in results:
            per_lang = self.ruleset.final_by_lang.get(self.rule_type, {})
            lang_rules = []
            for lg in sorted(plangs):
                lang_rules.extend(per_lang.get(lg, ()))
            refined = self._apply_rules(ph, tuple(finals) + tuple(lang_rules),
                                        plangs)
            for (p2, _) in refined:
                out.add(p2)
        if self.rule_type == "approx":
            # starter-set simplification: collapse folded-vowel runs so
            # one-pass finals behave like BMPM's larger sequence rules
            out = {re.sub(r"a+", "a", p) for p in out}
        phonemes = sorted(p for p in out if p)[: self.max_phonemes]
        return "|".join(phonemes)


# --------------------------------------------------------------------------
# A compact generic ruleset. This is deliberately SMALL — a starter
# lexicon in the real rule-file format that exercises language guessing,
# contexts, language-qualified alternatives and final rules. The full
# published BMPM tables are drop-in replacements.
# --------------------------------------------------------------------------

_L = frozenset
_LANGS = _L(["english", "german", "french", "spanish", "polish", "russian",
             "italian"])

_LANG_RULES = (
    Lang("tsch", _L(["german"]), True),
    Lang("sch", _L(["german", "english"]), True),
    Lang("cz|rz|sz|prz", _L(["polish"]), True),
    Lang("eau$", _L(["french"]), True),
    Lang("aux$", _L(["french"]), True),
    Lang("gn", _L(["french", "italian"]), True),
    Lang("ao|ll", _L(["spanish"]), True),
    Lang("[aeiou]{3}", _L(["italian"]), True),
    Lang("w", _L(["french", "spanish", "italian"]), False),
    Lang("k", _L(["french", "spanish", "italian"]), False),
)

_RULES = (
    # multigraph consonants first (file order == priority)
    Rule("tsch", "", "", "tS"),
    Rule("tch", "", "", "tS"),
    Rule("sch", "", "", "S"),
    Rule("shch", "", "", "StS"),
    Rule("sh", "", "", "S"),
    Rule("szcz", "", "", "StS"),
    Rule("sz", "", "", "S"),
    Rule("cz", "", "", "tS"),
    Rule("ch", "", "", "x[german+polish]|tS[english]|S[french]"),
    Rule("th", "", "", "t"),
    Rule("ph", "", "", "f"),
    Rule("qu", "", "", "kv[german]|k"),
    Rule("gn", "", "", "n[french+italian]|gn"),
    Rule("rz", "", "", "Z[polish]|rz"),
    Rule("ck", "", "", "k"),
    Rule("tz", "", "", "ts"),
    Rule("dt", "", "", "t"),
    Rule("ss", "", "", "s"),
    Rule("ll", "", "", "l|j[spanish]"),
    # vowels / diphthongs
    Rule("ei", "", "", "aj|ej"),
    Rule("ey", "", "", "aj|ej"),
    Rule("ai", "", "", "aj|ej"),
    Rule("au", "", "", "o|av"),
    Rule("eu", "", "", "oj|ev"),
    Rule("oi", "", "", "oj"),
    Rule("oy", "", "", "oj"),
    Rule("aj", "", "", "aj"),
    Rule("ej", "", "", "ej"),
    Rule("oj", "", "", "oj"),
    Rule("ee", "", "", "i"),
    Rule("oo", "", "", "u"),
    Rule("ou", "", "", "u"),
    # single letters with contexts
    Rule("c", "", "[eiy]", "s[english+french]|ts[polish]|tS[spanish+italian]|k"),
    Rule("c", "", "", "k"),
    Rule("g", "", "[eiy]", "dZ[english+italian]|Z[french]|g"),
    Rule("g", "", "", "g"),
    Rule("j", "", "", "j[german]|dZ[english]|Z[french]|x[spanish]"),
    Rule("w", "", "", "v"),
    Rule("v", "", "", "v|f[german]"),
    Rule("b", "", "$", "b|p[german]"),
    Rule("d", "", "$", "d|t[german]"),
    Rule("s", "", "[aeiouy]", "z[german]|s"),
    Rule("x", "", "", "ks"),
    Rule("z", "", "", "ts[german+italian]|z"),
    Rule("y", "^", "", "j"),
    Rule("y", "", "", "i"),
    Rule("h", "[aeiou]", "", ""),  # silent h after a vowel
    Rule("a", "", "", "a"),
    Rule("e", "", "", "e"),
    Rule("i", "", "", "i"),
    Rule("o", "", "", "o"),
    Rule("u", "", "", "u"),
    Rule("b", "", "", "b"),
    Rule("d", "", "", "d"),
    Rule("f", "", "", "f"),
    Rule("k", "", "", "k"),
    Rule("l", "", "", "l"),
    Rule("m", "", "", "m"),
    Rule("n", "", "", "n"),
    Rule("p", "", "", "p"),
    Rule("r", "", "", "r"),
    Rule("s", "", "", "s"),
    Rule("t", "", "", "t"),
    Rule("h", "", "", "h"),
)

# approx tier folds fine distinctions (the BMPM idea: approximate
# matching collapses voiced/unvoiced and vowel color); exact keeps them
_FINAL_APPROX = (
    Rule("ts", "", "", "s"),
    Rule("tS", "", "", "S"),
    Rule("dZ", "", "", "S"),
    Rule("Z", "", "", "S"),
    Rule("b", "", "", "p"),
    Rule("d", "", "", "t"),
    Rule("g", "", "", "k"),
    Rule("v", "", "", "f"),
    Rule("z", "", "", "s"),
    Rule("aj", "", "", "i"),
    Rule("ej", "", "", "i"),
    Rule("oj", "", "", "i"),
    Rule("e", "", "", "a"),
    Rule("i", "", "", "a"),
    Rule("o", "", "", "a"),
    Rule("u", "", "", "a"),
    Rule("aa", "", "", "a"),
)
_FINAL_EXACT = ()

DEFAULT_RULES = Ruleset(
    languages=_LANGS,
    lang_rules=_LANG_RULES,
    rules=_RULES,
    final_common={"approx": _FINAL_APPROX, "exact": _FINAL_EXACT},
    final_by_lang={"approx": {}, "exact": {}},
)

_DEFAULT_ENGINE: dict = {}


def beider_morse(term: str, rule_type: str = "approx") -> str:
    """Encode one token to its BMPM expression ('a|b|...'), the string
    BeiderMorseFilter buffers and re-splits into tokens at the same
    position (posIncr 0 for alternates)."""
    if rule_type not in _DEFAULT_ENGINE:
        _DEFAULT_ENGINE[rule_type] = PhoneticEngine(
            DEFAULT_RULES, rule_type=rule_type
        )
    return _DEFAULT_ENGINE[rule_type].encode(term)


def beider_morse_terms(term: str, rule_type: str = "approx") -> list[str]:
    """The token-stream view: the distinct phonemes, like the filter's
    ``([^()|-]+)`` matcher emits them."""
    return [m.group(1) for m in
            re.finditer(r"([^()|-]+)", beider_morse(term, rule_type))]


# --------------------------------------------------------------------------
# commons-codec bm file-format loaders — the data seam: the published BMPM
# tables (org/apache/commons/codec/language/bm/*.txt) load through these
# verbatim.  Formats per the commons-codec sources' documented syntax:
#
# - rules files: one rule per line as four quoted strings
#   ``"pattern" "lcontext" "rcontext" "phoneme"``; ``//`` comments
#   (whole-line or trailing); ``#include <resource>`` splices another
#   rules file at that point (Rule.java's parsePhoneticRules include
#   handling); blank lines skipped; ``/* ... */`` block comments.
# - lang files: one guess rule per line, three whitespace-separated
#   fields ``pattern languages true|false`` with ``+``-joined language
#   sets (Lang.java's loadFromResource format).
# - languages files: one language name per line.
# --------------------------------------------------------------------------


def _strip_bm_comments(text: str) -> list[str]:
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    out = []
    for line in text.splitlines():
        line = line.split("//", 1)[0].strip()
        if line:
            out.append(line)
    return out


def parse_bm_lang(text: str) -> tuple:
    """lang.X file text -> tuple[Lang] (file order)."""
    rules = []
    for line in _strip_bm_comments(text):
        parts = line.split()
        if len(parts) != 3 or parts[2] not in ("true", "false"):
            raise ValueError(f"bm lang file: need 'pattern langs bool' in {line!r}")
        rules.append(
            Lang(parts[0], frozenset(parts[1].split("+")), parts[2] == "true")
        )
    return tuple(rules)


def parse_bm_languages(text: str) -> frozenset:
    """languages.X file text -> the language universe."""
    return frozenset(_strip_bm_comments(text))


_BM_RULE_RX = re.compile(
    r'^"((?:[^"\\]|\\.)*)"\s+"((?:[^"\\]|\\.)*)"\s+'
    r'"((?:[^"\\]|\\.)*)"\s+"((?:[^"\\]|\\.)*)"$'
)


def parse_bm_rules(text: str, include_resolver=None) -> tuple:
    """rules.X file text -> tuple[Rule] (file order).

    ``include_resolver(name) -> str`` supplies the text of
    ``#include name`` references (commons-codec resolves them against the
    classpath; here the caller maps names to file contents)."""
    rules = []
    for line in _strip_bm_comments(text):
        if line.startswith("#include"):
            name = line[len("#include"):].strip()
            if include_resolver is None:
                raise ValueError(
                    f"bm rules: '#include {name}' needs an include_resolver"
                )
            rules.extend(parse_bm_rules(include_resolver(name), include_resolver))
            continue
        m = _BM_RULE_RX.match(line)
        if m is None:
            raise ValueError(f"bm rules: need four quoted fields in {line!r}")
        pat, lc, rc, ph = (g.replace('\\"', '"') for g in m.groups())
        rules.append(Rule(pat, lc, rc, ph))
    return tuple(rules)


def format_bm_rules(rules) -> str:
    """Inverse of :func:`parse_bm_rules` — serialize Rule tuples into the
    commons-codec file syntax (used by the format round-trip tests; also
    handy for exporting a Ruleset as drop-in files)."""
    return "\n".join(
        f'"{r.pattern}" "{r.lcontext}" "{r.rcontext}" "{r.phoneme}"'
        for r in rules
    )
