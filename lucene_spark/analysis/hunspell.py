"""Hunspell dictionary-driven stemming and spell checking.

Re-expression of the reference's hunspell support
(``analysis/hunspell/Dictionary.java:1633``, ``Stemmer.java:710``,
``Hunspell.java:599``, ``AffixCondition.java:207``) as plain Python over
parsed ``.aff``/``.dic`` text: affix rules are indexed by their append
string in two dicts (prefixes / suffixes) instead of FSTs, and the
recursive affix-stripping walk mirrors the reference's
``removeAffixes``/``applyAffix`` parameter threading exactly —
outer/inner prefix/suffix slots, cross-product gating, continuation
classes, CIRCUMFIX/NEEDAFFIX/ONLYINCOMPOUND handling, COMPLEXPREFIXES
two-stage order, KEEPCASE + hidden-capitalized case logic, ICONV/OCONV
longest-match conversion, IGNORE stripping, BREAK recursion and numeric
tokens.

Spark integration is deliberately driver-light: a parsed dictionary is a
small plain-Python object that broadcasts to executors inside the
analyzer closure (the reference memory-maps its FST the same way per
index reader); per-token stemming is pure CPU with no per-token Spark
work.

The ``unmunch`` helper expands a dictionary in the GENERATION direction
(root + applicable affixes -> surface forms), independent of the
stripping-direction stemmer — tests cross-check the two, and the driver
oracle embeds its surface->stem map so DuckDB never needs the stemmer.
"""

from __future__ import annotations

import re
from typing import Iterable

__all__ = [
    "HunspellDictionary",
    "Hunspell",
    "HunspellStemFilter",
    "unmunch",
]

# sentinel flag for the hidden title-case variant of ALL-CAPS/mixed-case
# dictionary words (Dictionary.java:75 HIDDEN_FLAG / 'ONLYUPCASEFLAG')
_HIDDEN = "\x00HIDDEN"

# word-case classes (WordCase.java)
_UPPER, _TITLE, _LOWER, _MIXED, _NEUTRAL = "UPPER", "TITLE", "LOWER", "MIXED", "NEUTRAL"

# word contexts (WordContext.java)
SIMPLE_WORD = "SIMPLE_WORD"
COMPOUND_BEGIN = "COMPOUND_BEGIN"
COMPOUND_MIDDLE = "COMPOUND_MIDDLE"
COMPOUND_END = "COMPOUND_END"
COMPOUND_RULE_END = "COMPOUND_RULE_END"
_COMPOUND_CONTEXTS = {COMPOUND_BEGIN, COMPOUND_MIDDLE, COMPOUND_END, COMPOUND_RULE_END}


def _char_case(ch: str) -> str:
    if ch.isupper():
        return "U"
    # lowercase only when a CHAR-level uppercase exists (WordCase.charCase:
    # Character.toUpperCase('ß') == 'ß', so sharp-s and other chars whose
    # uppercase expands are case-NEUTRAL)
    if ch.islower():
        up = ch.upper()
        if len(up) == 1 and up != ch:
            return "L"
        return "N"
    return "N"


def _word_case(word: str) -> str:
    """WordCase.caseOf: classify by first char + whether upper/lower appear
    later."""
    start = _char_case(word[0])
    seen_upper = seen_lower = False
    for ch in word[1:]:
        c = _char_case(ch)
        seen_upper = seen_upper or c == "U"
        seen_lower = seen_lower or c == "L"
        if seen_upper and seen_lower:
            break
    if seen_upper and seen_lower:
        return _MIXED
    if start == "L":
        return _MIXED if seen_upper else _LOWER
    if start == "U":
        return _UPPER if not seen_lower else _TITLE
    return _LOWER if seen_lower else (_UPPER if seen_upper else _NEUTRAL)


class _Rule:
    """One PFX/SFX line: flag, cross-product, strip, append, continuation
    flags, compiled condition (a predicate over the de-affixed stem,
    strip NOT re-added — AffixCondition.java:67 acceptsStem)."""

    __slots__ = ("flag", "is_prefix", "cross", "strip", "append", "cont", "cond")

    def __init__(self, flag, is_prefix, cross, strip, append, cont, cond):
        self.flag = flag
        self.is_prefix = is_prefix
        self.cross = cross
        self.strip = strip
        self.append = append
        self.cont = cont  # frozenset of continuation flags
        self.cond = cond  # callable(stem_without_strip) -> bool


_ALWAYS_TRUE = lambda stem: True  # noqa: E731
_ALWAYS_FALSE = lambda stem: False  # noqa: E731


def _is_regexp(condition: str) -> bool:
    return "[" in condition or "." in condition or "-" in condition


def _char_patterns(condition: str) -> list[str]:
    """Split a hunspell condition into single-char patterns (literal char
    or one [..] class)."""
    out = []
    i = 0
    while i < len(condition):
        if condition[i] == "[":
            j = condition.index("]", i + 1)
            out.append(condition[i : j + 1])
            i = j + 1
        else:
            out.append(condition[i])
            i += 1
    return out


def _escape_pattern(pats: list[str]) -> str:
    """Rebuild a Python regex from char patterns: escape regex
    metacharacters hunspell treats literally (everything except '.', and
    the characters inside [..] classes; '-' is literal — the reference
    escapes it, AffixCondition.java escapeDash)."""
    parts = []
    for p in pats:
        if p.startswith("["):
            inner = p[1:-1]
            neg = inner.startswith("^")
            if neg:
                inner = inner[1:]
            # escape ] \ ^ and keep - literal by putting it last
            inner = inner.replace("\\", "\\\\").replace("]", "\\]")
            dash = "-" in inner
            inner = inner.replace("-", "")
            parts.append("[" + ("^" if neg else "") + inner + ("\\-" if dash else "") + "]")
        elif p == ".":
            parts.append(".")
        else:
            parts.append(re.escape(p))
    return "".join(parts)


def _compile_condition(is_prefix: bool, strip: str, condition: str):
    """AffixCondition.compile: check the strip part of the condition
    statically, return a predicate over the remaining head/tail of the
    de-affixed stem."""
    if condition == ".":
        return _ALWAYS_TRUE
    # tolerate unclosed [
    last = condition.rfind("[")
    if last >= 0 and "]" not in condition[last + 1 :]:
        condition = condition + "]"
    if not _is_regexp(condition):
        if not is_prefix and condition.endswith(strip):
            rest = condition[: len(condition) - len(strip)]
            return (lambda stem, r=rest: stem.endswith(r)) if rest else _ALWAYS_TRUE
        if is_prefix and condition.startswith(strip):
            rest = condition[len(strip) :]
            return (lambda stem, r=rest: stem.startswith(r)) if rest else _ALWAYS_TRUE
        return _ALWAYS_FALSE
    try:
        pats = _char_patterns(condition)
    except ValueError:
        return _ALWAYS_FALSE
    n = len(pats)
    if n <= len(strip):
        rx = re.compile(
            (".*" + _escape_pattern(pats)) if is_prefix else (_escape_pattern(pats) + ".*")
        )
        return _ALWAYS_TRUE if rx.fullmatch(strip) else _ALWAYS_FALSE
    if is_prefix:
        head, tail = pats[: len(strip)], pats[len(strip) :]
        if not re.fullmatch(_escape_pattern(head), strip):
            return _ALWAYS_FALSE
        rx = re.compile(_escape_pattern(tail))
        m = n - len(strip)
        return lambda stem, rx=rx, m=m: len(stem) >= m and rx.fullmatch(stem[:m]) is not None
    head, tail = pats[: n - len(strip)], pats[n - len(strip) :]
    if not re.fullmatch(_escape_pattern(tail), strip):
        return _ALWAYS_FALSE
    rx = re.compile(_escape_pattern(head))
    m = n - len(strip)
    return lambda stem, rx=rx, m=m: len(stem) >= m and rx.fullmatch(stem[-m:]) is not None


class RepEntry:
    """One REP table row (RepEntry.java:20): optional ^/$ anchors, '_' in
    the replacement means a space."""

    __slots__ = ("pattern", "replacement", "must_start", "must_end")

    def __init__(self, raw_pattern: str, raw_replacement: str):
        self.must_start = raw_pattern.startswith("^")
        self.must_end = raw_pattern.endswith("$")
        self.pattern = raw_pattern[
            1 if self.must_start else 0 : len(raw_pattern) - (1 if self.must_end else 0)
        ]
        self.replacement = raw_replacement.replace("_", " ")

    def is_middle(self) -> bool:
        return not self.must_start and not self.must_end

    def substitute(self, word: str) -> list[str]:
        p = self.pattern
        if self.must_start:
            ok = word == p if self.must_end else word.startswith(p)
            return [self.replacement + word[len(p):]] if ok else []
        if self.must_end:
            return (
                [word[: len(word) - len(p)] + self.replacement]
                if word.endswith(p)
                else []
            )
        out = []
        pos = word.find(p)
        while pos >= 0:
            out.append(word[:pos] + self.replacement + word[pos + len(p):])
            pos = word.find(p, pos + 1)
        return out


def _apply_conversions(text: str, table: list[tuple[str, str]]) -> str:
    """ICONV/OCONV longest-match-at-position replacement
    (ConvTable.java applyMappings)."""
    if not table:
        return text
    out = []
    i = 0
    n = len(text)
    while i < n:
        best_len = 0
        best_out = None
        for src, dst in table:
            ln = len(src)
            if ln > best_len and text.startswith(src, i):
                best_len, best_out = ln, dst
        if best_len:
            out.append(best_out)
            i += best_len
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


class HunspellDictionary:
    """Parsed .aff + .dic content (Dictionary.java:1633 role).

    ``words`` maps surface entry -> list of (frozenset_of_flags, morph)
    homonym entries; prefix/suffix rules are indexed by append string.
    Directives affecting suggestion generation only (TRY, REP, MAP, KEY,
    MAXNGRAMSUGS, ...) are parsed and ignored — suggestions are served by
    the engine's own spell module over the term dictionary.
    """

    def __init__(self):
        self.words: dict[str, list[tuple[frozenset, str]]] = {}
        self.prefixes: dict[str, list[_Rule]] = {}
        self.suffixes: dict[str, list[_Rule]] = {}
        self.flag_mode = "single"
        self.aliases: list[str] = []
        self._saw_af_count = False
        self.morph_aliases: list[str] = []
        self._saw_am_count = False
        self.keepcase = None
        self.needaffix = None
        self.forbiddenword = None
        self.onlyincompound = None
        self.circumfix = None
        self.forceucase = None
        self.nosuggest = None
        self.substandard = None
        self.complex_prefixes = False
        self.fullstrip = False
        self.checksharps = False
        self.ignore_case = False
        self.alternate_casing = False  # LANG tr/az dotted-i rules
        self.ignore: set[str] = set()
        self.iconv: list[tuple[str, str]] = []
        self.oconv: list[tuple[str, str]] = []
        self.breaks = (("-",), ("-",), ("-",))  # starting, ending, middle
        self.compound_min = 3
        self.compound_max = 1 << 30
        self.compound_flag = None
        self.compound_begin = None
        self.compound_middle = None
        self.compound_end = None
        self.compound_permit = None
        self.compound_forbid = None
        self.compound_rules: list[list] = []
        self.check_compound_case = False
        self.check_compound_dup = False
        self.check_compound_rep = False
        self.check_compound_triple = False
        self.simplified_triple = False
        self.check_compound_patterns: list[tuple] = []
        self.rep_table: list[RepEntry] = []
        self.second_stage_pfx: set = set()
        self.second_stage_sfx: set = set()
        self.wordpairs: set[str] = set()  # "word word" .dic entries (space kept)
        # suggestion-affecting directives (Dictionary.java:159-165 defaults)
        self.try_chars = ""
        self.neighbor_key_groups: tuple = ("qwertyuiop", "asdfghjkl", "zxcvbnm")
        self.enable_split_suggestions = True
        self.map_table: list[list[str]] = []
        self.max_ngram_suggestions = 4
        self.max_diff = 5
        self.only_max_diff = False
        self.language = ""

    # -- flag parsing ------------------------------------------------------

    def _parse_flags(self, raw: str) -> tuple:
        if not raw:
            return ()
        if self.flag_mode == "num":
            return tuple(p.strip() for p in raw.split(",") if p.strip())
        if self.flag_mode == "long":
            return tuple(raw[i : i + 2] for i in range(0, len(raw) - 1, 2))
        return tuple(raw)  # single / UTF-8: one char per flag

    def _parse_flag(self, raw: str) -> str:
        flags = self._parse_flags(raw.strip())
        return flags[0] if flags else None

    def _alias(self, flag_part: str) -> str:
        if self.aliases and flag_part:
            return self.aliases[int(flag_part) - 1]
        return flag_part

    # -- .aff parsing ------------------------------------------------------

    @classmethod
    def parse(cls, aff_text: str, dic_texts: str | Iterable[str], ignore_case: bool = False):
        d = cls()
        d.ignore_case = ignore_case
        d._read_aff(aff_text)
        if isinstance(dic_texts, str):
            dic_texts = [dic_texts]
        for t in dic_texts:
            d._read_dic(t)
        return d

    @classmethod
    def load(cls, aff_path, dic_paths, ignore_case: bool = False):
        """Read .aff/.dic files honoring the .aff SET charset directive."""
        aff_bytes = open(aff_path, "rb").read()
        charset = "latin-1"  # hunspell's default (Dictionary.java:77)
        m = re.search(rb"^SET\s+(\S+)", aff_bytes, re.MULTILINE)
        if m:
            name = m.group(1).decode("ascii", "replace").strip()
            charset = {
                "UTF-8": "utf-8",
                "ISO8859-1": "latin-1",
                "ISO8859-2": "iso8859-2",
                "ISO8859-15": "iso8859-15",
                "KOI8-R": "koi8-r",
                "microsoft-cp1251": "cp1251",
            }.get(name, name)
        if isinstance(dic_paths, (str, bytes)) or hasattr(dic_paths, "__fspath__"):
            dic_paths = [dic_paths]
        d = cls.parse(
            aff_bytes.decode(charset, "replace"),
            [open(p, "rb").read().decode(charset, "replace") for p in dic_paths],
            ignore_case=ignore_case,
        )
        d.charset = charset
        return d

    def _read_aff(self, text: str) -> None:
        lines = text.lstrip("﻿").splitlines()
        it = iter(range(len(lines)))
        i = 0

        def arg(line):
            parts = line.split()
            return parts[1] if len(parts) > 1 else ""

        flag_one = self._parse_flag
        while i < len(lines):
            line = lines[i].strip()
            i += 1
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            head = parts[0]
            if head == "FLAG":
                v = arg(line)
                self.flag_mode = {"long": "long", "num": "num", "UTF-8": "single"}.get(
                    v, "single"
                )
            elif head == "AF":
                # first AF line carries the count; later AF lines the values
                if len(parts) > 1 and not (self._saw_af_count or self.aliases):
                    self._saw_af_count = True
                elif len(parts) > 1:
                    self.aliases.append(parts[1])
            elif head == "AM":
                # morph-data aliases, same first-line-is-count convention
                if len(parts) > 1 and not (self._saw_am_count or self.morph_aliases):
                    self._saw_am_count = True
                elif len(parts) > 1:
                    self.morph_aliases.append(line.split(None, 1)[1])
            elif head in ("PFX", "SFX"):
                i = self._read_affix_block(lines, i - 1)
            elif head == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif head == "FULLSTRIP":
                self.fullstrip = True
            elif head == "CHECKSHARPS":
                self.checksharps = True
            elif head == "CIRCUMFIX":
                self.circumfix = flag_one(arg(line))
            elif head == "KEEPCASE":
                self.keepcase = flag_one(arg(line))
            elif head == "FORCEUCASE":
                self.forceucase = flag_one(arg(line))
            elif head in ("NEEDAFFIX", "PSEUDOROOT"):
                self.needaffix = flag_one(arg(line))
            elif head == "ONLYINCOMPOUND":
                self.onlyincompound = flag_one(arg(line))
            elif head == "FORBIDDENWORD":
                self.forbiddenword = flag_one(arg(line))
            elif head == "NOSUGGEST":
                self.nosuggest = flag_one(arg(line))
            elif head == "SUBSTANDARD":
                self.substandard = flag_one(arg(line))
            elif head == "IGNORE":
                self.ignore = set(arg(line))
            elif head in ("ICONV", "OCONV"):
                n = int(arg(line))
                table = []
                for _ in range(n):
                    p = lines[i].split()
                    i += 1
                    if len(p) >= 3:
                        table.append((p[1], p[2]))
                if head == "ICONV":
                    self.iconv = table
                else:
                    self.oconv = table
            elif head == "LANG":
                self.language = arg(line).split("_")[0].lower()
                self.alternate_casing = self.language in ("tr", "az")
            elif head == "TRY":
                self.try_chars = arg(line)
            elif head == "KEY":
                self.neighbor_key_groups = tuple(arg(line).split("|"))
            elif head == "NOSPLITSUGS":
                self.enable_split_suggestions = False
            elif head == "MAXNGRAMSUGS":
                self.max_ngram_suggestions = int(arg(line))
            elif head == "MAXDIFF":
                self.max_diff = int(arg(line))
            elif head == "ONLYMAXDIFF":
                self.only_max_diff = True
            elif head == "MAP":
                n = int(arg(line))
                for _ in range(n):
                    raw = lines[i].split()[1]
                    i += 1
                    entry, j = [], 0
                    while j < len(raw):
                        if raw[j] == "(":
                            close = raw.index(")", j)
                            entry.append(raw[j + 1 : close])
                            j = close + 1
                        else:
                            entry.append(raw[j])
                            j += 1
                    self.map_table.append(entry)
            elif head == "BREAK":
                n = int(arg(line))
                starting, ending, middle = [], [], []
                for _ in range(n):
                    b = lines[i].split()[1]
                    i += 1
                    if b.startswith("^"):
                        starting.append(b[1:])
                    elif b.endswith("$"):
                        ending.append(b[:-1])
                    else:
                        middle.append(b)
                self.breaks = (tuple(starting), tuple(ending), tuple(middle))
            elif head == "COMPOUNDMIN":
                self.compound_min = max(1, int(arg(line)))
            elif head == "COMPOUNDWORDMAX":
                self.compound_max = max(1, int(arg(line)))
            elif head == "COMPOUNDFLAG":
                self.compound_flag = flag_one(arg(line))
            elif head == "COMPOUNDBEGIN":
                self.compound_begin = flag_one(arg(line))
            elif head == "COMPOUNDMIDDLE":
                self.compound_middle = flag_one(arg(line))
            elif head == "COMPOUNDEND":
                self.compound_end = flag_one(arg(line))
            elif head == "COMPOUNDPERMITFLAG":
                self.compound_permit = flag_one(arg(line))
            elif head == "COMPOUNDFORBIDFLAG":
                self.compound_forbid = flag_one(arg(line))
            elif head == "COMPOUNDRULE":
                n = int(arg(line))
                for _ in range(n):
                    self.compound_rules.append(self._parse_compound_rule(lines[i].split()[1]))
                    i += 1
            elif head == "CHECKCOMPOUNDCASE":
                self.check_compound_case = True
            elif head == "CHECKCOMPOUNDDUP":
                self.check_compound_dup = True
            elif head == "CHECKCOMPOUNDREP":
                self.check_compound_rep = True
            elif head == "CHECKCOMPOUNDTRIPLE":
                self.check_compound_triple = True
            elif head == "SIMPLIFIEDTRIPLE":
                self.simplified_triple = True
            elif head == "CHECKCOMPOUNDPATTERN":
                n = int(arg(line))
                for _ in range(n):
                    self.check_compound_patterns.append(
                        self._parse_check_compound_pattern(lines[i])
                    )
                    i += 1
            elif head == "REP":
                if len(parts) == 2 and parts[1].isdigit():
                    n = int(parts[1])
                    for _ in range(n):
                        p = lines[i].split()
                        i += 1
                        if len(p) >= 3:
                            self.rep_table.append(RepEntry(p[1], p[2]))
                elif len(parts) >= 3:
                    self.rep_table.append(RepEntry(parts[1], parts[2]))
            # SET/TRY/WORDCHARS/MAP/KEY/NOSPLITSUGS/MAXNGRAMSUGS/MAXDIFF/
            # ONLYMAXDIFF/MAXCPDSUGS/SYLLABLENUM/COMPOUNDSYLLABLE/WARN/AM/...:
            # suggestion- or morphology-only; parsed over (no state needed)

    def _read_affix_block(self, lines: list[str], start: int) -> int:
        header = lines[start].split()
        kind, flag_raw, cross_raw = header[0], header[1], header[2]
        is_prefix = kind == "PFX"
        cross = cross_raw == "Y"
        flag = self._parse_flag(flag_raw)
        n = int(header[3])
        idx = self.prefixes if is_prefix else self.suffixes
        i = start + 1
        for _ in range(n):
            rule_parts = lines[i].split()
            i += 1
            strip = "" if rule_parts[2] == "0" else rule_parts[2]
            affix_arg = rule_parts[3]
            cont: frozenset = frozenset()
            sep = affix_arg.rfind("/")
            if sep != -1:
                flag_part = self._alias(affix_arg[sep + 1 :])
                affix_arg = affix_arg[:sep]
                cont = frozenset(self._parse_flags(flag_part))
                if is_prefix:
                    self.second_stage_pfx.update(cont)
                else:
                    self.second_stage_sfx.update(cont)
            if affix_arg == "0":
                affix_arg = ""
            condition = rule_parts[4] if len(rule_parts) > 4 else "."
            cond = _compile_condition(is_prefix, strip, condition)
            rule = _Rule(flag, is_prefix, cross, strip, affix_arg, cont, cond)
            idx.setdefault(affix_arg, []).append(rule)
        return i

    def _parse_compound_rule(self, raw: str) -> list[tuple[str, str]]:
        """A COMPOUNDRULE pattern: list of (flag, quantifier) where
        quantifier is '', '*' or '?' (CompoundRule.java). Flags may be
        parenthesised in long/num modes."""
        out = []
        i = 0
        while i < len(raw):
            if raw[i] == "(":
                j = raw.index(")", i)
                flag = self._parse_flag(raw[i + 1 : j])
                i = j + 1
            elif self.flag_mode == "long":
                flag = raw[i : i + 2]
                i += 2
            else:
                flag = raw[i]
                i += 1
            q = ""
            if i < len(raw) and raw[i] in "*?":
                q = raw[i]
                i += 1
            out.append((flag, q))
        return out

    def _parse_check_compound_pattern(self, line: str):
        """CHECKCOMPOUNDPATTERN endchars[/flag] beginchars[/flag] [repl]"""
        p = line.split()

        def split_flag(s):
            if "/" in s:
                w, f = s.split("/", 1)
                return w, self._parse_flag(self._alias(f))
            return s, None

        end, end_flag = split_flag(p[1])
        begin, begin_flag = split_flag(p[2])
        repl = p[3] if len(p) > 3 else None
        return (end, end_flag, begin, begin_flag, repl)

    # -- .dic parsing ------------------------------------------------------

    def _case_fold(self, ch: str) -> str:
        if self.alternate_casing:
            if ch == "I":
                return "ı"  # dotless i
            if ch == "İ":
                return "i"
        low = ch.lower()
        # Java Character.toLowerCase is char->char; Python may expand
        # (İ -> i + combining dot) — keep the single-char mapping
        if len(low) != 1:
            return {"İ": "i"}.get(ch, ch)
        return low

    def _fold(self, word: str) -> str:
        return "".join(self._case_fold(c) for c in word)

    def may_need_input_cleaning(self) -> bool:
        return self.ignore_case or bool(self.ignore) or bool(self.iconv)

    def clean_input(self, word: str) -> str:
        if self.ignore:
            word = "".join(c for c in word if c not in self.ignore)
        if self.iconv:
            word = _apply_conversions(word, self.iconv)
        if self.ignore_case:
            word = self._fold(word)
        return word

    def _fold_all(self, word: str) -> str:
        """toLowerCase: fold every char."""
        return self._fold(word)

    def _title_case(self, word: str) -> str:
        """toTitleCase: upper first char, fold the rest."""
        if not word:
            return word
        up = word[0].upper()
        return (up if len(up) == 1 else word[0]) + self._fold(word[1:])

    def _add_phonetic_rep(self, word: str, ph: str) -> None:
        """dic 'ph:' morph field -> REP entries
        (Dictionary.java addPhoneticRepEntries incl. the trailing-* strip
        and the title-case expansions)."""
        arrow = ph.find("->")
        if arrow > 0:
            pattern, replacement = ph[:arrow], ph[arrow + 2 :]
        else:
            pattern, replacement = ph, word
        if pattern.endswith("*") and len(pattern) > 2 and len(replacement) > 1:
            pattern = pattern[:-2]
            replacement = replacement[:-1]
        if _word_case(word) == _TITLE and _word_case(pattern) == _LOWER:
            if self.language in ("de", "hu"):
                self.rep_table.append(RepEntry(pattern, self._fold_all(replacement)))
            self.rep_table.append(RepEntry(self._title_case(pattern), replacement))
        self.rep_table.append(RepEntry(pattern, replacement))

    def _read_dic(self, text: str) -> None:
        lines = text.lstrip("﻿").splitlines()
        if not lines:
            return
        for line in lines[1:]:  # first line = approximate entry count
            if not line or line[0] in "#\t":
                continue
            self._add_dic_line(line)

    def _add_dic_line(self, line: str) -> None:
        # split word / flags / morph data; '\/' escapes a literal slash
        end = self._morph_boundary(line)
        body, morph = line[:end], line[end:].strip()
        word_chars: list[str] = []
        flag_part = None
        i = 0
        while i < len(body):
            ch = body[i]
            if ch == "\\" and i + 1 < len(body):
                word_chars.append(body[i + 1])
                i += 2
            elif ch == "/" and i > 0:
                flag_part = body[i + 1 :].replace("\\", "")
                break
            else:
                word_chars.append(ch)
                i += 1
        word = "".join(word_chars)
        if not word:
            return
        if self.may_need_input_cleaning():
            word = self.clean_input(word)
        if flag_part is not None:
            flags = frozenset(self._parse_flags(self._alias(flag_part.strip())))
        else:
            flags = frozenset()
        if morph and self.morph_aliases and morph.strip().isdigit():
            # AM alias reference (Dictionary.splitMorphData alias branch)
            morph = self.morph_aliases[int(morph.strip()) - 1]
        if morph:
            # a morph field needs content past the 'xx:' marker
            # (Dictionary.splitMorphData requires length > 3)
            for datum in morph.split():
                if datum.startswith("ph:") and len(datum) > 3:
                    self._add_phonetic_rep(word, datum[3:])
        self.words.setdefault(word, []).append((flags, morph))
        if " " in word:
            self.wordpairs.add(word)
        wc = _word_case(word) if word else _NEUTRAL
        if wc == _MIXED or (wc == _UPPER and flag_part is not None):
            hidden = word[0].upper() + self._fold(word[1:])
            self.words.setdefault(hidden, []).append((flags | {_HIDDEN}, morph))

    @staticmethod
    def _morph_boundary(line: str) -> int:
        """Dictionary.java morphBoundary: morph data starts at a tab, or at
        a space followed by a two-letter 'xx:' marker."""
        end = 0
        while True:
            m = re.search(r"[ \t]", line[end:])
            if not m:
                return len(line)
            end += m.start()
            if line[end] == "\t":
                return end
            if (
                end > 0
                and end + 3 < len(line)
                and line[end + 1].isalpha()
                and line[end + 2].isalpha()
                and line[end + 3] == ":"
            ):
                return end
            end += 1

    def has_flag(self, entry: tuple[frozenset, str], flag) -> bool:
        return flag is not None and flag in entry[0]


class _Root:
    __slots__ = ("stem", "entry", "last_rule")

    def __init__(self, stem, entry, last_rule=None):
        self.stem = stem
        self.entry = entry
        self.last_rule = last_rule


class _CompoundPart:
    """One accepted compound segment (Hunspell.java:355 CompoundPart):
    ``tail`` is the remaining text at this part's start, ``length`` the
    part's surface length within it."""

    __slots__ = ("prev", "tail", "length", "root", "enabling_pattern", "index")

    def __init__(self, prev, tail, length, root, enabling_pattern):
        self.prev = prev
        self.tail = tail
        self.length = length
        self.root = root
        self.enabling_pattern = enabling_pattern
        self.index = 1 if prev is None else prev.index + 1


class Hunspell:
    """Stemmer + spell checker over a HunspellDictionary
    (Stemmer.java:33 + Hunspell.java:48 roles)."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    # ---- affix walk (Stemmer.java removeAffixes/applyAffix) -------------

    def _roots(self, word: str, context: str = SIMPLE_WORD):
        """Yield _Root candidates for word in dictionary-entry order:
        direct entries first, then affix-stripped candidates. Raises
        _CompoundForbid to mirror the reference's hard stop when a
        compound-forbidden root is hit mid-compound."""
        d = self.d
        out: list[_Root] = []
        for entry in d.words.get(word, []):
            if d.has_flag(entry, d.needaffix):
                continue
            if context in (COMPOUND_BEGIN, COMPOUND_MIDDLE) and d.has_flag(
                entry, d.compound_forbid
            ):
                return out, True
            if not self._root_compatible(context, None, entry):
                continue
            out.append(_Root(word, entry))

        def emit(stem, last_rule, outer_pfx, inner_pfx, outer_sfx, inner_sfx):
            entries = d.words.get(stem)
            if not entries:
                return
            flag = last_rule.flag
            prefix_rule = inner_pfx if inner_pfx is not None else outer_pfx
            for entry in entries:
                ok = flag in entry[0] or (
                    prefix_rule is not None and flag in prefix_rule.cont
                )
                if not ok:
                    continue
                if inner_pfx is None and outer_pfx is not None:
                    pf = outer_pfx.flag
                    if pf not in entry[0] and pf not in last_rule.cont:
                        continue
                if not self._root_compatible(context, last_rule, entry):
                    continue
                out.append(_Root(stem, entry, last_rule))

        self._remove_affixes(word, True, None, None, None, context, emit)
        return out, False

    def _remove_affixes(
        self, word, do_prefix, outer_pfx, inner_pfx, outer_sfx, context, emit
    ):
        d = self.d
        if do_prefix and d.prefixes:
            limit = len(word) + 1 if d.fullstrip else len(word)
            for i in range(0, limit):
                rules = d.prefixes.get(word[:i])
                if not rules:
                    continue
                base = word[i:]
                for rule in rules:
                    if rule is outer_pfx:
                        continue
                    if not self._affix_compatible(rule, True, outer_pfx, outer_sfx, context):
                        continue
                    if len(rule.strip) + len(base) == 0:
                        continue
                    if not rule.cond(base):
                        continue
                    self._apply_affix(
                        rule.strip + base,
                        rule,
                        True,
                        outer_pfx,
                        inner_pfx,
                        outer_sfx,
                        context,
                        emit,
                    )
        if d.suffixes:
            limit = 0 if d.fullstrip else 1
            for i in range(len(word), limit - 1, -1):
                rules = d.suffixes.get(word[i:])
                if not rules:
                    continue
                base = word[:i]
                for rule in rules:
                    if rule is outer_sfx:
                        continue
                    if not self._affix_compatible(rule, False, outer_pfx, outer_sfx, context):
                        continue
                    if len(rule.strip) + len(base) == 0:
                        continue
                    if not rule.cond(base):
                        continue
                    self._apply_affix(
                        base + rule.strip,
                        rule,
                        False,
                        outer_pfx,
                        inner_pfx,
                        outer_sfx,
                        context,
                        emit,
                    )

    def _apply_affix(
        self, stem, rule, is_prefix, outer_pfx, inner_pfx, outer_sfx, context, emit
    ):
        d = self.d
        prefix_rule = inner_pfx if inner_pfx is not None else outer_pfx
        previous = outer_sfx if outer_sfx is not None else prefix_rule
        inner_sfx = None
        if is_prefix:
            if outer_pfx is None:
                outer_pfx = rule
            else:
                inner_pfx = rule
        else:
            if outer_sfx is None:
                outer_sfx = rule
            else:
                inner_sfx = rule

        if not self._needs_another_affix(rule, previous, not is_prefix, prefix_rule):
            emit(stem, rule, outer_pfx, inner_pfx, outer_sfx, inner_sfx)
        if inner_sfx is not None:
            return

        depth = (
            (1 if outer_sfx is not None else 0)
            + (2 if inner_pfx is not None else (1 if outer_pfx is not None else 0))
            - 1
        )
        if rule.cross and depth <= 1:
            flag = rule.flag
            if depth == 0:
                if is_prefix:
                    do_prefix = d.complex_prefixes and flag in d.second_stage_pfx
                elif not d.complex_prefixes and flag in d.second_stage_sfx:
                    do_prefix = False
                else:
                    return
            else:
                if is_prefix and d.complex_prefixes:
                    do_prefix = True
                elif is_prefix or d.complex_prefixes or flag not in d.second_stage_sfx:
                    return
                else:
                    do_prefix = False
            self._remove_affixes(
                stem, do_prefix, outer_pfx, inner_pfx, outer_sfx, context, emit
            )

    def _affix_compatible(self, rule, is_prefix, outer_pfx, outer_sfx, context):
        d = self.d
        previous_was_prefix = outer_sfx is None and outer_pfx is not None
        if context in _COMPOUND_CONTEXTS:
            if not is_prefix and d.compound_forbid in rule.cont:
                return False
            allowed_free = (
                (context == COMPOUND_BEGIN and is_prefix)
                or (context == COMPOUND_END and not is_prefix)
                or context == COMPOUND_RULE_END
            )
            if not allowed_free and not (
                d.compound_permit is not None and d.compound_permit in rule.cont
            ):
                return False
            if (
                context == COMPOUND_END
                and not is_prefix
                and not previous_was_prefix
                and d.onlyincompound is not None
                and d.onlyincompound in rule.cont
            ):
                return False
        elif d.onlyincompound is not None and d.onlyincompound in rule.cont:
            return False
        if outer_pfx is None and outer_sfx is None:
            return True
        if rule.cross:
            if previous_was_prefix:
                return True
            if outer_sfx is not None:
                return outer_sfx.flag in rule.cont
        return False

    def _needs_another_affix(self, rule, previous, is_suffix, prefix_rule):
        d = self.d
        circ = d.circumfix

        def appended(r, f):
            return r is not None and f is not None and f in r.cont

        if is_suffix and appended(prefix_rule, circ) != appended(rule, circ):
            return True
        if appended(rule, d.needaffix):
            return (
                not is_suffix
                or previous is None
                or appended(previous, d.needaffix)
            )
        return False

    def _root_compatible(self, context, last_rule, entry):
        d = self.d
        if context not in _COMPOUND_CONTEXTS and d.has_flag(entry, d.onlyincompound):
            return False
        if context in _COMPOUND_CONTEXTS and context != COMPOUND_RULE_END:
            required = {
                COMPOUND_BEGIN: d.compound_begin,
                COMPOUND_MIDDLE: d.compound_middle,
                COMPOUND_END: d.compound_end,
            }[context]

            def app(f):
                return last_rule is not None and f is not None and f in last_rule.cont

            return (
                d.has_flag(entry, required)
                or app(required)
                or d.has_flag(entry, d.compound_flag)
                or app(d.compound_flag)
            )
        return True

    # ---- case handling (Stemmer.java analyze/varyCase) ------------------

    def _case_of(self, word: str) -> str:
        if self.d.ignore_case or not word or word[0].islower():
            return _MIXED
        return _word_case(word)

    def _fold_title(self, word: str) -> str:
        return word[0] + self.d._fold(word[1:])

    def _fold_lower(self, word: str) -> str:
        return self.d._case_fold(word[0]) + word[1:]

    def _case_variants(self, word: str, wc: str):
        """Yield (variant, original_case) pairs to try (varyCase order):
        apostrophe title, title, sharp-s of title, lower, sharp-s of
        lower. Sharp-s variants carry original_case=None — the reference's
        varySharpS processes them with a null WordCase."""
        d = self.d
        title = None
        if wc == _UPPER:
            title = self._fold_title(word)
            apos = self._capitalize_after_apostrophe(title)
            if apos is not None:
                yield apos, wc
            yield title, wc
            if d.checksharps:
                for v in self._sharp_s_variants(title):
                    yield v, None
        if word and word[0] == "İ" and not d.alternate_casing:
            return
        lower = self._fold_lower(title if title is not None else word)
        yield lower, wc
        if wc == _UPPER and d.checksharps:
            for v in self._sharp_s_variants(lower):
                yield v, None

    @staticmethod
    def _capitalize_after_apostrophe(word: str):
        for i in range(1, len(word) - 1):
            if word[i] == "'":
                nxt = word[i + 1]
                up = nxt.upper()
                if up != nxt:
                    return word[: i + 1] + up + word[i + 2 :]
        return None

    def _sharp_s_variants(self, word: str):
        """All ss->ß replacement combinations (bounded like the
        reference's depth-5 cutoff), excluding the unchanged word."""

        def expand(s, start, depth):
            if depth > 5:
                return [s[start:]]
            ss = s.find("ss", start)
            if ss < 0:
                return None
            head = s[start:ss]
            tails = expand(s, ss + 2, depth + 1)
            if tails is None:
                tails = [s[ss + 2 :]]
            out = []
            for t in tails:
                out.append(head + "ss" + t)
                out.append(head + "ß" + t)
            return out

        variants = expand(word, 0, 0)
        if variants is None:
            return
        for v in variants:
            if v != word:
                yield v

    # ---- stemming API ----------------------------------------------------

    def _accept_case(self, original_case, entry, root: str) -> bool:
        d = self.d
        keep = d.has_flag(entry, d.keepcase)
        if original_case is not None:
            if keep and d.checksharps and original_case == _TITLE and "ß" in root:
                return True
            return not keep
        return _HIDDEN not in entry[0]

    def _find_stem(self, word: str, original_case, context: str):
        """Hunspell.java findStem: first root passing the case filter; a
        non-hidden case-filter failure hard-stops the search."""
        to_check = (
            original_case if context not in (COMPOUND_MIDDLE, COMPOUND_END) else None
        )
        roots, aborted = self._roots(word, context)
        if aborted:
            return None, True
        for r in roots:
            if not self._accept_case(to_check, r.entry, r.stem):
                if _HIDDEN in r.entry[0]:
                    continue
                return None, False
            if self._accepts_stem_entry(r.entry):
                return r, False
            return None, False
        return None, False

    def _accepts_stem_entry(self, entry) -> bool:
        """Hook for the suggestion speller (Hunspell.java acceptsStem):
        the base speller accepts every case-accepted root."""
        return True

    def stems(self, word: str) -> list[str]:
        """All stems of the word incl. case variants (Stemmer.stem +
        analyze), with st: stem exceptions and OCONV applied."""
        d = self.d
        if d.may_need_input_cleaning():
            word = d.clean_input(word)
        if not word:
            return []
        out: list[str] = []

        def collect(w):
            roots, _ = self._roots(w, SIMPLE_WORD)
            for r in roots:
                out.append(self._stem_text(r))

        collect(word)
        wc = self._case_of(word)
        if wc in (_UPPER, _TITLE):
            for v, _oc in self._case_variants(word, wc):
                collect(v)
        return out

    def unique_stems(self, word: str) -> list[str]:
        seen = set()
        out = []
        for s in self.stems(word):
            k = s.lower() if self.d.ignore_case else s
            if k not in seen:
                seen.add(k)
                out.append(s)
        return out

    def _stem_text(self, root: _Root) -> str:
        morph = root.entry[1]
        text = root.stem
        if morph:
            m = re.search(r"(?:^|\s)st:(\S+)", morph)
            if m:
                text = m.group(1)
        if self.d.oconv:
            text = _apply_conversions(text, self.d.oconv)
        return text

    # ---- spell-checking API (Hunspell.java spell) ------------------------

    def spell(self, word: str) -> bool:
        if not word:
            return True
        d = self.d
        if d.may_need_input_cleaning():
            word = d.clean_input(word)
            if not word:
                return True
        if word.endswith("."):
            return self._spell_with_trailing_dots(word)
        return self._spell_clean(word)

    def _spell_with_trailing_dots(self, word: str) -> bool:
        length = len(word) - 1
        while length > 0 and word[length - 1] == ".":
            length -= 1
        return self._spell_clean(word[:length]) or self._spell_clean(word[: length + 1])

    def _spell_clean(self, word: str) -> bool:
        if _is_number(word):
            return True
        simple = self._check_simple_word(word, None)
        if simple is not None:
            return simple
        if self._check_compounds_entry(word, None):
            return True
        wc = self._case_of(word)
        if wc in (_UPPER, _TITLE):
            for v, oc in self._case_variants(word, wc):
                if self._check_word(v, oc):
                    return True
        starting, ending, middle = self.d.breaks
        if (starting or ending or middle) and not self._too_many_breaks(word):
            return self._try_breaks(word)
        return False

    def _check_simple_word(self, word: str, original_case):
        root, _ = self._find_stem(word, original_case, SIMPLE_WORD)
        if root is not None:
            return not self.d.has_flag(root.entry, self.d.forbiddenword)
        return None

    def _check_word(self, word: str, original_case) -> bool:
        simple = self._check_simple_word(word, original_case)
        if simple is not None:
            return simple
        return self._check_compounds_entry(word, original_case)

    # ---- compounds (Hunspell.java checkCompounds) ------------------------

    def _check_compounds_entry(self, word: str, original_case) -> bool:
        d = self.d
        if d.compound_rules and self._check_compound_rules(word, []):
            return True
        if d.compound_begin is not None or d.compound_flag is not None:
            return self._check_compounds(word, original_case, None)
        return False

    def _check_compounds(self, word: str, original_case, prev) -> bool:
        """word = remaining text; prev = _CompoundPart or None
        (Hunspell.java:213 checkCompounds)."""
        d = self.d
        if prev is not None and prev.index > d.compound_max - 2:
            return False
        limit = len(word) - d.compound_min + 1
        for break_pos in range(d.compound_min, limit):
            context = COMPOUND_BEGIN if prev is None else COMPOUND_MIDDLE
            if self._may_break_into_compounds(word, break_pos):
                stem, _ = self._find_stem(word[:break_pos], original_case, context)
                if (
                    stem is None
                    and d.simplified_triple
                    and word[break_pos - 1] == word[break_pos]
                ):
                    stem, _ = self._find_stem(
                        word[: break_pos + 1], original_case, context
                    )
                if (
                    stem is not None
                    and not d.has_flag(stem.entry, d.forbiddenword)
                    and (
                        prev is None
                        or self._may_compound(prev, stem, break_pos, original_case)
                    )
                ):
                    part = _CompoundPart(prev, word, break_pos, stem, None)
                    if self._check_compounds_after(original_case, part):
                        return True
            if self._check_compound_pattern_replacements(
                word, break_pos, original_case, prev
            ):
                return True
        return False

    def _check_compound_pattern_replacements(
        self, word, pos, original_case, prev
    ) -> bool:
        for pat in self.d.check_compound_patterns:
            end, _end_flag, begin, _begin_flag, repl = pat
            if repl is None or not word.startswith(repl, pos):
                continue
            expanded = word[:pos] + end + begin + word[pos + len(repl) :]
            break_pos = pos + len(end)
            context = COMPOUND_BEGIN if prev is None else COMPOUND_MIDDLE
            stem, _ = self._find_stem(expanded[:break_pos], original_case, context)
            if stem is not None:
                part = _CompoundPart(prev, expanded, break_pos, stem, pat)
                if self._check_compounds_after(original_case, part):
                    return True
        return False

    def _check_compounds_after(self, original_case, part) -> bool:
        d = self.d
        word, break_pos = part.tail, part.length
        tail = word[break_pos:]
        last, _ = self._find_stem(tail, original_case, COMPOUND_END)
        if (
            last is not None
            and not d.has_flag(last.entry, d.forbiddenword)
            and not (
                d.check_compound_dup
                and part.root.stem == last.stem
                and part.root.entry is last.entry
            )
            and not self._force_ucase_problem(last, original_case, word)
            and self._may_compound(part, last, len(tail), original_case)
        ):
            return True
        return self._check_compounds(tail, original_case, part)

    def _force_ucase_problem(self, root, original_case, word) -> bool:
        d = self.d
        if original_case in (_TITLE, _UPPER):
            return False
        if original_case is None and word[0].isupper():
            return False
        return d.has_flag(root.entry, d.forceucase)

    def _may_compound(self, part, next_root, next_len, original_case) -> bool:
        """CompoundPart.mayCompound: pattern prohibition, CHECKCOMPOUNDREP
        and the word-pair rule between this part and the next."""
        d = self.d
        tail, length = part.tail, part.length
        if part.enabling_pattern is not None:
            if not self._pattern_prohibits(
                part.enabling_pattern, tail, length, part.root, next_root
            ):
                return False
        elif any(
            self._pattern_prohibits(p, tail, length, part.root, next_root)
            for p in d.check_compound_patterns
        ):
            return False
        if d.check_compound_rep and self._misspelled_by_rep(
            tail[: length + next_len], original_case
        ):
            return False
        space_separated = tail[:length] + " " + tail[length : length + next_len]
        return self._check_simple_word(space_separated, None) is not True

    def _misspelled_by_rep(self, word: str, original_case) -> bool:
        """A middle REP substitution turning the concatenation into a
        dictionary word marks the compound as a misspelling."""
        for entry in self.d.rep_table:
            if not entry.is_middle():
                continue
            for cand in entry.substitute(word):
                r, _ = self._find_stem(cand, original_case, SIMPLE_WORD)
                if r is not None:
                    return True
        return False

    def _pattern_prohibits(self, pat, word, break_pos, root_before, root_after) -> bool:
        """CheckCompoundPattern.prohibitsCompounding."""
        d = self.d
        end, end_flag, begin, begin_flag, _repl = pat

        def chars_match(offset, pattern):
            return 0 <= offset and word.startswith(pattern, offset) and offset <= len(word)

        if end == "0":
            if not chars_match(break_pos - len(root_before.stem), root_before.stem):
                return False
        elif not chars_match(break_pos - len(end), end):
            return False
        if begin == "0":
            if not chars_match(break_pos, root_after.stem):
                return False
        elif not chars_match(break_pos, begin):
            return False
        if end_flag is not None and not d.has_flag(root_before.entry, end_flag):
            return False
        if begin_flag is not None and not d.has_flag(root_after.entry, begin_flag):
            return False
        return True

    def _may_break_into_compounds(self, word: str, pos: int) -> bool:
        d = self.d
        a, b = word[pos - 1], word[pos]
        if d.check_compound_case:
            if (a.isupper() or b.isupper()) and a != "-" and b != "-":
                return False
        if d.check_compound_triple and a == b:
            if (pos > 1 and word[pos - 2] == a) or (
                pos < len(word) - 1 and word[pos + 1] == b
            ):
                return False
        return True

    # ---- COMPOUNDRULE path (CompoundRule.java) ---------------------------

    def _check_compound_rules(self, word: str, pieces: list) -> bool:
        """Split into direct dictionary pieces; the flag-set sequence must
        match a rule pattern; the LAST piece may take affixes
        (COMPOUND_RULE_END context)."""
        d = self.d
        if len(pieces) >= 100:
            return False
        limit = len(word) - d.compound_min + 1
        for break_pos in range(d.compound_min, limit):
            entries = d.words.get(word[:break_pos])
            if not entries:
                continue
            flags_pool = frozenset().union(*[e[0] for e in entries])
            pieces.append(flags_pool)
            try:
                if any(self._match_rule(r, pieces, full=False) for r in d.compound_rules):
                    if self._check_last_compound_part(word[break_pos:], pieces):
                        return True
                    if self._check_compound_rules(word[break_pos:], pieces):
                        return True
            finally:
                pieces.pop()
        return False

    def _check_last_compound_part(self, tail: str, pieces: list) -> bool:
        d = self.d
        roots, _ = self._roots(tail, COMPOUND_RULE_END)
        for r in roots:
            pieces.append(r.entry[0])
            try:
                if any(self._match_rule(rule, pieces, full=True) for rule in d.compound_rules):
                    return True
            finally:
                pieces.pop()
        return False

    def _match_rule(self, rule, pieces, full: bool) -> bool:
        """Backtracking match of the flag-set sequence against
        [(flag, quantifier)]; prefix match when full=False
        (CompoundRule.match)."""

        def match(pi, wi):
            if pi >= len(rule):
                return wi >= len(pieces)
            if wi >= len(pieces) and not full:
                return True
            flag, q = rule[pi]
            if q == "*":
                start = wi
                while wi < len(pieces) and flag in pieces[wi]:
                    wi += 1
                while wi >= start:
                    if match(pi + 1, wi):
                        return True
                    wi -= 1
                return False
            current = wi < len(pieces) and flag in pieces[wi]
            if q == "?":
                if current and match(pi + 1, wi + 1):
                    return True
                return match(pi + 1, wi)
            return current and match(pi + 1, wi + 1)

        return match(0, 0)

    # ---- breaks ----------------------------------------------------------

    def _too_many_breaks(self, word: str) -> bool:
        count = 0
        for br in self.d.breaks[2]:
            start = 0
            while True:
                pos = word.find(br, start)
                if pos < 0:
                    break
                count += 1
                if count >= 10:
                    return True
                start = pos + len(br)
        return False

    def _try_breaks(self, word: str) -> bool:
        starting, ending, middle = self.d.breaks
        for br in starting:
            if len(word) > len(br) and word.startswith(br):
                if self.spell(word[len(br) :]):
                    return True
        for br in ending:
            if len(word) > len(br) and word.endswith(br):
                if self.spell(word[: -len(br)]):
                    return True
        for br in middle:
            pos = word.find(br)
            if self._can_break_at(word, br, pos):
                return True
            if pos > 0 and self._can_break_at(word, br, word.find(br, pos + 1)):
                return True
        return False

    def _can_break_at(self, word: str, br: str, pos: int) -> bool:
        return (
            pos > 0
            and pos < len(word) - len(br)
            and self.spell(word[:pos])
            and self.spell(word[pos + len(br) :])
        )


class HunspellStemFilter:
    """1:1 token filter for the analyzer chain
    (``hunspell/HunspellStemFilter.java:62`` with longestOnly): the
    longest unique stem (ties: lexicographically smallest — our
    deterministic tie rule), or the original token when the dictionary
    yields no stems. Plain-Python callable, cloudpickles into the
    executor-side invert closure like every other filter."""

    def __init__(self, hunspell: Hunspell):
        self.h = hunspell

    def __call__(self, term: str) -> str:
        stems = self.h.unique_stems(term)
        if not stems:
            return term
        return min(stems, key=lambda s: (-len(s), s))


def _is_number(s: str) -> bool:
    i = 0
    while i < len(s):
        c = s[i]
        if c.isdigit():
            i += 1
        elif c in ".,-":
            if i == 0 or i >= len(s) - 1 or not s[i + 1].isdigit():
                return False
            i += 2
        else:
            return False
    return True


def unmunch(d: HunspellDictionary, max_forms: int = 1_000_000) -> dict[str, set[str]]:
    """Expand the dictionary in the GENERATION direction: every root plus
    every applicable affix combination -> {surface form: set of roots}.
    Single-stage prefixes x single- and two-stage suffixes (the shapes the
    stemmer strips with COMPLEXPREFIXES off); used as the independent twin
    for tests and SQL oracles, never by the engine itself."""
    all_rules = [r for rs in d.prefixes.values() for r in rs] + [
        r for rs in d.suffixes.values() for r in rs
    ]
    by_flag: dict[str, list[_Rule]] = {}
    for r in all_rules:
        by_flag.setdefault(r.flag, []).append(r)

    out: dict[str, set[str]] = {}

    def add(form: str, root: str):
        out.setdefault(form, set()).add(root)

    def sfx_apply(word: str, rule: _Rule):
        if rule.strip:
            if not word.endswith(rule.strip):
                return None
            base = word[: -len(rule.strip)]
        else:
            base = word
        if not base and not d.fullstrip:
            return None
        if not rule.cond(base):
            return None
        return base + rule.append

    def pfx_apply(word: str, rule: _Rule):
        if rule.strip:
            if not word.startswith(rule.strip):
                return None
            base = word[len(rule.strip) :]
        else:
            base = word
        if not base and not d.fullstrip:
            return None
        if not rule.cond(base):
            return None
        return rule.append + base

    for root, entries in d.words.items():
        for flags, _morph in entries:
            if _HIDDEN in flags:
                continue
            is_pseudo = d.needaffix is not None and d.needaffix in flags
            if not is_pseudo:
                add(root, root)
            sfx_forms: list[tuple[str, _Rule]] = []
            for f in flags:
                for rule in by_flag.get(f, []):
                    if rule.is_prefix:
                        form = pfx_apply(root, rule)
                        if form is not None and d.needaffix not in rule.cont:
                            add(form, root)
                    else:
                        form = sfx_apply(root, rule)
                        if form is not None:
                            if d.needaffix not in rule.cont:
                                add(form, root)
                            sfx_forms.append((form, rule))
                            # cross-product with prefixes carried by the root
                            if rule.cross:
                                for f2 in flags:
                                    for p in by_flag.get(f2, []):
                                        if p.is_prefix and p.cross:
                                            pform = pfx_apply(form, p)
                                            if pform is not None:
                                                add(pform, root)
            # two-stage suffixes via continuation classes
            for form, rule in sfx_forms:
                for cf in rule.cont:
                    for rule2 in by_flag.get(cf, []):
                        if not rule2.is_prefix:
                            f2 = sfx_apply(form, rule2)
                            if f2 is not None:
                                add(f2, root)
            if len(out) > max_forms:
                raise ValueError("unmunch exceeded max_forms")
    return out
