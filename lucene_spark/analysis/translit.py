"""Rule-based transliteration — the reference's ICUTransformFilter role
(``analysis/icu/.../ICUTransformFilter.java:60``, which wraps ICU4J's
``Transliterator``). Clean-room implementation of the PUBLISHED ICU
transform-rule language (the ICU User Guide "Transforms" chapter), the
part the reference itself treats as an external engine:

- **conversion rules** ``pre { key } post > out ;`` — at each cursor
  position the FIRST rule (definition order) whose key matches and
  whose contexts hold fires; the cursor then advances past the emitted
  text, or to the ``|`` marker if the replacement contains one (the
  re-scan device chained rules rely on);
- **variables** ``$vowel = [aeiou] ;`` — substituted into later rules;
- **bracket sets** ``[abc]`` match any listed character (incl. ranges
  ``[a-z]``) and may be negated ``[^abc]``;
- **compound passes** ``:: NFD ;`` / ``:: NFC ;`` / ``:: NFKC ;`` /
  ``:: Lower ;`` / ``:: Upper ;`` / ``:: Null ;`` — each ID runs as its
  own left-to-right pass over the whole intermediate text, exactly the
  compound-transform semantics; conversion rules BETWEEN two ``::``
  lines form one pass of their own;
- ``#`` comments and ``'...'``-quoted literals.

The RULESET is data, like hunspell's .aff/.dic, the CJK lattice's
lexicon, and Beider-Morse's tables: any rules in this grammar drop in,
so the published Greek-Latin / Cyrillic-Latin tables can be loaded as
files; the bundled examples in tests exercise every engine feature.

Spark integration: a ``Transliterator`` instance is a plain callable
``str -> str`` — a 1:1 token filter for ``FilteredAnalyzer(filters=...)``
or a pre-tokenization char filter for ``char_filters=...``; both ship to
executors inside the analyzer closure like every other analysis stage.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = ["Transliterator"]

_NORM_PASSES = {
    "nfd": lambda s: unicodedata.normalize("NFD", s),
    "nfc": lambda s: unicodedata.normalize("NFC", s),
    "nfkd": lambda s: unicodedata.normalize("NFKD", s),
    "nfkc": lambda s: unicodedata.normalize("NFKC", s),
    "lower": str.lower,
    "upper": str.upper,
    "null": lambda s: s,
}


def _strip_comments(rules: str) -> str:
    out = []
    for line in rules.splitlines():
        q = False
        for i, ch in enumerate(line):
            if ch == "'":
                q = not q
            elif ch == "#" and not q:
                line = line[:i]
                break
        out.append(line)
    return "\n".join(out)


def _split_statements(rules: str) -> list[str]:
    stmts, cur, q = [], [], False
    for ch in rules:
        if ch == "'":
            q = not q
            cur.append(ch)
        elif ch == ";" and not q:
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        raise ValueError(f"transform rules: missing ';' after {tail!r}")
    return stmts


class _Item:
    """One pattern element: a literal string or a character set."""

    __slots__ = ("lit", "chars", "negate")

    def __init__(self, lit=None, chars=None, negate=False):
        self.lit = lit
        self.chars = chars
        self.negate = negate

    def match_len(self, text: str, i: int):
        """chars matched at text[i:] or None."""
        if self.lit is not None:
            return len(self.lit) if text.startswith(self.lit, i) else None
        if i >= len(text):
            return None
        hit = text[i] in self.chars
        return 1 if hit != self.negate else None

    def match_back(self, text: str, i: int):
        """chars matched ENDING at text[:i] or None."""
        if self.lit is not None:
            return len(self.lit) if text.endswith(self.lit, 0, i) else None
        if i <= 0:
            return None
        hit = text[i - 1] in self.chars
        return 1 if hit != self.negate else None


def _parse_set(src: str, i: int):
    """src[i] == '[' -> (_Item, next index)."""
    j = i + 1
    negate = j < len(src) and src[j] == "^"
    if negate:
        j += 1
    chars = set()
    while j < len(src) and src[j] != "]":
        if j + 2 < len(src) and src[j + 1] == "-" and src[j + 2] != "]":
            for cp in range(ord(src[j]), ord(src[j + 2]) + 1):
                chars.add(chr(cp))
            j += 3
        else:
            chars.add(src[j])
            j += 1
    if j >= len(src):
        raise ValueError(f"transform rules: unterminated set in {src!r}")
    return _Item(chars=frozenset(chars), negate=negate), j + 1


def _parse_pattern(src: str, variables: dict) -> list[_Item]:
    """Pattern text -> item list (variables already substituted are
    re-parsed, so a $set variable stays a set)."""
    items: list[_Item] = []
    i, n = 0, len(src)
    buf = []

    def flush():
        if buf:
            items.append(_Item(lit="".join(buf)))
            buf.clear()

    while i < n:
        ch = src[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "'":
            j = src.index("'", i + 1)
            buf.append(src[i + 1 : j] or "'")  # '' is a literal quote
            i = j + 1
            continue
        if ch == "$":
            m = re.match(r"\$(\w+)", src[i:])
            if not m:
                raise ValueError(f"transform rules: bad variable in {src!r}")
            name = m.group(1)
            if name not in variables:
                raise ValueError(f"transform rules: unknown variable ${name}")
            flush()
            items.extend(_parse_pattern(variables[name], variables))
            i += m.end()
            continue
        if ch == "[":
            flush()
            item, i = _parse_set(src, i)
            items.append(item)
            continue
        buf.append(ch)
        i += 1
    flush()
    return items


def _split_unquoted(src: str, sep: str):
    """Split on the first occurrence of `sep` outside '...' quotes, or
    None if there is none."""
    q = False
    for i, ch in enumerate(src):
        if ch == "'":
            q = not q
        elif ch == sep and not q:
            return src[:i], src[i + 1 :]
    return None


class _Rule:
    __slots__ = ("pre", "key", "post", "out", "cursor")

    def __init__(self, pre, key, post, out, cursor):
        self.pre = pre
        self.key = key
        self.post = post
        self.out = out
        self.cursor = cursor  # offset into `out` to resume at, or None

    def match(self, text: str, i: int):
        """key+post+pre hold at position i -> matched key length."""
        j = i
        for item in self.key:
            ln = item.match_len(text, j)
            if ln is None:
                return None
            j += ln
        k = j
        for item in self.post:
            ln = item.match_len(text, k)
            if ln is None:
                return None
            k += ln
        b = i
        for item in reversed(self.pre):
            ln = item.match_back(text, b)
            if ln is None:
                return None
            b -= ln
        return j - i


class Transliterator:
    def __init__(self, rules: str):
        self.passes: list = []  # each: ("norm", fn) | ("rules", [_Rule])
        variables: dict[str, str] = {}
        current: list[_Rule] = []

        def close_pass():
            nonlocal current
            if current:
                self.passes.append(("rules", current))
                current = []

        for stmt in _split_statements(_strip_comments(rules)):
            if stmt.startswith("::"):
                close_pass()
                name = stmt[2:].strip().lower()
                if name not in _NORM_PASSES:
                    raise ValueError(f"transform rules: unsupported ID {name!r}")
                self.passes.append(("norm", _NORM_PASSES[name]))
                continue
            m = re.match(r"^\$(\w+)\s*=\s*(.*)$", stmt, re.S)
            if m:
                variables[m.group(1)] = m.group(2).strip()
                continue
            split = _split_unquoted(stmt, ">")
            if split is None:
                raise ValueError(f"transform rules: no '>' in {stmt!r}")
            lhs, rhs = split
            pre: list = []
            post: list = []
            brace = _split_unquoted(lhs, "{")
            if brace is not None:
                pre_src, rest = brace
                closing = _split_unquoted(rest, "}")
                key_src, post_src = closing if closing is not None else (rest, "")
                pre = _parse_pattern(pre_src, variables)
                post = _parse_pattern(post_src, variables)
            else:
                closing = _split_unquoted(lhs, "}")
                if closing is not None:
                    key_src, post_src = closing
                    post = _parse_pattern(post_src, variables)
                else:
                    key_src = lhs
            key = _parse_pattern(key_src, variables)
            if not key:
                raise ValueError(f"transform rules: empty key in {stmt!r}")
            # replacement: literal text with optional one '|' cursor;
            # variables substitute as literal text (sets are invalid here)
            out_src = rhs.strip()
            cursor = None
            out_items = _parse_pattern(out_src.replace("|", "\x00"), variables)
            out_parts = []
            for it in out_items:
                if it.lit is None:
                    raise ValueError(
                        f"transform rules: set in replacement of {stmt!r}"
                    )
                out_parts.append(it.lit)
            out = "".join(out_parts)
            if "\x00" in out:
                cursor = out.index("\x00")
                out = out.replace("\x00", "")
            current.append(_Rule(pre, key, post, out, cursor))
        close_pass()

    # ------------------------------------------------------------- apply

    def transliterate(self, text: str) -> str:
        for kind, p in self.passes:
            if kind == "norm":
                text = p(text)
                continue
            # the ICU buffer model: replacements happen IN the buffer
            # (so pre-contexts of later rules see already-replaced
            # text), and the cursor resumes past the replacement — or
            # inside it when the rule carries a '|' re-scan marker
            i = 0
            # pathological rulesets (a '|' cursor that never advances)
            # would spin forever in ICU too; bound the work and fail
            # loudly instead of hanging an executor
            budget = 1000 + 100 * len(text)
            while i < len(text):
                budget -= 1
                if budget < 0:
                    raise RuntimeError(
                        "transform rules: rewrite budget exhausted "
                        "(non-terminating cursor loop?)"
                    )
                for rule in p:
                    ln = rule.match(text, i)
                    if ln is not None:
                        text = text[:i] + rule.out + text[i + ln :]
                        i += (
                            rule.cursor
                            if rule.cursor is not None
                            else len(rule.out)
                        )
                        break
                else:
                    i += 1
        return text

    def __call__(self, text: str) -> str:
        return self.transliterate(text)
