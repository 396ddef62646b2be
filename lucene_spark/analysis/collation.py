"""Collation sort keys — the reference's ICU collation role
(``analysis/icu/.../ICUCollationKeyAnalyzer.java:47``,
``ICUCollationDocValuesField.java``): tokens (or whole field values)
become locale-correct binary sort keys so that plain bytewise ordering
of the indexed terms IS the tailored collation order.

This is a clean-room subset of the PUBLISHED collation model (UCA /
JDK ``java.text.RuleBasedCollator`` rule syntax, ICU numeric
collation):

- **rules**: ``< a , A < b ; á = x & a < q`` — ``<`` introduces a
  primary difference, ``;`` secondary, ``,`` tertiary, ``=`` equality;
  ``&`` resets the insertion point to an already-ordered element, and a
  multi-character text token is a CONTRACTION (traditional Spanish
  ``< c < ch < d`` sorts the digraph as one unit). Whitespace is
  ignored. The induced ORDER is cross-validated against the JDK's own
  ``RuleBasedCollator`` in ``tests/test_collation.py`` (same machine
  check the KStem engine got against the reference's compiled stemmer).
- **strength**: 'primary' | 'secondary' | 'tertiary' — lower strengths
  truncate the key, so accent- or case-insensitive ordering falls out
  of key prefixing exactly as in UCA.
- **numeric**: ICU's ``UCOL_NUMERIC_COLLATION`` — a maximal digit run
  collates as ONE element keyed (marker, run length, digits...), so
  ``x2 < x10`` instead of codepoint order. Leading zeros are
  insignificant at every strength (documented subset).

Characters not mentioned in the rules take default elements AFTER the
whole tailored band: primary = a band offset + the codepoint of the
character's case-folded NFKD base, secondary = an index over its
combining marks, tertiary = its case bit — so untailored text still
orders sensibly (base letter, then accents, then case).

Spark-side, keys are data: ``collation_key_udf`` is an Arrow-batched
pandas UDF producing ``binary`` keys a plain ``ORDER BY`` range-sorts —
the 100 TB shape is Spark's own range-partitioned sort over the key
column, no comparator callbacks anywhere (exactly why the reference
materializes keys instead of sorting through a Collator).
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

__all__ = ["RuleBasedCollator", "CollationKeyAnalyzer", "collation_key_udf"]

_STRENGTHS = {"primary": 1, "secondary": 2, "tertiary": 3}

#: tailored primaries live in [0x0100, 0x4000); untailored defaults in
#: [0x4000, 0xFFF0); 0xFFF0 marks a numeric-run element
_TAILORED_BASE = 0x0100
_DEFAULT_BASE = 0x4000
_NUMERIC_MARKER = 0xFFF0

_SYNTAX = set("<;,=&")


def _parse_rules(rules: str):
    """-> list of (text, relation) where relation in '<;,=' and the
    FIRST entry's relation is '<' by construction; '&text' emits a
    ('&', text) reset marker inline."""
    toks = []
    i, n = 0, len(rules)
    while i < n:
        ch = rules[i]
        if ch.isspace():
            i += 1
            continue
        if ch in _SYNTAX:
            toks.append(ch)
            i += 1
            continue
        j = i
        while j < n and rules[j] not in _SYNTAX and not rules[j].isspace():
            j += 1
        toks.append(("T", rules[i:j]))
        i = j
    out = []
    k = 0
    while k < len(toks):
        t = toks[k]
        if t == "&":
            k += 1
            if k >= len(toks) or not isinstance(toks[k], tuple):
                raise ValueError("collation rules: '&' needs a reset text")
            out.append(("&", toks[k][1]))
            k += 1
            continue
        if t in ("<", ";", ",", "="):
            k += 1
            if k >= len(toks) or not isinstance(toks[k], tuple):
                raise ValueError(f"collation rules: {t!r} needs a text")
            out.append((t, toks[k][1]))
            k += 1
            continue
        raise ValueError(f"collation rules: unexpected text {t[1]!r}")
    return out


def _default_element(ch: str):
    """(primary, secondary, tertiary) for an untailored character."""
    folded = ch.casefold()
    decomp = unicodedata.normalize("NFKD", folded)
    base = next(
        (c for c in decomp if not unicodedata.combining(c)), decomp[:1] or ch
    )
    marks = [c for c in decomp if unicodedata.combining(c)]
    secondary = (ord(marks[0]) & 0xFF) + 1 if marks else 0
    tertiary = 1 if ch != folded else 0
    return (_DEFAULT_BASE + min(ord(base), 0xBFE0), secondary, tertiary)


@dataclass
class _Element:
    text: str
    rel: str  # relation to the PREVIOUS element in tailored order


class RuleBasedCollator:
    def __init__(self, rules: str = "", strength: str = "tertiary",
                 numeric: bool = False):
        if strength not in _STRENGTHS:
            raise ValueError(f"unknown strength {strength!r}")
        self.strength = _STRENGTHS[strength]
        self.numeric = numeric
        order: list[_Element] = []
        cursor = -1  # insert AFTER this index
        for rel, text in _parse_rules(rules):
            if rel == "&":
                cursor = next(
                    (i for i, e in enumerate(order) if e.text == text), None
                )
                if cursor is None:
                    raise ValueError(f"collation reset to unknown {text!r}")
                continue
            order.insert(cursor + 1, _Element(text, rel))
            cursor += 1
        # integer weights from the final order: '<' bumps primary and
        # clears the lower levels, ';' secondary, ',' tertiary, '=' none
        self._weights: dict[str, tuple] = {}
        p, s, t = _TAILORED_BASE, 0, 0
        for i, e in enumerate(order):
            if i > 0:
                if e.rel == "<":
                    p, s, t = p + 1, 0, 0
                elif e.rel == ";":
                    s, t = s + 1, 0
                elif e.rel == ",":
                    t += 1
            self._weights[e.text] = (p, s, t)
        self._max_contraction = max((len(k) for k in self._weights), default=1)

    # ------------------------------------------------------------- keys

    def _elements(self, text: str):
        out = []
        i, n = 0, len(text)
        while i < n:
            if self.numeric and text[i].isdigit():
                j = i
                while j < n and text[j].isdigit():
                    j += 1
                digits = text[i:j].lstrip("0") or "0"
                # run length and digit units sit above the 0x0001 level
                # separator so a short number ends before a longer one
                out.append((_NUMERIC_MARKER, 0, 0))
                out.append((0x0002 + len(digits), 0, 0))
                out.extend((0x0002 + ord(d) - ord("0"), 0, 0) for d in digits)
                i = j
                continue
            hit = None
            for ln in range(min(self._max_contraction, n - i), 0, -1):
                w = self._weights.get(text[i : i + ln])
                if w is not None:
                    hit = (w, ln)
                    break
            if hit is not None:
                out.append(hit[0])
                i += hit[1]
            else:
                out.append(_default_element(text[i]))
                i += 1
        return out

    def sort_key(self, text: str) -> bytes:
        """Binary key: bytewise order == collation order. Levels are
        joined by a 0x00 0x01 separator no primary can collide with
        (primaries are >= 0x0100)."""
        els = self._elements(text)
        key = bytearray()
        for p, _, _ in els:
            key += p.to_bytes(2, "big")
        # every element emits a COMMON +2 base weight at the lower
        # levels (zero would collide with the 0x0001 separator, and
        # omitting it would break the positional level comparison the
        # JDK/UCA model uses: 'AÂa' < 'âaA' because the secondary
        # sequences align element-by-element)
        if self.strength >= 2:
            key += b"\x00\x01"
            for _, s, _ in els:
                key += (s + 2).to_bytes(2, "big")
        if self.strength >= 3:
            key += b"\x00\x01"
            for _, _, t in els:
                key += (t + 2).to_bytes(2, "big")
        return bytes(key)

    def compare(self, a: str, b: str) -> int:
        ka, kb = self.sort_key(a), self.sort_key(b)
        return (ka > kb) - (ka < kb)

    def sorted(self, items) -> list:
        return sorted(items, key=self.sort_key)


class CollationKeyAnalyzer:
    """ICUCollationKeyAnalyzer.java:47 — the whole field value becomes
    ONE keyword token whose term is the hex sort key, so term order in
    the index (and any TermRangeQuery over it) is collation order."""

    def __init__(self, collator: RuleBasedCollator):
        self.collator = collator

    def key(self, value: str) -> str:
        return self.collator.sort_key(value).hex()

    def __call__(self, value: str) -> str:
        return self.key(value)


def collation_key_udf(rules: str = "", strength: str = "tertiary",
                      numeric: bool = False):
    """Arrow-batched pandas UDF: string column -> binary sort-key
    column. The collator is built once per executor task, not per row."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _key(col):
        import pandas as pd

        c = RuleBasedCollator(rules, strength=strength, numeric=numeric)
        return pd.Series([None if v is None else c.sort_key(v) for v in col])

    return _key
