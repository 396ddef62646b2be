"""StandardAnalyzer-equivalent text analysis (clean-room, Python/regex).

Behavioral parity targets in the reference:

- ``analysis/standard/StandardTokenizer.java:29-77`` + grammar
  ``StandardTokenizerImpl.jflex:211-251`` — UAX#29 word-break tokenization.
  The consequences we reproduce (the ones that matter for code/text corpora):

  * ``_`` is ExtendNumLet: a plain word character (``foo_bar`` is ONE token)
  * ``.`` ``'`` ``:`` between letters join (MidLetter/MidNumLet): ``a.b``,
    ``can't``, ``a:b`` stay single tokens
  * ``.`` ``,`` ``'`` between digits join (MidNum/MidNumLet): ``1,000``,
    ``3.14`` stay single tokens
  * ``-`` ``/`` ``(`` etc. split
  * tokens longer than ``max_token_length`` (default 255,
    ``StandardAnalyzer.java:37``) are DROPPED but still count a position
    (``StandardTokenizer.java:163-173``)

- ``analysis/LowerCaseFilter.java:38`` — per-codepoint
  ``Character.toLowerCase(int)`` (NOT full case folding; differs from
  ``str.lower`` on e.g. U+0130).

- ``analysis/StopFilter.java:96`` — empty default stop set (no-op), but when
  a stop set is supplied, removal leaves position gaps
  (``FilteringTokenFilter.java:49-58``).

Field length for BM25 norms = number of emitted tokens minus overlaps
(``index/FieldInvertState.java:38-43``); this chain never emits overlaps.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["StandardAnalyzer", "Token", "DEFAULT_MAX_TOKEN_LENGTH"]

DEFAULT_MAX_TOKEN_LENGTH = 255

# CJK script ranges (StandardTokenizer's IDEOGRAPHIC / HIRAGANA / KATAKANA
# / HANGUL classes, main Unicode blocks; the jflex grammar uses the full
# script properties — these ranges cover the assigned codepoints that
# occur in real corpora). Used identically by the SQL twin (analysis/
# sql.py) so both token streams stay pinned-equivalent.
HAN_RANGES = (
    "㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002ebef\U00030000-\U0003134f"
)
HIRAGANA_RANGES = "ぁ-ゖゝ-ゟ"
KATAKANA_RANGES = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾟ"
HANGUL_RANGES = "ᄀ-ᇿ㄰-㆏가-힣"
_CJK_ALL = HAN_RANGES + HIRAGANA_RANGES + KATAKANA_RANGES + HANGUL_RANGES

# Word chars: Unicode letters, digits, underscore (ExtendNumLet glue) —
# minus the CJK scripts, which follow their own UAX#29 rules below.
# Mid-token separators are context-sensitive:
#   letters on both sides -> . : '      (MidLetter + MidNumLet)
#   digits on both sides  -> . , '      (MidNum + MidNumLet)
_SEP_LETTER = r"(?<=[^\W\d])[.:'’](?=[^\W\d])"
_SEP_DIGIT = r"(?<=\d)[.,'’](?=\d)"
_W = rf"[^\W{_CJK_ALL}]"
# The five alternatives are mutually exclusive on their first character
# (the word-run rule excludes CJK chars via _W), so alternation order
# cannot change results — the common word-run goes FIRST for speed.
# Per the jflex grammar (StandardTokenizerImpl.jflex:220-279): Hangul runs
# chain ({HangulEx}+ :220), Katakana runs chain ({KatakanaEx}+ :223),
# ideographs and hiragana emit ONE TOKEN PER CHARACTER (:276-279).
_TOKEN_RE_CJK = re.compile(
    rf"{_W}+(?:(?:{_SEP_LETTER}|{_SEP_DIGIT}){_W}+)*"
    rf"|[{KATAKANA_RANGES}]+"
    rf"|[{HANGUL_RANGES}]+"
    rf"|[{HAN_RANGES}]"
    rf"|[{HIRAGANA_RANGES}]",
    re.UNICODE,
)
# fast path for CJK-free text: identical token stream (the CJK
# alternatives can never fire and \w == the CJK-excluding word class),
# plain-\w engine is measurably faster; rows dispatch on one class probe
# (the SQL twin dispatches the same way, analysis/sql.py)
_TOKEN_RE_FAST = re.compile(
    rf"\w+(?:(?:{_SEP_LETTER}|{_SEP_DIGIT})\w+)*", re.UNICODE
)
# single-range probe (U+1100 and above): covers every CJK range; a false
# positive only routes that row to the slower exact pattern — see the
# rationale at analysis/sql.py CJK_PROBE_JAVA
_CJK_PROBE = re.compile("[ᄀ-\U0010ffff]")


class _TokenReDispatch:
    """Drop-in for the old module-level ``_TOKEN_RE``: picks the fast or
    CJK-aware compiled pattern per call based on the class probe."""

    @staticmethod
    def finditer(text: str):
        re_ = _TOKEN_RE_CJK if _CJK_PROBE.search(text) else _TOKEN_RE_FAST
        return re_.finditer(text)

    @staticmethod
    def findall(text: str):
        re_ = _TOKEN_RE_CJK if _CJK_PROBE.search(text) else _TOKEN_RE_FAST
        return re_.findall(text)


_TOKEN_RE = _TokenReDispatch()

# Java Character.toLowerCase(int) is per-codepoint; Python str.lower() does
# full (sometimes 1->N) case mapping.  Pin the divergent codepoints we care
# about; otherwise take str.lower() when it is a 1:1 mapping.
_JAVA_LOWER_EXCEPTIONS = {
    "İ": "i",  # LATIN CAPITAL LETTER I WITH DOT ABOVE -> plain 'i' in Java
}


def java_lower(text: str) -> str:
    """Per-codepoint lowercase consistent with java.lang.Character."""
    if text.isascii():
        return text.lower()
    out = []
    for ch in text:
        low = _JAVA_LOWER_EXCEPTIONS.get(ch)
        if low is None:
            low = ch.lower()
            if len(low) != 1:
                low = ch  # Java maps only codepoint->codepoint; keep as-is
        out.append(low)
    return "".join(out)


@dataclass(frozen=True)
class Token:
    term: str
    position: int
    start_offset: int
    end_offset: int


@dataclass
class StandardAnalyzer:
    """Tokenize + lowercase (+ optional stop removal with position gaps)."""

    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
    stopwords: frozenset[str] = field(default_factory=frozenset)

    def tokens(self, text: str) -> list[Token]:
        out: list[Token] = []
        pos = -1
        for m in _TOKEN_RE.finditer(text):
            raw = m.group()
            if len(raw) > self.max_token_length:
                pos += 1  # skipped over-long token still counts a position
                continue
            pos += 1
            term = java_lower(raw)
            if term in self.stopwords:
                continue  # removed, but the position gap stays
            out.append(Token(term, pos, m.start(), m.end()))
        return out

    def terms(self, text: str) -> list[str]:
        return [t.term for t in self.tokens(text)]

    def field_length(self, text: str) -> int:
        """Emitted-token count (BM25 norm input). Overlaps never occur here."""
        return len(self.tokens(text))

    def emitted_count(self, text: str) -> int:
        """Field length only (BM25 norm input) — the counting-only fast path
        for the doclens pass; no per-token objects or arrays."""
        lowered = java_lower(text)
        raw = _TOKEN_RE.findall(lowered)
        mx = self.max_token_length
        if self.stopwords:
            sw = self.stopwords
            return sum(1 for t in raw if len(t) <= mx and t not in sw)
        return sum(1 for t in raw if len(t) <= mx)

    def term_position_arrays(self, text: str):
        """Fast batch-inversion primitive: (terms, positions:int32, n_emitted).

        Equivalent to ``tokens()`` (property-tested) but avoids per-token
        object construction: the whole text is lowercased once (the
        per-codepoint mapping is 1:1, so token boundaries are invariant)
        and filtering runs as list comprehensions.
        """
        import numpy as np

        lowered = java_lower(text)
        raw = _TOKEN_RE.findall(lowered)
        mx = self.max_token_length
        if self.stopwords:
            sw = self.stopwords
            pairs = [
                (t, p) for p, t in enumerate(raw) if len(t) <= mx and t not in sw
            ]
        else:
            pairs = [(t, p) for p, t in enumerate(raw) if len(t) <= mx]
        terms = [t for t, _ in pairs]
        pos = np.fromiter((p for _, p in pairs), dtype=np.int32, count=len(pairs))
        return terms, pos, len(terms)

    def term_position_offset_arrays(self, text: str):
        """(terms, positions:int32, offsets:uint32[(start,end)x n], n).

        The offsets variant of ``term_position_arrays`` for
        DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS indexing
        (``index/IndexOptions.java``): character spans into the ORIGINAL
        text (the per-codepoint lowercase mapping is 1:1, so spans over
        the lowered text are identical). Uses ``finditer`` — costlier than
        the findall fast path, which is why offsets are opt-in like the
        reference's IndexOptions level.
        """
        import numpy as np

        lowered = java_lower(text)
        mx = self.max_token_length
        sw = self.stopwords
        terms: list[str] = []
        pos: list[int] = []
        offs: list[int] = []
        p = -1
        for m in _TOKEN_RE.finditer(lowered):
            t = m.group()
            if len(t) > mx:
                p += 1
                continue
            p += 1
            if sw and t in sw:
                continue
            terms.append(t)
            pos.append(p)
            offs.append(m.start())
            offs.append(m.end())
        return (
            terms,
            np.asarray(pos, dtype=np.int32),
            np.asarray(offs, dtype=np.uint32).reshape(-1, 2),
            len(terms),
        )

    def inverted(self, text: str) -> tuple[dict[str, list[int]], int]:
        """Per-doc inversion: term -> sorted positions, plus field length.

        This is the per-document unit of work of the index build
        (reference: ``index/IndexingChain.java:1888-2040`` invert loop).
        """
        postings: dict[str, list[int]] = {}
        n = 0
        for tok in self.tokens(text):
            n += 1
            postings.setdefault(tok.term, []).append(tok.position)
        return postings, n
