"""Dictionary-driven CJK word segmentation — the pluggable-segmenter seam
the reference fills with kuromoji / nori / smartcn
(``analysis/kuromoji/.../JapaneseTokenizer.java:96``,
``analysis/nori/.../KoreanTokenizer.java``): those tokenizers consult a
bundled word dictionary to split unspaced CJK text into words instead of
single ideographs. This module supplies that ROLE as an analyzer-level
hook — a greedy longest-match segmenter over an externally supplied word
table — without porting the Viterbi lattice or the MeCab dictionaries
(documented fence: longest-match is the standard dictionary-segmentation
fallback; the hook accepts ANY word list, so a real lexicon drops in as a
data file, exactly like hunspell's .dic in ``analysis/hunspell.py``).

Spark integration mirrors the rest of the analysis chain: the dictionary
is DRIVER-side data shipped to executors inside the analyzer object (a
broadcast closure), so index builds with ``IndexConfig(analyzer=
DictionarySegmenter(...))`` and the pure-Python oracle use the same code.
The CJK-bigram path (``filters.CJKBigrams``) is untouched — it remains
the no-dictionary fallback, exactly the reference's CJKAnalyzer position.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from lucene_spark.analysis.tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    StandardAnalyzer,
    Token,
    java_lower,
)

import re

# contiguous run of CJK codepoints (same ranges the StandardAnalyzer's
# per-ideograph rule recognizes — tokenizer.py _CJK_ALL)
_CJK_RUN = re.compile(
    "["
    "一-鿿㐀-䶿豈-﫿"  # Han + ext A + compat
    "぀-ゟ"  # hiragana
    "゠-ヿㇰ-ㇿ"  # katakana (+ phonetic ext)
    "가-힯ᄀ-ᇿ㄰-㆏"  # hangul
    "]+"
)


@dataclass
class DictionarySegmenter:
    """StandardAnalyzer with dictionary longest-match over CJK runs.

    Non-CJK text tokenizes exactly like :class:`StandardAnalyzer`; each
    contiguous CJK run is split greedily against ``words`` (longest match
    at each offset, single character when nothing matches — the unknown-
    word fallback every dictionary segmenter needs). Positions are
    sequential across the whole stream like any tokenizer's.
    """

    words: frozenset[str] = field(default_factory=frozenset)
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
    stopwords: frozenset[str] = field(default_factory=frozenset)

    def __post_init__(self):
        self.words = frozenset(java_lower(w) for w in self.words)
        self._max_word = max((len(w) for w in self.words), default=1)
        self._base = StandardAnalyzer(
            max_token_length=self.max_token_length, stopwords=frozenset()
        )

    @classmethod
    def from_dataframe(cls, df, word_col: str = "word", **kw):
        """Collect a word-dictionary table to the driver (dictionaries are
        bounded — JMdict-scale is ~200k entries, the same budget
        hunspell's broadcast .dic uses)."""
        return cls(
            words=frozenset(r[word_col] for r in df.select(word_col).collect()),
            **kw,
        )

    # ---------------------------------------------------------------- core

    def _segment_run(self, run: str, base: int) -> list[tuple[str, int, int]]:
        """Greedy longest-match over one CJK run -> (word, start, end)."""
        out = []
        i, n = 0, len(run)
        while i < n:
            best = 1
            for ln in range(min(self._max_word, n - i), 1, -1):
                if run[i : i + ln] in self.words:
                    best = ln
                    break
            out.append((run[i : i + best], base + i, base + i + best))
            i += best
        return out

    def _raw(self, text: str) -> list[tuple[str, int, int]]:
        """(lowered term, start, end) stream before stop/length filtering."""
        lowered = java_lower(text)
        out: list[tuple[str, int, int]] = []
        last = 0
        for m in _CJK_RUN.finditer(lowered):
            if m.start() > last:
                seg = lowered[last : m.start()]
                out.extend(
                    (t.term, last + t.start_offset, last + t.end_offset)
                    for t in self._base.tokens(seg)
                )
            out.extend(self._segment_run(m.group(), m.start()))
            last = m.end()
        if last < len(lowered):
            seg = lowered[last:]
            out.extend(
                (t.term, last + t.start_offset, last + t.end_offset)
                for t in self._base.tokens(seg)
            )
        return out

    # ------------------------------------------- StandardAnalyzer surface

    def tokens(self, text: str) -> list[Token]:
        out: list[Token] = []
        pos = -1
        for term, s, e in self._raw(text):
            if len(term) > self.max_token_length:
                pos += 1
                continue
            pos += 1
            if term in self.stopwords:
                continue
            out.append(Token(term, pos, s, e))
        return out

    def terms(self, text: str) -> list[str]:
        return [t.term for t in self.tokens(text)]

    def field_length(self, text: str) -> int:
        return len(self.tokens(text))

    def emitted_count(self, text: str) -> int:
        return len(self.tokens(text))

    def term_position_arrays(self, text: str):
        import numpy as np

        toks = self.tokens(text)
        terms = [t.term for t in toks]
        pos = np.fromiter(
            (t.position for t in toks), dtype=np.int32, count=len(toks)
        )
        return terms, pos, len(terms)

    def term_position_offset_arrays(self, text: str):
        import numpy as np

        toks = self.tokens(text)
        terms = [t.term for t in toks]
        pos = np.asarray([t.position for t in toks], dtype=np.int32)
        offs = np.asarray(
            [[t.start_offset, t.end_offset] for t in toks], dtype=np.uint32
        ).reshape(-1, 2)
        return terms, pos, offs, len(terms)

    def inverted(self, text: str):
        post: dict[str, list[int]] = {}
        toks = self.tokens(text)
        for t in toks:
            post.setdefault(t.term, []).append(t.position)
        return post, len(toks)
