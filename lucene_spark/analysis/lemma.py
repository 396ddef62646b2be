"""Dictionary lemmatization — the reference's morfologik role
(``analysis/morfologik/.../MorfologikFilter.java:46``, which wraps the
morfologik-stemming FSA dictionary; ``lucene/analysis/stempel`` fills
the same Polish slot with a trained patch-command trie).

The reference treats the DICTIONARY as external data (a compiled
``.dict`` FSA built from tab-separated source rows); this module does
the same with the source rows directly: ``DictionaryLemmatizer`` holds
an inflected-form -> (lemma, tag) table loaded from the morfologik
plain-text input format (``inflected<TAB>lemma<TAB>tag``, ``#``
comments), and integrates with the analysis chain exactly like
MorfologikFilter:

- **replace mode** (``.filter()`` in ``FilteredAnalyzer(filters=...)``):
  the FIRST lemma replaces the token — the PolishAnalyzer shape, where
  one interpretation survives disambiguation;
- **graph mode** (``.expander()`` in ``overlay_filters=...``): the
  original form stays and EVERY lemma overlays at the same position
  (posIncr 0) — MorfologikFilter's one-token-per-interpretation graph
  with the surface form kept for exact matching.  The two modes are
  alternatives (overlay filters run after 1:1 filters in the chain, so
  stacking both would lemmatize lemmas);
- unknown words pass through unchanged in both modes
  (MorfologikFilter's keep-unmatched behavior).

Polish SNOWBALL stemming already exists (``analysis/snowball.py``); this
closes the dictionary-LEMMA fidelity gap for languages where suffix
stripping conflates paradigms — the published Polish morfologik
dictionary (morfologik.blogspot.com / sgjp.pl data) drops in as rows.
Like hunspell and the CJK lattice, the table ships to executors inside
the analyzer closure; no per-row Python at query time beyond the
already-Python invert pass FilteredAnalyzer forces.
"""

from __future__ import annotations

from lucene_spark.analysis.tokenizer import java_lower

__all__ = ["DictionaryLemmatizer"]


class DictionaryLemmatizer:
    #: same enforced driver-collect budget as the CJK segmenter's
    #: dictionaries — real lemma tables (Polish PoliMorf ~7M rows) sit
    #: within it; a mistake (pointing at a term table) fails loudly
    MAX_DICT_ENTRIES = 20_000_000

    def __init__(self, entries: dict):
        """``entries``: inflected form -> iterable of (lemma, tag) pairs
        (file order preserved; duplicates collapse keeping first)."""
        self.entries: dict[str, tuple] = {}
        for word, interps in dict(entries).items():
            seen = []
            for lemma, tag in interps:
                key = java_lower(lemma)
                if key not in (s[0] for s in seen):
                    seen.append((key, tag))
            self.entries[java_lower(word)] = tuple(seen)

    @classmethod
    def parse_tsv(cls, text: str) -> "DictionaryLemmatizer":
        """morfologik plain-text input rows ``inflected<TAB>lemma<TAB>tag``
        (the format ``morfologik-stemming``'s dict compiler consumes);
        the tag column may be absent; ``#`` comments and blanks skip."""
        entries: dict[str, list] = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                raise ValueError(
                    f"lemma tsv: need 'inflected<TAB>lemma[<TAB>tag]' in {line!r}"
                )
            word, lemma = parts[0], parts[1]
            tag = parts[2] if len(parts) > 2 else ""
            entries.setdefault(word, []).append((lemma, tag))
        return cls(entries)

    @classmethod
    def from_dataframe(
        cls, df, word_col: str = "word", lemma_col: str = "lemma",
        tag_col: str | None = None,
    ):
        """Collect a lemma table to the driver (bounded like the CJK
        segmenter's ``from_dataframe`` — limit(N+1) + raise)."""
        cols = [word_col, lemma_col] + ([tag_col] if tag_col else [])
        rows = df.select(*cols).limit(cls.MAX_DICT_ENTRIES + 1).collect()
        if len(rows) > cls.MAX_DICT_ENTRIES:
            raise ValueError(
                f"from_dataframe: lemma table exceeds {cls.MAX_DICT_ENTRIES} "
                "rows — this collects to the driver"
            )
        entries: dict[str, list] = {}
        for r in rows:
            entries.setdefault(r[word_col], []).append(
                (r[lemma_col], r[tag_col] if tag_col else "")
            )
        return cls(entries)

    # ------------------------------------------------------------ lookup

    def lemmas(self, word: str) -> list[str]:
        """Distinct lemmas of ``word`` (file order), [] when unknown."""
        return [l for l, _ in self.entries.get(java_lower(word), ())]

    def interpretations(self, word: str) -> list[tuple]:
        """(lemma, tag) pairs — the WordData view MorfologikFilter's
        MorphosyntacticTagsAttribute exposes."""
        return list(self.entries.get(java_lower(word), ()))

    # ------------------------------------- analysis-chain integration

    def filter(self):
        """1:1 filter: first lemma replaces the token; unknown words
        pass through (MorfologikFilter's token rewrite)."""

        def f(term: str) -> str:
            ls = self.lemmas(term)
            return ls[0] if ls else term

        return f

    def expander(self):
        """Graph-mode overlay: ALL lemmas of the (kept) surface form,
        emitted at the same position (posIncr 0 — one token per
        interpretation; the chain already skips extras equal to the
        surface form itself)."""

        def ov(term: str):
            return self.lemmas(term)

        return ov
