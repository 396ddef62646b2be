"""ICU-equivalent Unicode normalization and folding filters.

Re-expression of the reference's ICU analysis module core
(``analysis/icu/ICUNormalizer2Filter.java:43`` — Normalizer2 nfkc_cf by
default — and ``ICUFoldingFilter.java:55`` — the UTR#30 fold) on top of
the stdlib ``unicodedata`` tables instead of ICU4J data files:

- ``icu_normalize`` implements NFC / NFKC / NFKC_CaseFold: for nfkc_cf,
  default-ignorable code points are removed, then NFKD -> full case
  fold -> NFKC, the composition Unicode defines for toNFKC_Casefold.
- ``icu_fold`` approximates the UTR#30 folding chain the reference ships
  as binary data (utr30.nrm): accent removal (strip combining marks
  after NFKD), case folding, canonical duplicates, dashes folded to '-',
  digit folding to ASCII via the decimal-value property, width folding
  (NFKC), and the Latin special letters NFKD cannot decompose.

Out of scope (documented in COVERAGE.md): collation sort keys,
transliteration (ICUTransformFilter), and dictionary-based ICU
segmentation — the tokenizer's script-aware rules cover the CJK cases
the corpus needs. The reference's own filter test vectors replay in
``tests/test_icu.py``.
"""

from __future__ import annotations

import unicodedata

__all__ = ["icu_normalize", "icu_fold"]

# Default_Ignorable_Code_Point (the ranges that appear in text in
# practice; removed by nfkc_cf and by the UTR#30 fold)
_IGNORABLE_RANGES = (
    (0x00AD, 0x00AD), (0x034F, 0x034F), (0x061C, 0x061C),
    (0x115F, 0x1160), (0x17B4, 0x17B5), (0x180B, 0x180F),
    (0x200B, 0x200F), (0x202A, 0x202E), (0x2060, 0x206F),
    (0x3164, 0x3164), (0xFE00, 0xFE0F), (0xFEFF, 0xFEFF),
    (0xFFA0, 0xFFA0), (0x1D173, 0x1D17A), (0xE0000, 0xE0FFF),
)


def _strip_ignorables(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if any(lo <= cp <= hi for lo, hi in _IGNORABLE_RANGES):
            continue
        out.append(ch)
    return "".join(out)


def icu_normalize(term: str, form: str = "nfkc_cf") -> str:
    """ICUNormalizer2Filter: normalize to `form` ('nfc' | 'nfkc' |
    'nfkc_cf'). nfkc_cf = remove default ignorables, NFKD, full case
    fold, recompose NFKC — Unicode's toNFKC_Casefold definition."""
    if form == "nfc":
        return unicodedata.normalize("NFC", term)
    if form == "nfkc":
        return unicodedata.normalize("NFKC", term)
    if form != "nfkc_cf":
        raise ValueError(f"unsupported normalization form {form!r}")
    t = _strip_ignorables(term)
    t = unicodedata.normalize("NFKD", t).casefold()
    return unicodedata.normalize("NFKC", t)


# Latin letters NFKD cannot decompose — the UTR#30 fold maps them like
# ASCIIFoldingFilter does (lowercase outputs: the fold runs after case
# folding)
_FOLD_LETTERS = {
    "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d", "þ": "th",
    "ħ": "h", "ŋ": "n", "ŧ": "t", "ı": "i", "ł": "l", "ĸ": "k",
    "ƀ": "b", "ǥ": "g", "ɨ": "i", "ɉ": "j", "ɍ": "r",
    "ʉ": "u", "ɏ": "y", "ƶ": "z",
}

_DASHES = set(
    "-֊־᐀᠆‐‑‒–—―"
    "⸗⸚〜〰゠︱︲﹘﹣－"
)


def icu_fold(term: str) -> str:
    """ICUFoldingFilter (UTR#30): diacritic removal, case folding, digit
    folding to ASCII, width/compat folding, dash folding, default-
    ignorable removal; composed back with NFKC like the reference's
    utr30 normalizer (which ends in an NFKC composition step)."""
    t = _strip_ignorables(term)
    t = unicodedata.normalize("NFKD", t).casefold()
    # a second NFKD: case folding can introduce decomposable chars
    t = unicodedata.normalize("NFKD", t)
    out = []
    for ch in t:
        if unicodedata.combining(ch):
            continue  # accent removal (Mn after decomposition)
        if ch in _FOLD_LETTERS:
            out.append(_FOLD_LETTERS[ch])
            continue
        if ch in _DASHES:
            out.append("-")
            continue
        d = unicodedata.decimal(ch, None)
        if d is not None:
            out.append(str(d))
            continue
        out.append(ch)
    return unicodedata.normalize("NFKC", "".join(out))
