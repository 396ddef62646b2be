"""JVM-side (Spark SQL) analyzer expressions mirroring StandardAnalyzer.

The Python chain in ``tokenizer.py`` is the source of truth (UAX#29
consequences, java-lower, 255-skip; reference
``analysis/standard/StandardTokenizer.java:29-77``). These helpers express
the SAME token stream as native Spark SQL expressions so hot paths
(doclens counting, monitor presearch, highlighter token slicing) never
leave the JVM:

- Java regex accepts the identical pattern with ``(?U)`` enabling
  UNICODE_CHARACTER_CLASS, matching Python's Unicode ``\\w`` semantics
  (lookaround is supported by ``java.util.regex`` too);
- token boundaries are case-invariant (both lowercase mappings used here
  are 1:1 on codepoints), so lowering before/after extraction is
  equivalent; SQL ``lower()`` differs from ``java_lower`` only on
  non-1:1 mappings which the Python chain also maps to themselves;
- the norm byte is the byte4 staircase (``util/SmallFloat.java:103-157``):
  because the 256 bucket floors are sorted, ``encode(len)`` equals
  ``#floors <= len - 1`` — a 256-literal array fold, fully codegen'd.

Equivalence with the Python chain is pinned by ``tests/test_tokenizer.py``
(golden fixtures run through BOTH implementations).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from lucene_spark.util.smallfloat import LENGTH_TABLE_INT

__all__ = [
    "TOKEN_PATTERN_JAVA",
    "sql_tokens",
    "sql_emitted_count",
    "sql_norm_byte",
]

# identical structure to tokenizer._TOKEN_RE, with (?U) for Unicode \w;
# the CJK ranges are shared literals so both engines split CJK scripts
# the same way (ideograph/hiragana per-char, katakana/hangul runs)
from lucene_spark.analysis.tokenizer import (  # noqa: E402
    HAN_RANGES,
    HANGUL_RANGES,
    HIRAGANA_RANGES,
    KATAKANA_RANGES,
)

_CJK_ALL = HAN_RANGES + HIRAGANA_RANGES + KATAKANA_RANGES + HANGUL_RANGES
_SEP_LETTER = r"(?<=[^\W\d])[.:'’](?=[^\W\d])"
_SEP_DIGIT = r"(?<=\d)[.,'’](?=\d)"
_W = rf"[^\W{_CJK_ALL}]"
# alternatives are mutually exclusive on the first char: word-run first
# (the overwhelmingly common case), CJK rules after — order is
# result-invariant, see tokenizer._TOKEN_RE
TOKEN_PATTERN_JAVA = (
    rf"(?U){_W}+(?:(?:{_SEP_LETTER}|{_SEP_DIGIT}){_W}+)*"
    rf"|[{KATAKANA_RANGES}]+"
    rf"|[{HANGUL_RANGES}]+"
    rf"|[{HAN_RANGES}]"
    rf"|[{HIRAGANA_RANGES}]"
)

# fast path for CJK-free rows: on text with no CJK codepoint the classic
# pattern produces the IDENTICAL token stream (the CJK alternatives can
# never fire and \w == the CJK-excluding word class), and its plain \w
# engine is ~40% faster than the range-subtracted class. Rows are
# dispatched per-row by one cheap probe (matches the Python chain's
# identical dispatch in tokenizer.py). The probe is a SINGLE range — a
# multi-range class probe costs more than it saves — covering U+1100 and
# above: every CJK range sits there, every major cased/European/Middle-
# Eastern/Indic script sits below, and a false positive (Ethiopic, emoji,
# astral symbols…) only routes that row to the slower exact pattern.
TOKEN_PATTERN_JAVA_FAST = rf"(?U)\w+(?:(?:{_SEP_LETTER}|{_SEP_DIGIT})\w+)*"
CJK_PROBE_JAVA = "[ᄀ-\U0010ffff]"


def _extract_tokens(lowered: Column) -> Column:
    return F.when(
        lowered.rlike(CJK_PROBE_JAVA),
        F.regexp_extract_all(lowered, F.lit(TOKEN_PATTERN_JAVA), F.lit(0)),
    ).otherwise(
        F.regexp_extract_all(lowered, F.lit(TOKEN_PATTERN_JAVA_FAST), F.lit(0))
    )


def sql_tokens(text: Column | str, max_token_length: int = 255) -> Column:
    """array<string> of emitted (lowercased) tokens for one text column.

    Matches ``StandardAnalyzer.terms`` for the empty-stopword default:
    over-long raw tokens are dropped (their position gap is irrelevant to
    consumers of the flat token array).
    """
    col = F.col(text) if isinstance(text, str) else text
    # translate İ first: SQL lower() full-maps it to 'i' + combining dot
    # (1->2 codepoints) where Character.toLowerCase keeps it 1:1 -> 'i'
    lowered = F.lower(F.translate(F.coalesce(col, F.lit("")), "İ", "i"))
    raw = _extract_tokens(lowered)
    return F.filter(raw, lambda t: F.length(t) <= F.lit(max_token_length))


def sql_emitted_count(text: Column | str, max_token_length: int = 255) -> Column:
    """Emitted-token count == ``StandardAnalyzer.emitted_count`` (empty
    stopword set): tokens longer than max_token_length are skipped.
    Length is codepoint count, invariant under lowercasing, so no
    ``lower()`` is needed at all on this path."""
    col = F.col(text) if isinstance(text, str) else text
    raw = _extract_tokens(F.coalesce(col, F.lit("")))
    kept = F.filter(raw, lambda t: F.length(t) <= F.lit(max_token_length))
    return F.size(kept)


def sql_norm_byte(length: Column) -> Column:
    """byte4 norm byte of a non-negative length column (int).

    CLOSED FORM of ``smallfloat.int_to_byte4`` (``util/SmallFloat.java:
    103-157``), not a table scan: lengths below NUM_FREE_VALUES pass
    through; above, keep the 4 significant bits plus exponent —
    ``mantissa | ((bit_length-3) << 3)``. bit_length comes from
    ``conv(x, 10, 2)``'s string length (exact integer arithmetic, no
    float log2 boundary risk) and the shift is an exact power-of-two
    division (x < 2^53 so double division by 2^k is exact). Everything
    here is plain codegen-able scalar expressions — the earlier
    256-literal ``aggregate`` fold was interpreted per ROW and dominated
    the whole index build when a projection pushed it below an explode.

    Equivalence with ``smallfloat.encode_lengths`` over the full byte
    range is pinned in ``tests/test_tokenizer.py``.
    """
    from lucene_spark.util.smallfloat import NUM_FREE_VALUES

    nfv = F.lit(int(NUM_FREE_VALUES))
    x = (length.cast("long") - nfv).cast("long")
    nb = F.when(x <= 0, F.lit(1)).otherwise(
        F.length(F.conv(x.cast("string"), 10, 2))
    )
    shifted = F.floor(
        x.cast("double") / F.pow(F.lit(2.0), (nb - F.lit(4)).cast("double"))
    ).cast("long")
    int4 = F.when(nb < 4, x).otherwise(
        shifted.bitwiseAND(F.lit(7)) + (nb - F.lit(3)) * F.lit(8)
    )
    return F.when(length < nfv, length.cast("long")).otherwise(nfv + int4).cast(
        "int"
    )
