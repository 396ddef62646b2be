"""Phonetic analysis — the reference's ``lucene/analysis/phonetic`` module.

The reference module is a set of thin TokenFilters over the Apache
Commons Codec phonetic encoders:

- ``phonetic/PhoneticFilter.java:27`` — wraps any encoder; ``inject=true``
  emits the code first at the token's position increment, then the
  original as a posIncr-0 overlap; ``inject=false`` replaces the token.
  A code that is empty or equal to the surface form (or an encoder
  error) passes the original through untouched.
- ``phonetic/DoubleMetaphoneFilter.java:33`` — primary + (when different)
  alternate Double Metaphone codes; ``inject=true`` keeps the original
  first and appends the codes as overlaps.
- ``phonetic/DaitchMokotoffSoundexFilter.java:40`` — the branching
  Daitch–Mokotoff soundex; every branch code is emitted (original first
  when injecting, else the first code takes the token's slot and the
  rest overlap).

The encoders themselves are clean-room Python implementations of the
published algorithms the commons-codec classes implement (American
Soundex incl. the census H/W rule, Refined Soundex, Lawrence Philips'
Metaphone 1990 and Double Metaphone 2000, Caverphone 2.0 [David Hood,
University of Otago, 2004], NYSIIS, the Kölner Phonetik, and the
Daitch–Mokotoff soundex table published by Avotaynu/JewishGen).  Every
token-stream fixture in the reference module's tests
(``TestPhoneticFilter.java``, ``TestPhoneticFilterFactory.java``,
``TestDoubleMetaphoneFilter.java``, ``TestDaitchMokotoffSoundexFilter.java``)
replays exactly in ``tests/test_phonetic.py``.

1:1 variants (``PhoneticFilter`` with ``inject=False`` over single-code
encoders) plug into ``FilteredAnalyzer`` via ``make_filter`` specs
``phonetic_soundex`` / ``phonetic_metaphone`` /
``phonetic_double_metaphone`` / ``phonetic_refined_soundex`` /
``phonetic_caverphone2`` / ``phonetic_nysiis`` / ``phonetic_cologne``,
so a phonetic field indexes through the normal build path.
"""

from __future__ import annotations

import re

__all__ = [
    "soundex",
    "refined_soundex",
    "metaphone",
    "double_metaphone",
    "caverphone2",
    "nysiis",
    "cologne_phonetic",
    "daitch_mokotoff",
    "phonetic_tokens",
    "double_metaphone_tokens",
    "daitch_mokotoff_tokens",
    "phonetic_replace",
]

_ONLY_ALPHA = re.compile(r"[^A-Za-z]")


def _clean(value: str) -> str:
    """SoundexUtils.clean: keep letters, uppercase."""
    return _ONLY_ALPHA.sub("", value).upper()


# --------------------------------------------------------------------------
# American Soundex (commons-codec Soundex, US_ENGLISH mapping)
# --------------------------------------------------------------------------

_SOUNDEX_MAP = "01230120022455012623010202"  # a..z


def _sdx_map(ch: str) -> str:
    return _SOUNDEX_MAP[ord(ch) - 65]


def soundex(value: str) -> str:
    """4-char American Soundex with the census H/W rule: consonants with
    the same code separated by H or W are coded once (vowels separate
    them into two codes). Mirrors the commons-codec loop exactly,
    including its one-intervening-letter lookback."""
    s = _clean(value)
    if not s:
        return s

    def mapping_code(i: int) -> str | None:
        mapped = _sdx_map(s[i])
        if i > 1 and mapped != "0":
            hw = s[i - 1]
            if hw in "HW":
                pre = s[i - 2]
                if _sdx_map(pre) == mapped or pre in "HW":
                    return None  # silent: folded into the pre-H/W code
        return mapped

    out = [s[0], "0", "0", "0"]
    count = 1
    last = mapping_code(0)
    i = 1
    while i < len(s) and count < 4:
        mapped = mapping_code(i)
        i += 1
        if mapped is None:
            continue
        if mapped != "0" and mapped != last:
            out[count] = mapped
            count += 1
        last = mapped
    return "".join(out)


# --------------------------------------------------------------------------
# Refined Soundex (commons-codec RefinedSoundex, US_ENGLISH mapping)
# --------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"  # a..z


def refined_soundex(value: str) -> str:
    """First letter + a code per letter (vowel zeros retained), adjacent
    equal codes collapsed; no length cap."""
    s = _clean(value)
    if not s:
        return s
    out = [s[0]]
    last = None
    for ch in s:
        code = _REFINED_MAP[ord(ch) - 65]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


# --------------------------------------------------------------------------
# Metaphone (Lawrence Philips 1990, commons-codec rule order)
# --------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"
_VOWELS = "AEIOU"


def metaphone(value: str, max_code_len: int = 4) -> str:
    if not value:
        return ""
    if len(value) == 1:
        return value.upper()
    word = value.upper()

    # initial-pair exceptions
    if word[0] in "KGP" and word[1] == "N":
        word = word[1:]
    elif word[0] == "A" and word[1] == "E":
        word = word[1:]
    elif word[0] == "W" and word[1] == "R":
        word = word[1:]
    elif word[0] == "W" and word[1] == "H":
        word = "W" + word[2:]
    elif word[0] == "X":
        word = "S" + word[1:]

    n_len = len(word)
    code: list[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < n_len and word[i] in _VOWELS

    def region(i: int, s: str) -> bool:
        return word[i : i + len(s)] == s

    while len(code) < max_code_len and n < n_len:
        sym = word[n]
        if sym != "C" and n > 0 and word[n - 1] == sym:
            n += 1  # drop duplicate letters except C
            continue
        if sym in _VOWELS:
            if n == 0:
                code.append(sym)
        elif sym == "B":
            if not (n > 0 and word[n - 1] == "M" and n == n_len - 1):
                code.append("B")
        elif sym == "C":
            if (
                n > 0
                and word[n - 1] == "S"
                and n != n_len - 1
                and word[n + 1] in _FRONTV
            ):
                pass  # SCI, SCE, SCY: silent C
            elif region(n, "CIA"):
                code.append("X")
            elif n != n_len - 1 and word[n + 1] in _FRONTV:
                code.append("S")
            elif n > 0 and word[n - 1] == "S" and n + 1 < n_len and word[n + 1] == "H":
                code.append("K")  # SCH -> K
            elif n + 1 < n_len and word[n + 1] == "H":
                if n == 0 and n_len >= 3 and not is_vowel(2):
                    code.append("K")  # CH + consonant
                else:
                    code.append("X")
            else:
                code.append("K")
        elif sym == "D":
            if (
                n + 2 < n_len
                and word[n + 1] == "G"
                and word[n + 2] in _FRONTV
            ):
                code.append("J")
                n += 2
            else:
                code.append("T")
        elif sym == "G":
            silent = False
            if n + 1 == n_len - 1 and word[n + 1] == "H":
                silent = True
            elif (
                n + 1 < n_len - 1
                and word[n + 1] == "H"
                and not is_vowel(n + 2)
            ):
                silent = True
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True
            if not silent:
                if n != n_len - 1 and word[n + 1] in _FRONTV:
                    code.append("J")
                else:
                    code.append("K")
        elif sym == "H":
            if n == n_len - 1:
                pass
            elif n > 0 and word[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif sym in "FJLMNR":
            code.append(sym)
        elif sym == "K":
            if n == 0 or word[n - 1] != "C":
                code.append("K")
        elif sym == "P":
            code.append("F" if (n + 1 < n_len and word[n + 1] == "H") else "P")
        elif sym == "Q":
            code.append("K")
        elif sym == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif sym == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif sym == "V":
            code.append("F")
        elif sym in "WY":
            if n != n_len - 1 and is_vowel(n + 1):
                code.append(sym)
        elif sym == "X":
            code.append("K")
            if len(code) < max_code_len:
                code.append("S")
        elif sym == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_code_len])


# --------------------------------------------------------------------------
# Double Metaphone (Lawrence Philips 2000, commons-codec condition set)
# --------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int):
        self.primary: list[str] = []
        self.alternate: list[str] = []
        self.max_len = max_len

    def append(self, p: str, a: str | None = None):
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s: str):
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str):
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self) -> bool:
        return (
            len(self.primary) >= self.max_len
            and len(self.alternate) >= self.max_len
        )


def double_metaphone(
    value: str, alternate: bool = False, max_code_len: int = 4
) -> str:
    """Philips' Double Metaphone; ``alternate=True`` returns the
    secondary encoding (equal to the primary when no rule branches)."""
    value = value.strip().upper() if value else ""
    if not value:
        return ""
    w = value
    n_len = len(w)
    slavo = ("W" in w) or ("K" in w) or ("CZ" in w) or ("WITZ" in w)
    res = _DMResult(max_code_len)

    def char_at(i: int) -> str:
        return w[i] if 0 <= i < n_len else "\0"

    def is_vowel(ch: str) -> bool:
        return ch in _DM_VOWELS

    def contains(start: int, length: int, *crit: str) -> bool:
        if start < 0 or start + length > n_len:
            return False
        seg = w[start : start + length]
        return seg in crit

    # ---- per-letter handlers (condition structure mirrors the published
    # algorithm; comments name the canonical examples) -------------------

    def handle_c(i: int) -> int:
        # "chianti"-style ACH, Caesar, CH, Polish CZ, focaccia, CC, CK/CG/CQ,
        # CI/CE/CY, Mac Caffrey
        def cond_c0() -> bool:
            if contains(i, 4, "CHIA"):
                return True
            if i <= 1:
                return False
            if is_vowel(char_at(i - 2)):
                return False
            if not contains(i - 1, 3, "ACH"):
                return False
            c = char_at(i + 2)
            return (c != "I" and c != "E") or contains(
                i - 2, 6, "BACHER", "MACHER"
            )

        def handle_cc() -> int:
            if contains(i + 2, 1, "I", "E", "H") and not contains(i + 2, 2, "HU"):
                if (i == 1 and char_at(i - 1) == "A") or contains(
                    i - 1, 5, "UCCEE", "UCCES"
                ):
                    res.append("KS")  # accident, succeed
                else:
                    res.append("X")  # bacci, bertucci
                return i + 3
            res.append("K")  # Pierce's rule
            return i + 2

        def cond_ch0() -> bool:
            if i != 0:
                return False
            if not (
                contains(i + 1, 5, "HARAC", "HARIS")
                or contains(i + 1, 3, "HOR", "HYM", "HIA", "HEM")
            ):
                return False
            return not contains(0, 5, "CHORE")

        def cond_ch1() -> bool:
            return (
                (contains(0, 4, "VAN ", "VON ") or contains(0, 3, "SCH"))
                or contains(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                or contains(i + 2, 1, "T", "S")
                or (
                    (contains(i - 1, 1, "A", "O", "U", "E") or i == 0)
                    and (
                        contains(i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                        or i + 1 == n_len - 1
                    )
                )
            )

        def handle_ch() -> int:
            if i > 0 and contains(i, 4, "CHAE"):
                res.append("K", "X")  # Michael
            elif cond_ch0() or cond_ch1():
                res.append("K")  # Greek / Germanic kh-sound
            elif i > 0:
                if contains(0, 2, "MC"):
                    res.append("K")
                else:
                    res.append("X", "K")
            else:
                res.append("X")
            return i + 2

        if cond_c0():
            res.append("K")
            return i + 2
        if i == 0 and contains(i, 6, "CAESAR"):
            res.append("S")
            return i + 2
        if contains(i, 2, "CH"):
            return handle_ch()
        if contains(i, 2, "CZ") and not contains(i - 2, 4, "WICZ"):
            res.append("S", "X")  # Czerny
            return i + 2
        if contains(i + 1, 3, "CIA"):
            res.append("X")  # focaccia
            return i + 3
        if contains(i, 2, "CC") and not (i == 1 and char_at(0) == "M"):
            return handle_cc()
        if contains(i, 2, "CK", "CG", "CQ"):
            res.append("K")
            return i + 2
        if contains(i, 2, "CI", "CE", "CY"):
            if contains(i, 3, "CIO", "CIE", "CIA"):
                res.append("S", "X")
            else:
                res.append("S")
            return i + 2
        res.append("K")
        if contains(i + 1, 2, " C", " Q", " G"):
            return i + 3  # Mac Caffrey, Mac Gregor
        if contains(i + 1, 1, "C", "K", "Q") and not contains(i + 1, 2, "CE", "CI"):
            return i + 2
        return i + 1

    def handle_d(i: int) -> int:
        if contains(i, 2, "DG"):
            if contains(i + 2, 1, "I", "E", "Y"):
                res.append("J")  # edge
                return i + 3
            res.append("TK")  # Edgar
            return i + 2
        if contains(i, 2, "DT", "DD"):
            res.append("T")
            return i + 2
        res.append("T")
        return i + 1

    def handle_gh(i: int) -> int:
        if i > 0 and not is_vowel(char_at(i - 1)):
            res.append("K")
            return i + 2
        if i == 0:
            res.append("J" if char_at(i + 2) == "I" else "K")
            return i + 2
        if (
            (i > 1 and contains(i - 2, 1, "B", "H", "D"))
            or (i > 2 and contains(i - 3, 1, "B", "H", "D"))
            or (i > 3 and contains(i - 4, 1, "B", "H"))
        ):
            return i + 2  # Parker's rule: "hugh"
        if i > 2 and char_at(i - 1) == "U" and contains(i - 3, 1, "C", "G", "L", "R", "T"):
            res.append("F")  # laugh, cough, rough
        elif i > 0 and char_at(i - 1) != "I":
            res.append("K")
        return i + 2

    def handle_g(i: int) -> int:
        if char_at(i + 1) == "H":
            return handle_gh(i)
        if char_at(i + 1) == "N":
            if i == 1 and is_vowel(char_at(0)) and not slavo:
                res.append("KN", "N")
            elif not contains(i + 2, 2, "EY") and char_at(i + 1) != "Y" and not slavo:
                res.append("N", "KN")
            else:
                res.append("KN")
            return i + 2
        if contains(i + 1, 2, "LI") and not slavo:
            res.append("KL", "L")
            return i + 2
        if i == 0 and (
            char_at(i + 1) == "Y"
            or contains(i + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
        ):
            res.append("K", "J")  # ges-, gy- at start
            return i + 2
        if (
            (contains(i + 1, 2, "ER") or char_at(i + 1) == "Y")
            and not contains(0, 6, "DANGER", "RANGER", "MANGER")
            and not contains(i - 1, 1, "E", "I")
            and not contains(i - 1, 3, "RGY", "OGY")
        ):
            res.append("K", "J")  # -ger-, -gy-
            return i + 2
        if contains(i + 1, 1, "E", "I", "Y") or contains(i - 1, 4, "AGGI", "OGGI"):
            if (
                contains(0, 4, "VAN ", "VON ")
                or contains(0, 3, "SCH")
                or contains(i + 1, 2, "ET")
            ):
                res.append("K")  # obvious germanic
            elif contains(i + 1, 3, "IER"):
                res.append("J")
            else:
                res.append("J", "K")
            return i + 2
        res.append("K")
        return i + 2 if char_at(i + 1) == "G" else i + 1

    def handle_h(i: int) -> int:
        # keep only if first & before vowel, or between two vowels
        if (i == 0 or is_vowel(char_at(i - 1))) and is_vowel(char_at(i + 1)):
            res.append("H")
            return i + 2
        return i + 1

    def handle_j(i: int) -> int:
        if contains(i, 4, "JOSE") or contains(0, 4, "SAN "):
            if (
                (i == 0 and char_at(i + 4) == " ")
                or n_len == 4
                or contains(0, 4, "SAN ")
            ):
                res.append("H")  # Jose, San Jacinto
            else:
                res.append("J", "H")
            return i + 1
        if i == 0:
            res.append("J", "A")
        elif (
            is_vowel(char_at(i - 1))
            and not slavo
            and (char_at(i + 1) == "A" or char_at(i + 1) == "O")
        ):
            res.append("J", "H")
        elif i == n_len - 1:
            res.append("J", " ")
        elif not contains(i + 1, 1, *_L_T_K_S_N_M_B_Z) and not contains(
            i - 1, 1, "S", "K", "L"
        ):
            res.append("J")
        # else: silent
        return i + 2 if char_at(i + 1) == "J" else i + 1

    def handle_l(i: int) -> int:
        if char_at(i + 1) == "L":
            # spanish ll: "cabrillo", "gallegos"
            if (
                i == n_len - 3
                and contains(i - 1, 4, "ILLO", "ILLA", "ALLE")
            ) or (
                (
                    contains(n_len - 2, 2, "AS", "OS")
                    or contains(n_len - 1, 1, "A", "O")
                )
                and contains(i - 1, 4, "ALLE")
            ):
                res.append_primary("L")  # alternate is silent
            else:
                res.append("L")
            return i + 2
        res.append("L")
        return i + 1

    def handle_p(i: int) -> int:
        if char_at(i + 1) == "H":
            res.append("F")
            return i + 2
        res.append("P")
        return i + 2 if contains(i + 1, 1, "P", "B") else i + 1

    def handle_r(i: int) -> int:
        if (
            i == n_len - 1
            and not slavo
            and contains(i - 2, 2, "IE")
            and not contains(i - 4, 2, "ME", "MA")
        ):
            res.append_alternate("R")  # french "rogier"
        else:
            res.append("R")
        return i + 2 if char_at(i + 1) == "R" else i + 1

    def handle_sc(i: int) -> int:
        if char_at(i + 2) == "H":
            # Schlesinger's rule
            if contains(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                if contains(i + 3, 2, "ER", "EN"):
                    res.append("X", "SK")  # schermerhorn, schenker
                else:
                    res.append("SK")  # school, schooner
            elif i == 0 and not is_vowel(char_at(3)) and char_at(3) != "W":
                res.append("X", "S")
            else:
                res.append("X")
        elif contains(i + 2, 1, "I", "E", "Y"):
            res.append("S")
        else:
            res.append("SK")
        return i + 3

    def handle_s(i: int) -> int:
        if contains(i - 1, 3, "ISL", "YSL"):
            return i + 1  # island, isle
        if i == 0 and contains(i, 5, "SUGAR"):
            res.append("X", "S")
            return i + 1
        if contains(i, 2, "SH"):
            if contains(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                res.append("S")  # germanic
            else:
                res.append("X")
            return i + 2
        if contains(i, 3, "SIO", "SIA") or contains(i, 4, "SIAN"):
            if slavo:
                res.append("S")
            else:
                res.append("S", "X")
            return i + 3
        if (i == 0 and contains(i + 1, 1, "M", "N", "L", "W")) or contains(
            i + 1, 1, "Z"
        ):
            res.append("S", "X")  # smith ~ schmidt
            return i + 2 if contains(i + 1, 1, "Z") else i + 1
        if contains(i, 2, "SC"):
            return handle_sc(i)
        if i == n_len - 1 and contains(i - 2, 2, "AI", "OI"):
            res.append_alternate("S")  # resnais, artois
        else:
            res.append("S")
        return i + 2 if contains(i + 1, 1, "S", "Z") else i + 1

    def handle_t(i: int) -> int:
        if contains(i, 4, "TION"):
            res.append("X")
            return i + 3
        if contains(i, 3, "TIA", "TCH"):
            res.append("X")
            return i + 3
        if contains(i, 2, "TH") or contains(i, 3, "TTH"):
            if (
                contains(i + 2, 2, "OM", "AM")
                or contains(0, 4, "VAN ", "VON ")
                or contains(0, 3, "SCH")
            ):
                res.append("T")  # thomas, thames
            else:
                res.append("0", "T")
            return i + 2
        res.append("T")
        return i + 2 if contains(i + 1, 1, "T", "D") else i + 1

    def handle_w(i: int) -> int:
        if contains(i, 2, "WR"):
            res.append("R")
            return i + 2
        if i == 0 and (is_vowel(char_at(i + 1)) or contains(i, 2, "WH")):
            if is_vowel(char_at(i + 1)):
                res.append("A", "F")  # Wasserman ~ Vasserman
            else:
                res.append("A")  # Uomo ~ Womo
            return i + 1
        if (
            (i == n_len - 1 and is_vowel(char_at(i - 1)))
            or contains(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or contains(0, 3, "SCH")
        ):
            res.append_alternate("F")  # Arnow ~ Arnoff
            return i + 1
        if contains(i, 4, "WICZ", "WITZ"):
            res.append("TS", "FX")  # filipowicz
            return i + 4
        return i + 1

    def handle_x(i: int) -> int:
        if i == 0:
            res.append("S")
            return i + 1
        if not (
            i == n_len - 1
            and (contains(i - 3, 3, "IAU", "EAU") or contains(i - 2, 2, "AU", "OU"))
        ):
            res.append("KS")  # not french "breaux"
        return i + 2 if contains(i + 1, 1, "C", "X") else i + 1

    def handle_z(i: int) -> int:
        if char_at(i + 1) == "H":
            res.append("J")  # pinyin "zhao"
            return i + 2
        if contains(i + 1, 3, "ZO", "ZI", "ZA") or (
            slavo and i > 0 and char_at(i - 1) != "T"
        ):
            res.append("S", "TS")
        else:
            res.append("S")
        return i + 2 if char_at(i + 1) == "Z" else i + 1

    index = 1 if w[:2] in _SILENT_START else 0
    while not res.complete() and index < n_len:
        ch = w[index]
        if ch in _DM_VOWELS:
            if index == 0:
                res.append("A")
            index += 1
        elif ch == "B":
            res.append("P")
            index += 2 if char_at(index + 1) == "B" else 1
        elif ch == "Ç":
            res.append("S")
            index += 1
        elif ch == "C":
            index = handle_c(index)
        elif ch == "D":
            index = handle_d(index)
        elif ch == "F":
            res.append("F")
            index += 2 if char_at(index + 1) == "F" else 1
        elif ch == "G":
            index = handle_g(index)
        elif ch == "H":
            index = handle_h(index)
        elif ch == "J":
            index = handle_j(index)
        elif ch == "K":
            res.append("K")
            index += 2 if char_at(index + 1) == "K" else 1
        elif ch == "L":
            index = handle_l(index)
        elif ch == "M":
            res.append("M")
            if char_at(index + 1) == "M" or (
                contains(index - 1, 3, "UMB")
                and (
                    index + 1 == n_len - 1
                    or contains(index + 2, 2, "ER")
                )
            ):
                index += 2
            else:
                index += 1
        elif ch == "N":
            res.append("N")
            index += 2 if char_at(index + 1) == "N" else 1
        elif ch == "Ñ":
            res.append("N")
            index += 1
        elif ch == "P":
            index = handle_p(index)
        elif ch == "Q":
            res.append("K")
            index += 2 if char_at(index + 1) == "Q" else 1
        elif ch == "R":
            index = handle_r(index)
        elif ch == "S":
            index = handle_s(index)
        elif ch == "T":
            index = handle_t(index)
        elif ch == "V":
            res.append("F")
            index += 2 if char_at(index + 1) == "V" else 1
        elif ch == "W":
            index = handle_w(index)
        elif ch == "X":
            index = handle_x(index)
        elif ch == "Z":
            index = handle_z(index)
        else:
            index += 1

    return "".join(res.alternate if alternate else res.primary)


# --------------------------------------------------------------------------
# Caverphone 2.0 (David Hood, 2004 revision)
# --------------------------------------------------------------------------

_CAVERPHONE2_STEPS: list[tuple[re.Pattern, str]] = [
    (re.compile(p), r)
    for p, r in [
        ("e$", ""),
        ("^cough", "cou2f"),
        ("^rough", "rou2f"),
        ("^tough", "tou2f"),
        ("^enough", "enou2f"),
        ("^trough", "trou2f"),
        ("^gn", "2n"),
        ("mb$", "m2"),
        ("cq", "2q"),
        ("ci", "si"),
        ("ce", "se"),
        ("cy", "sy"),
        ("tch", "2ch"),
        ("c", "k"),
        ("q", "k"),
        ("x", "k"),
        ("v", "f"),
        ("dg", "2g"),
        ("tio", "sio"),
        ("tia", "sia"),
        ("d", "t"),
        ("ph", "fh"),
        ("b", "p"),
        ("sh", "s2"),
        ("z", "s"),
        ("^[aeiou]", "A"),
        ("[aeiou]", "3"),
        ("j", "y"),
        ("^y3", "Y3"),
        ("^y", "A"),
        ("y", "3"),
        ("3gh3", "3kh3"),
        ("gh", "22"),
        ("g", "k"),
        ("s+", "S"),
        ("t+", "T"),
        ("p+", "P"),
        ("k+", "K"),
        ("f+", "F"),
        ("m+", "M"),
        ("n+", "N"),
        ("w3", "W3"),
        ("wh3", "Wh3"),
        ("w$", "3"),
        ("w", "2"),
        ("^h", "A"),
        ("h", "2"),
        ("r3", "R3"),
        ("r$", "3"),
        ("r", "2"),
        ("l3", "L3"),
        ("l$", "3"),
        ("l", "2"),
        ("2", ""),
        ("3$", "A"),
        ("3", ""),
    ]
]


def caverphone2(value: str) -> str:
    txt = re.sub(r"[^a-z]", "", value.lower())
    for pat, rep in _CAVERPHONE2_STEPS:
        txt = pat.sub(rep, txt)
    return (txt + "1111111111")[:10]


# --------------------------------------------------------------------------
# NYSIIS (commons-codec Nysiis, strict mode = 6-char key)
# --------------------------------------------------------------------------

_NYSIIS_VOWELS = "AEIOU"
_NYSIIS_FIRST = [
    (re.compile("^MAC"), "MCC"),
    (re.compile("^KN"), "NN"),
    (re.compile("^K"), "C"),
    (re.compile("^(PH|PF)"), "FF"),
    (re.compile("^SCH"), "SSS"),
]
_NYSIIS_LAST = [
    (re.compile("(EE|IE)$"), "Y"),
    (re.compile("(DT|RT|RD|NT|ND)$"), "D"),
]


def nysiis(value: str, strict: bool = True) -> str:
    s = _clean(value)
    if not s:
        return s
    for pat, rep in _NYSIIS_FIRST:
        s2 = pat.sub(rep, s, count=1)
        if s2 != s:
            s = s2
            break
    for pat, rep in _NYSIIS_LAST:
        s = pat.sub(rep, s, count=1)

    chars = list(s)
    key = [chars[0]]
    for i in range(1, len(chars)):
        nxt = chars[i + 1] if i < len(chars) - 1 else " "
        anxt = chars[i + 2] if i < len(chars) - 2 else " "
        prev, curr = chars[i - 1], chars[i]
        if curr == "E" and nxt == "V":
            transcoded = "AF"
        elif curr in _NYSIIS_VOWELS:
            transcoded = "A"
        elif curr == "Q":
            transcoded = "G"
        elif curr == "Z":
            transcoded = "S"
        elif curr == "M":
            transcoded = "N"
        elif curr == "K":
            transcoded = "NN" if nxt == "N" else "C"
        elif curr == "S" and nxt == "C" and anxt == "H":
            transcoded = "SSS"
        elif curr == "P" and nxt == "H":
            transcoded = "FF"
        elif curr == "H" and (
            prev not in _NYSIIS_VOWELS or nxt not in _NYSIIS_VOWELS
        ):
            transcoded = prev
        elif curr == "W" and prev in _NYSIIS_VOWELS:
            transcoded = prev
        else:
            transcoded = curr
        for j, tc in enumerate(transcoded):
            if i + j < len(chars):
                chars[i + j] = tc
        if chars[i] != chars[i - 1]:
            key.append(chars[i])

    # each trailing rule re-checks the length guard independently, like the
    # wrapped codec (a 2-letter name like "AZ" -> "AS" -> "A", never empty)
    if len(key) > 1 and key[-1] == "S":
        key.pop()
    if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
        del key[-2]
    if len(key) > 1 and key[-1] == "A":
        key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# --------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969)
# --------------------------------------------------------------------------

def cologne_phonetic(value: str) -> str:
    s = (
        value.upper()
        .replace("Ä", "A")
        .replace("Ö", "O")
        .replace("Ü", "U")
        .replace("ß", "SS")
    )
    s = _ONLY_ALPHA.sub("", s)
    if not s:
        return s
    n = len(s)
    digits: list[str] = []
    for i, ch in enumerate(s):
        # "\0" sentinels: membership tests like ``nxt in "CSZ"`` must be
        # False at the word edge (`"" in "CSZ"` is True in Python)
        prev = s[i - 1] if i > 0 else "\0"
        nxt = s[i + 1] if i < n - 1 else "\0"
        if ch in "AEIJOUY":
            d = "0"
        elif ch == "H":
            continue
        elif ch in "B":
            d = "1"
        elif ch == "P":
            d = "3" if nxt == "H" else "1"
        elif ch in "DT":
            d = "8" if nxt in "CSZ" else "2"
        elif ch in "FVW":
            d = "3"
        elif ch in "GKQ":
            d = "4"
        elif ch == "C":
            if i == 0:
                d = "4" if nxt in "AHKLOQRUX" else "8"
            elif prev in "SZ":
                d = "8"
            elif nxt in "AHKOQUX":
                d = "4"
            else:
                d = "8"
        elif ch == "X":
            d = "8" if prev in "CKQ" else "48"
        elif ch == "L":
            d = "5"
        elif ch in "MN":
            d = "6"
        elif ch == "R":
            d = "7"
        elif ch in "SZ":
            d = "8"
        else:
            continue
        digits.append(d)
    # collapse adjacent duplicates, then strip non-leading zeros
    code = "".join(digits)
    code = re.sub(r"(\d)\1+", r"\1", code)
    if code:
        code = code[0] + code[1:].replace("0", "")
    return code


# --------------------------------------------------------------------------
# Daitch–Mokotoff soundex (Avotaynu/JewishGen table; branching codes)
# --------------------------------------------------------------------------

_DM_NC = ""  # "not coded"

# pattern -> (at_start, before_vowel, other); each context may hold
# '|'-separated branch alternatives, applied in listed order (the fixture
# order of the reference's "ccc" run pins 'c' as "4|5")
_DM_RULES_RAW: dict[str, tuple[str, str, str]] = {
    "ai": ("0", "1", _DM_NC), "aj": ("0", "1", _DM_NC), "ay": ("0", "1", _DM_NC),
    "ei": ("0", "1", _DM_NC), "ej": ("0", "1", _DM_NC), "ey": ("0", "1", _DM_NC),
    "oi": ("0", "1", _DM_NC), "oj": ("0", "1", _DM_NC), "oy": ("0", "1", _DM_NC),
    "ui": ("0", "1", _DM_NC), "uj": ("0", "1", _DM_NC), "uy": ("0", "1", _DM_NC),
    "au": ("0", "7", _DM_NC),
    "ia": ("1", _DM_NC, _DM_NC), "ie": ("1", _DM_NC, _DM_NC),
    "io": ("1", _DM_NC, _DM_NC), "iu": ("1", _DM_NC, _DM_NC),
    "eu": ("1", "1", _DM_NC),
    "a": ("0", _DM_NC, _DM_NC), "ue": ("0", _DM_NC, _DM_NC),
    "e": ("0", _DM_NC, _DM_NC), "i": ("0", _DM_NC, _DM_NC),
    "o": ("0", _DM_NC, _DM_NC), "u": ("0", _DM_NC, _DM_NC),
    "y": ("1", _DM_NC, _DM_NC),
    "b": ("7", "7", "7"),
    "chs": ("5", "54", "54"),
    "ch": ("5|4", "5|4", "5|4"),
    "ck": ("5|45", "5|45", "5|45"),
    "cz": ("4", "4", "4"), "cs": ("4", "4", "4"),
    "csz": ("4", "4", "4"), "czs": ("4", "4", "4"),
    "c": ("4|5", "4|5", "4|5"),
    "drz": ("4", "4", "4"), "drs": ("4", "4", "4"),
    "ds": ("4", "4", "4"), "dsh": ("4", "4", "4"), "dsz": ("4", "4", "4"),
    "dz": ("4", "4", "4"), "dzh": ("4", "4", "4"), "dzs": ("4", "4", "4"),
    "d": ("3", "3", "3"), "dt": ("3", "3", "3"),
    "fb": ("7", "7", "7"), "f": ("7", "7", "7"),
    "g": ("5", "5", "5"),
    "h": ("5", "5", _DM_NC),
    "j": ("1|4", "1|4", "1|4"),
    "ks": ("5", "54", "54"), "kh": ("5", "5", "5"), "k": ("5", "5", "5"),
    "l": ("8", "8", "8"),
    "mn": ("66", "66", "66"), "m": ("6", "6", "6"),
    "nm": ("66", "66", "66"), "n": ("6", "6", "6"),
    "p": ("7", "7", "7"), "pf": ("7", "7", "7"), "ph": ("7", "7", "7"),
    "q": ("5", "5", "5"),
    "rz": ("94|4", "94|4", "94|4"), "rs": ("94|4", "94|4", "94|4"),
    "r": ("9", "9", "9"),
    "schtsch": ("2", "4", "4"), "schtsh": ("2", "4", "4"),
    "schtch": ("2", "4", "4"),
    "sch": ("4", "4", "4"),
    "shtch": ("2", "4", "4"), "shch": ("2", "4", "4"), "shtsh": ("2", "4", "4"),
    "sht": ("2", "43", "43"), "scht": ("2", "43", "43"), "schd": ("2", "43", "43"),
    "sh": ("4", "4", "4"),
    "stch": ("2", "4", "4"), "stsch": ("2", "4", "4"), "sc": ("2", "4", "4"),
    "strz": ("2", "4", "4"), "strs": ("2", "4", "4"), "stsh": ("2", "4", "4"),
    "st": ("2", "43", "43"),
    "szcz": ("2", "4", "4"), "szcs": ("2", "4", "4"),
    "szt": ("2", "43", "43"), "shd": ("2", "43", "43"),
    "szd": ("2", "43", "43"), "sd": ("2", "43", "43"),
    "sz": ("4", "4", "4"), "s": ("4", "4", "4"),
    "tch": ("4", "4", "4"), "ttch": ("4", "4", "4"), "ttsch": ("4", "4", "4"),
    "th": ("3", "3", "3"),
    "trz": ("4", "4", "4"), "trs": ("4", "4", "4"),
    "tsch": ("4", "4", "4"), "tsh": ("4", "4", "4"),
    "ts": ("4", "4", "4"), "tts": ("4", "4", "4"),
    "ttsz": ("4", "4", "4"), "tc": ("4", "4", "4"),
    "tz": ("4", "4", "4"), "ttz": ("4", "4", "4"),
    "tzs": ("4", "4", "4"), "tsz": ("4", "4", "4"),
    "t": ("3", "3", "3"),
    "v": ("7", "7", "7"), "w": ("7", "7", "7"),
    "x": ("5", "54", "54"),
    "zdz": ("2", "4", "4"), "zdzh": ("2", "4", "4"), "zhdzh": ("2", "4", "4"),
    "zd": ("2", "43", "43"), "zhd": ("2", "43", "43"),
    "zh": ("4", "4", "4"), "zs": ("4", "4", "4"),
    "zsch": ("4", "4", "4"), "zsh": ("4", "4", "4"),
    "z": ("4", "4", "4"),
}

# index rules by first letter, longest pattern first
_DM_RULES: dict[str, list[tuple[str, tuple[str, str, str]]]] = {}
for _pat, _codes in _DM_RULES_RAW.items():
    _DM_RULES.setdefault(_pat[0], []).append((_pat, _codes))
for _lst in _DM_RULES.values():
    _lst.sort(key=lambda pc: -len(pc[0]))

_DM_VOWEL_SET = set("aeiouy")
_DM_MAX = 6


def daitch_mokotoff(value: str) -> list[str]:
    """All branch codes (6 digits, 0-padded), in branch-creation order
    with duplicates collapsed keep-first — the order the reference filter
    emits (its encoder joins the branch set with '|')."""
    s = re.sub(r"[^a-z]", "", value.lower())
    # branches: list of (digits_so_far, last_replacement)
    branches: list[tuple[str, str | None]] = [("", None)]
    last_char = ""
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        rules = _DM_RULES.get(ch)
        if rules is None:
            last_char = ch
            i += 1
            continue
        for pat, (at_start, before_vowel, other) in rules:
            if s.startswith(pat, i):
                if last_char == "":
                    ctx = at_start
                elif i + len(pat) < n and s[i + len(pat)] in _DM_VOWEL_SET:
                    ctx = before_vowel
                else:
                    ctx = other
                replacements = ctx.split("|")
                force = (last_char == "m" and ch == "n") or (
                    last_char == "n" and ch == "m"
                )
                nxt: list[tuple[str, str | None]] = []
                for digits, last_rep in branches:
                    for rep in replacements:
                        append = last_rep is None or force or not (
                            last_rep.endswith(rep) and rep != ""
                        )
                        d = digits
                        if append and len(d) < _DM_MAX:
                            d = (d + rep)[:_DM_MAX]
                        nxt.append((d, rep))
                # collapse duplicate branch states keep-first
                seen: set[tuple[str, str | None]] = set()
                branches = []
                for b in nxt:
                    if b not in seen:
                        seen.add(b)
                        branches.append(b)
                i += len(pat)
                break
        else:  # pragma: no cover — every letter has at least a 1-char rule
            i += 1
        last_char = ch
    out: list[str] = []
    seen_codes: set[str] = set()
    for digits, _ in branches:
        code = (digits + "000000")[:_DM_MAX]
        if code not in seen_codes:
            seen_codes.add(code)
            out.append(code)
    return out


# --------------------------------------------------------------------------
# token-stream semantics of the three reference filters
# --------------------------------------------------------------------------

def _encode_or_none(encoder, value: str) -> str | None:
    """PhoneticFilter's guard: empty / equal / raising encoders pass the
    original token through (PhoneticFilter.java:63-70)."""
    try:
        code = encoder(value)
    except Exception:
        return None
    if code and code != value:
        return code
    return None


def phonetic_tokens(terms, positions, encoder, inject: bool):
    """PhoneticFilter over a (terms, positions) stream. ``inject=True``
    emits the code first, then the original at the same position (the
    reference emits the phonetic alternative first, PhoneticFilter.java:82);
    ``inject=False`` replaces."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        code = _encode_or_none(encoder, t) if t else None
        if code is None:
            out_t.append(t)
            out_p.append(int(p))
        elif inject:
            out_t.extend([code, t])
            out_p.extend([int(p), int(p)])
        else:
            out_t.append(code)
            out_p.append(int(p))
    return out_t, out_p


def double_metaphone_tokens(terms, positions, max_code_len: int = 4,
                            inject: bool = False):
    """DoubleMetaphoneFilter: primary + (when different) alternate codes;
    injecting keeps the original FIRST (DoubleMetaphoneFilter.java:61-89),
    all extra tokens overlap at the source position."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        primary = double_metaphone(t, max_code_len=max_code_len) if t else ""
        alt = double_metaphone(t, alternate=True, max_code_len=max_code_len) if t else ""
        emitted: list[str] = []
        if inject:
            emitted.append(t)
        if primary and primary != t:
            emitted.append(primary)
            if alt and alt != primary:
                emitted.append(alt)
        if not emitted:
            emitted.append(t)
        out_t.extend(emitted)
        out_p.extend([int(p)] * len(emitted))
    return out_t, out_p


def daitch_mokotoff_tokens(terms, positions, inject: bool = False):
    """DaitchMokotoffSoundexFilter: every branch code; injecting keeps the
    original first (DaitchMokotoffSoundexFilter.java:64-89)."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        codes = daitch_mokotoff(t) if t else []
        emitted = ([t] if inject else []) + codes
        if not emitted:
            emitted = [t]
        out_t.extend(emitted)
        out_p.extend([int(p)] * len(emitted))
    return out_t, out_p


def phonetic_replace(encoder):
    """1:1 filter for FilteredAnalyzer chains: PhoneticFilter with
    ``inject=False`` over a single-code encoder."""

    def _apply(term: str) -> str:
        code = _encode_or_none(encoder, term)
        return term if code is None else code

    return _apply
