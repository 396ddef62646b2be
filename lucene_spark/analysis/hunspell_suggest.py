"""Hunspell suggestion generation ("did you mean" over .aff/.dic).

Re-expression of the reference's two-phase suggester
(``hunspell/Suggester.java:38``, ``ModifyingSuggester.java:30``,
``GeneratingSuggester.java:33``, ``Suggestion.java:27``):

1. MODIFICATION — try case variants, REP/MAP table replacements,
   keyboard-neighbor and TRY-alphabet edits, swaps/moves/removals/
   insertions and dictionary-backed splits of the misspelled word; every
   candidate is verified through the spell checker.
2. ENUMERATION — when modification finds nothing "good", scan the
   dictionary for roots with high character-n-gram overlap, re-apply the
   roots' own affix rules shaped like the misspelled word's ends, and
   rank guesses by the reference's exact similarity formula (LCS, common
   prefix, positional matches, weighted/unweighted n-grams, MAXDIFF
   factor).

The suggestion speller rejects NOSUGGEST/SUBSTANDARD roots and runs with
the same compound/case machinery as spell checking. Replayed against
every ``.sug`` fixture in the reference test tree
(``tests/test_hunspell.py``).
"""

from __future__ import annotations

from lucene_spark.analysis.hunspell import (
    Hunspell,
    HunspellDictionary,
    _HIDDEN,
    _LOWER,
    _MIXED,
    _TITLE,
    _UPPER,
    _word_case,
)

__all__ = ["Suggester", "suggest_batch"]


def suggest_batch(
    words_df,
    dictionary: HunspellDictionary,
    word_col: str = "word",
    max_suggestions: int = 5,
):
    """Distributed did-you-mean over a COLUMN of words (e.g. a query log):
    the parsed dictionary broadcasts inside a ``mapInPandas`` closure and
    each executor runs the full two-phase suggester locally — the Spark
    shape for batch-correcting millions of misspellings, no driver loop.

    Returns (word, is_correct, suggestions array<string>).
    """

    def run(batches):
        import pandas as pd

        sg = Suggester(dictionary)  # one per task, cloudpickled dictionary
        for pdf in batches:
            words = pdf[word_col].astype(str)
            correct = [sg.speller.spell(w) for w in words]
            sugs = [
                [] if ok else sg.suggest(w)[:max_suggestions]
                for w, ok in zip(words, correct)
            ]
            yield pd.DataFrame(
                {"word": words, "is_correct": correct, "suggestions": sugs}
            )

    return words_df.mapInPandas(
        run, "word string, is_correct boolean, suggestions array<string>"
    )

_MAX_CHAR_DISTANCE = 4
_MAX_ROOTS = 100
_MAX_WORDS = 100
_MAX_GUESSES = 200
_MAX_ROOT_LENGTH_DIFF = 4


class _SuggestionSpeller(Hunspell):
    """Hunspell with the suggester's acceptsStem filter: roots flagged
    NOSUGGEST or SUBSTANDARD never anchor a suggestion."""

    def _accepts_stem_entry(self, entry) -> bool:
        d = self.d
        return not (d.has_flag(entry, d.nosuggest) or d.has_flag(entry, d.substandard))


class _Suggestion:
    """(raw candidate, case-adjusted output forms) — Suggestion.java:27."""

    __slots__ = ("raw", "result")

    def __init__(self, raw: str, misspelled: str, original_case, speller):
        self.raw = raw
        out = []
        adjusted = self._adjust_case(raw, misspelled, original_case)
        ok = " " in adjusted or speller.spell(adjusted)
        out.append(self._clean(speller, adjusted if ok else raw))
        if original_case == _UPPER and speller.d.checksharps and "ß" in raw:
            out.append(self._clean(speller, raw))
        self.result = tuple(out)

    @staticmethod
    def _adjust_case(candidate, misspelled, original_case):
        if original_case == _UPPER:
            return candidate.upper()
        if misspelled[:1].isupper():
            up = candidate[:1].upper()
            return (up if len(up) == 1 else candidate[:1]) + candidate[1:]
        return candidate

    @staticmethod
    def _clean(speller, s):
        if not speller.d.oconv:
            return s
        from lucene_spark.analysis.hunspell import _apply_conversions

        return _apply_conversions(s, speller.d.oconv)

    def key(self):
        return (self.raw, self.result)


class _OrderedSuggestions:
    """Insertion-ordered set of _Suggestion keyed like the reference's
    LinkedHashSet (raw + result equality)."""

    def __init__(self):
        self._d: dict = {}

    def add(self, s: _Suggestion) -> bool:
        k = s.key()
        if k in self._d:
            return False
        self._d[k] = s
        return True

    def __iter__(self):
        return iter(self._d.values())

    def __len__(self):
        return len(self._d)

    def replace_all(self, items):
        self._d = {}
        for s in items:
            self.add(s)


class Suggester:
    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary
        self.speller = _SuggestionSpeller(dictionary)

    # ------------------------------------------------------------- entry

    def suggest(self, word: str) -> list[str]:
        d = self.d
        if len(word) >= 100:
            return []
        if d.may_need_input_cleaning():
            word = d.clean_input(word)
        suggestions = _OrderedSuggestions()

        word_case = _word_case(word) if word else _MIXED
        if d.forceucase is not None and word_case == _LOWER:
            title = d._title_case(word)
            if self.speller.spell(title):
                return [title]

        has_good = _Modifying(self, suggestions, word, word_case).run()

        if not has_good and d.max_ngram_suggestions > 0:
            for raw in self._ngram_suggest(d._fold_all(word), word_case, suggestions):
                suggestions.add(_Suggestion(raw, word, word_case, self.speller))

        if "-" in word and not any("-" in s.raw for s in suggestions):
            for raw in self._modify_chunks_between_dashes(word):
                suggestions.add(_Suggestion(raw, word, word_case, self.speller))

        out: list[str] = []
        for s in suggestions:
            for r in s.result:
                if r not in out:
                    out.append(r)
        return out

    def _modify_chunks_between_dashes(self, word: str) -> list[str]:
        result = []
        chunk_start = 0
        while chunk_start < len(word):
            chunk_end = word.find("-", chunk_start)
            if chunk_end < 0:
                chunk_end = len(word)
            if chunk_end > chunk_start:
                chunk = word[chunk_start:chunk_end]
                if not self.speller.spell(chunk):
                    for chunk_sug in self.suggest(chunk):
                        replaced = word[:chunk_start] + chunk_sug + word[chunk_end:]
                        if self.speller.spell(replaced):
                            result.append(replaced)
            chunk_start = chunk_end + 1
        return result

    # --------------------------------------------- enumeration (ngram) phase

    def _suggestible_entries(self, min_len: int, max_len: int):
        d = self.d
        bad = {f for f in (d.nosuggest, d.forbiddenword, d.onlyincompound, d.substandard) if f}
        for root, entries in d.words.items():
            if not (min_len <= len(root) <= max_len):
                continue
            keep = [e for e in entries if _HIDDEN not in e[0] and not (e[0] & bad)]
            if keep:
                yield root, keep

    def _ngram_suggest(self, word: str, original_case, prev) -> list[str]:
        roots = self._find_similar_roots(word, original_case)
        expanded = self._expand_roots(word, roots)
        by_similarity = self._rank_by_similarity(word, expanded)
        return self._most_relevant(by_similarity, prev)

    def _find_similar_roots(self, word: str, original_case):
        d = self.d
        ignore_title = original_case == _LOWER and d.language != "de"
        scored: list[tuple[int, str, tuple]] = []  # (score, root, entry)
        import heapq

        # heap of (score, neg-ordered word) keeping the best MAX_ROOTS;
        # mirror the reference's tie rule (higher score, then smaller word)
        heap: list[tuple[int, _NegStr, str, tuple]] = []
        for root, entries in self._suggestible_entries(
            max(1, len(word) - _MAX_ROOT_LENGTH_DIFF),
            len(word) + _MAX_ROOT_LENGTH_DIFF,
        ):
            lower = d._fold_all(root)
            if ignore_title and _word_case(root) == _TITLE:
                continue
            sc = _ngram_score(3, word, lower, weighted=False)
            if sc == 0:
                continue
            sc += _common_prefix(word, root) - max((len(root) - len(word)) - 2, 0)
            for entry in entries:
                item = (sc, _NegStr(root), root, entry)
                if len(heap) < _MAX_ROOTS:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        scored = [(sc, root, entry) for sc, _, root, entry in heap]
        scored.sort(key=lambda t: (-t[0], t[1]))
        return scored

    def _expand_roots(self, misspelled: str, roots):
        thresh = _calc_threshold(misspelled)
        d = self.d
        seen = set()
        expanded: list[tuple[int, str]] = []
        for sc_root, root, entry in roots:
            for guess in self._expand_root(root, entry, misspelled):
                lower = d._fold_all(guess)
                sc = _any_mismatch_ngram(
                    len(misspelled), misspelled, lower, weighted=False
                ) + _common_prefix(misspelled, guess)
                if sc > thresh and (sc, guess) not in seen:
                    seen.add((sc, guess))
                    expanded.append((sc, guess))
        expanded.sort(key=lambda t: (-t[0], t[1]))
        return expanded[:_MAX_GUESSES]

    def _expand_root(self, root: str, entry, misspelled: str) -> list[str]:
        d = self.d
        flags = entry[0]
        result: dict[str, None] = {}
        cross_products: list[str] = []

        if not d.has_flag(entry, d.needaffix):
            result[root] = None

        def compatible(rule):
            if rule.flag not in flags:
                return False
            cont = rule.cont
            return not (
                (d.needaffix is not None and d.needaffix in cont)
                or (d.circumfix is not None and d.circumfix in cont)
                or (d.onlyincompound is not None and d.onlyincompound in cont)
            )

        # suffixes whose append matches the misspelled word's tail,
        # shortest append first (the reference's FST walk order)
        for i in range(len(misspelled), -1, -1):
            append = misspelled[i:]
            for rule in d.suffixes.get(append, []):
                strip_len = len(rule.strip)
                base = root[: len(root) - strip_len] if strip_len else root
                if strip_len > len(root):
                    continue
                if not compatible(rule) or not rule.cond(base):
                    continue
                with_suffix = base + append
                result[with_suffix] = None
                if rule.cross:
                    cross_products.append(with_suffix)

        # cross-product prefixes over the suffixed forms
        for i in range(0, len(misspelled) + 1):
            append = misspelled[:i]
            for rule in d.prefixes.get(append, []):
                if rule.flag not in flags or not rule.cross:
                    continue
                strip_len = len(rule.strip)
                for suffixed in cross_products:
                    if strip_len > len(suffixed):
                        continue
                    stem = suffixed[strip_len:]
                    if rule.cond(stem):
                        result[append + stem] = None

        # pure prefixes
        for i in range(0, len(misspelled) + 1):
            append = misspelled[:i]
            for rule in d.prefixes.get(append, []):
                strip_len = len(rule.strip)
                if strip_len > len(root):
                    continue
                stem = root[strip_len:]
                if compatible(rule) and rule.cond(stem):
                    result[append + stem] = None

        return list(result)[:_MAX_WORDS]

    def _rank_by_similarity(self, word: str, expanded):
        d = self.d
        fact = (10.0 - d.max_diff) / 5.0
        ranked: list[tuple[int, str]] = []
        seen = set()
        for sc0, guess in expanded:
            lower = d._fold_all(guess)
            if lower == word:
                if (sc0 + 2000, guess) not in seen:
                    ranked.append((sc0 + 2000, guess))
                break
            re_ = _any_mismatch_ngram(2, word, lower, True) + _any_mismatch_ngram(
                2, lower, word, True
            )
            score = (
                2 * _lcs(word, lower)
                - abs(len(word) - len(lower))
                + _common_char_position_score(word, lower)
                + _common_prefix(word, lower)
                + _any_mismatch_ngram(4, word, lower, False)
                + re_
                + (-1000 if re_ < (len(word) + len(lower)) * fact else 0)
            )
            if (score, guess) not in seen:
                seen.add((score, guess))
                ranked.append((score, guess))
        ranked.sort(key=lambda t: (-t[0], t[1]))
        return ranked

    def _most_relevant(self, by_similarity, prev) -> list[str]:
        d = self.d
        result: list[str] = []
        has_excellent = False
        prev_raws = [s.raw for s in prev]
        for score, guess in by_similarity:
            if score > 1000:
                has_excellent = True
            elif has_excellent:
                break
            bad = score < -100
            if bad and (result or d.only_max_diff):
                break
            if (
                all(raw not in guess for raw in prev_raws)
                and all(r not in guess for r in result)
                and self.speller._check_word(guess, None)
            ):
                result.append(guess)
                if len(result) >= d.max_ngram_suggestions:
                    break
            if bad:
                break
        return result


class _NegStr(str):
    """String with inverted ordering (for 'higher score then SMALLER
    word wins' min-heap entries)."""

    def __lt__(self, other):
        return str.__gt__(self, other)

    def __gt__(self, other):
        return str.__lt__(self, other)


class _Modifying:
    """ModifyingSuggester.java:30 — candidate enumeration order preserved."""

    def __init__(self, suggester: Suggester, result, misspelled: str, word_case):
        self.sg = suggester
        self.d = suggester.d
        self.speller = suggester.speller
        self.result = result
        self.misspelled = misspelled
        self.word_case = word_case
        self.tried: set[str] = set()

    def run(self) -> bool:
        d = self.d
        misspelled = self.misspelled
        low = d._fold_all(misspelled) if self.word_case != _LOWER else misspelled
        if self.word_case in (_UPPER, _MIXED):
            self._try(low)
        has_good = self._variations(misspelled)
        if self.word_case == _TITLE:
            has_good |= self._variations(low)
        elif self.word_case == _UPPER:
            has_good |= self._variations(low)
            has_good |= self._variations(d._title_case(misspelled))
        elif self.word_case == _MIXED:
            dot = misspelled.find(".")
            if 0 < dot < len(misspelled) - 1:
                after = misspelled[dot + 1 :]
                if _word_case(after) == _TITLE:
                    self.result.add(
                        self._suggestion(misspelled[: dot + 1] + " " + after)
                    )
            capitalized = misspelled[0].isupper()
            if capitalized:
                has_good |= self._variations(
                    d._case_fold(misspelled[0]) + misspelled[1:]
                )
            has_good |= self._variations(low)
            if capitalized:
                has_good |= self._variations(d._title_case(low))
            reordered = []
            for cand in self.result:
                changed = self._capitalize_after_space(cand.raw)
                if changed is None:
                    reordered.append(cand)
                else:
                    reordered.insert(0, changed)
            self.result.replace_all(reordered)
        return has_good

    def _suggestion(self, candidate: str) -> _Suggestion:
        return _Suggestion(candidate, self.misspelled, self.word_case, self.speller)

    def _capitalize_after_space(self, candidate: str):
        space = candidate.find(" ")
        tail = len(candidate) - space - 1
        start = len(self.misspelled) - tail
        tail_matches = start >= 0 and self.misspelled[start:] == candidate[space + 1 :]
        if space > 0 and not tail_matches:
            up = candidate[space + 1].upper()
            return self._suggestion(
                candidate[: space + 1] + up + candidate[space + 2 :]
            )
        return None

    # ----------------------------------------------------------- variations

    def _variations(self, word: str) -> bool:
        has_good = self._try(word.upper())

        rep = self._try_rep(word)
        if rep == 2:
            return True
        has_good |= rep != 0

        if self.d.map_table:
            self._enumerate_map(word, "", 0)

        self._swap_chars(word)
        self._long_swap(word)
        self._neighbor_keys(word)
        self._remove_char(word)
        self._add_char(word)
        self._move_char(word)
        self._replace_char(word)
        self._two_duplicate_chars(word)

        good_split = self._dictionary_split(word)
        if good_split:
            copy = list(self.result)
            self.result.replace_all(good_split)
            if has_good:
                for s in copy:
                    self.result.add(s)
            has_good = True

        if not has_good and self.d.enable_split_suggestions:
            self._try_splitting(word)
        return has_good

    def _try_rep(self, word: str) -> int:
        """0 = none, 1 = normal, 2 = best (GradedSuggestions)."""
        has_best = False
        before = len(self.result)
        for entry in self.d.rep_table:
            for candidate in entry.substitute(word):
                candidate = candidate.strip()
                if self._try(candidate):
                    has_best = True
                    continue
                if " " in candidate and all(
                    self._check_simple(p) for p in candidate.split(" ")
                ):
                    self.result.add(self._suggestion(candidate))
        if has_best:
            return 2
        return 1 if len(self.result) > before else 0

    def _enumerate_map(self, word: str, accumulated: str, offset: int) -> None:
        if offset == len(word):
            self._try(accumulated)
            return
        for entries in self.d.map_table:
            for entry in entries:
                if word.startswith(entry, offset):
                    for replacement in entries:
                        if replacement != entry:
                            self._enumerate_map(
                                word,
                                accumulated + replacement,
                                offset + len(entry),
                            )
        self._enumerate_map(word, accumulated + word[offset], offset + 1)

    def _check_simple(self, part: str) -> bool:
        return self.speller._check_simple_word(part, None) is True

    def _swap_chars(self, word: str) -> None:
        n = len(word)
        for i in range(n - 1):
            self._try(word[:i] + word[i + 1] + word[i] + word[i + 2 :])
        if n in (4, 5):
            cand = list(word)
            cand[0], cand[1] = word[1], word[0]
            cand[n - 1], cand[n - 2] = word[n - 2], word[n - 1]
            self._try("".join(cand))
            if n == 5:
                cand[0] = word[0]
                cand[1], cand[2] = word[2], word[1]
                self._try("".join(cand))

    def _neighbor_keys(self, word: str) -> None:
        for i, c in enumerate(word):
            up = c.upper()
            if up != c and len(up) == 1:
                self._try(word[:i] + up + word[i + 1 :])
            for group in self.d.neighbor_key_groups:
                if c in group:
                    for g in group:
                        if g != c:
                            self._try(word[:i] + g + word[i + 1 :])

    def _long_swap(self, word: str) -> None:
        for i in range(len(word)):
            for j in range(i + 2, min(len(word), i + _MAX_CHAR_DISTANCE + 1)):
                self._try(
                    word[:i] + word[j] + word[i + 1 : j] + word[i] + word[j + 1 :]
                )

    def _remove_char(self, word: str) -> None:
        if len(word) == 1:
            return
        for i in range(len(word)):
            self._try(word[:i] + word[i + 1 :])

    def _add_char(self, word: str) -> None:
        for i in range(len(word) + 1):
            for c in self.d.try_chars:
                self._try(word[:i] + c + word[i:])

    def _move_char(self, word: str) -> None:
        for i in range(len(word)):
            prefix = word[:i]
            for j in range(i + 2, min(len(word), i + _MAX_CHAR_DISTANCE + 1)):
                self._try(prefix + word[i + 1 : j] + word[i] + word[j:])
                self._try(prefix + word[j] + word[i:j] + word[j + 1 :])
            if i < len(word) - 1:
                self._try(prefix + word[i + 1 :] + word[i])

    def _replace_char(self, word: str) -> None:
        for i in range(len(word)):
            for c in self.d.try_chars:
                if c != word[i]:
                    self._try(word[:i] + c + word[i + 1 :])

    def _two_duplicate_chars(self, word: str) -> None:
        dup_len = 0
        for i in range(2, len(word)):
            if word[i] == word[i - 2]:
                dup_len += 1
                if dup_len == 3 or (dup_len == 2 and i >= 4):
                    self._try(word[: i - 1] + word[i + 1 :])
                    dup_len = 0
            else:
                dup_len = 0

    def _dictionary_split(self, word: str) -> list[_Suggestion]:
        out = []
        for i in range(1, len(word) - 1):
            w1, w2 = word[:i], word[i:]
            spaced = w1 + " " + w2
            if self.speller._check_word(spaced, None):
                out.append(self._suggestion(spaced))
            if self._split_by_dash():
                dashed = w1 + "-" + w2
                if self.speller._check_word(dashed, None):
                    out.append(self._suggestion(dashed))
        return out

    def _try_splitting(self, word: str) -> None:
        for i in range(1, len(word)):
            w1, w2 = word[:i], word[i:]
            if self._check_simple(w1) and self._check_simple(w2):
                self.result.add(self._suggestion(w1 + " " + w2))
                if len(w1) > 1 and len(w2) > 1 and self._split_by_dash():
                    self.result.add(self._suggestion(w1 + "-" + w2))

    def _split_by_dash(self) -> bool:
        return "-" in self.d.try_chars or "a" in self.d.try_chars

    def _try(self, candidate: str) -> bool:
        if candidate in self.tried:
            return False
        self.tried.add(candidate)
        if self.speller._check_word(candidate, None):
            return self.result.add(self._suggestion(candidate))
        return False


# ---- similarity scoring (GeneratingSuggester.java:340-455) -----------------


def _common_prefix(s1: str, s2: str) -> int:
    i = 0
    limit = min(len(s1), len(s2))
    while i < limit and s1[i] == s2[i]:
        i += 1
    return i


def _index_of_substring(haystack: str, start: int, needle: str, npos: int, ln: int) -> int:
    sub = needle[npos : npos + ln]
    idx = haystack.find(sub, start)
    return idx


def _ngram_score(n: int, s1: str, s2: str, weighted: bool) -> int:
    l1 = len(s1)
    score = 0
    last_starts = [0] * l1
    for j in range(1, n + 1):
        ns = 0
        for i in range(0, l1 - j + 1):
            if last_starts[i] >= 0:
                pos = _index_of_substring(s2, last_starts[i], s1, i, j)
                last_starts[i] = pos
                if pos >= 0:
                    ns += 1
                    continue
            if weighted:
                ns -= 1
                if i == 0 or i == l1 - j:
                    ns -= 1
        score += ns
        if ns < 2 and not weighted:
            break
    return score


def _any_mismatch_ngram(n: int, s1: str, s2: str, weighted: bool) -> int:
    return _ngram_score(n, s1, s2, weighted) - max(abs(len(s2) - len(s1)) - 2, 0)


def _calc_threshold(word: str) -> int:
    thresh = 0
    for sp in range(1, 4):
        mw = list(word)
        for k in range(sp, len(word), 4):
            mw[k] = "*"
        thresh += _any_mismatch_ngram(len(word), word, "".join(mw), False)
    return thresh // 3 - 1 if thresh >= 0 else -(-thresh // 3) - 1


def _lcs(s1: str, s2: str) -> int:
    lengths = [0] * (len(s2) + 1)
    for i in range(1, len(s1) + 1):
        prev = 0
        for j in range(1, len(s2) + 1):
            cur = lengths[j]
            lengths[j] = (
                prev + 1 if s1[i - 1] == s2[j - 1] else max(cur, lengths[j - 1])
            )
            prev = cur
    return lengths[len(s2)]


def _common_char_position_score(s1: str, s2: str) -> int:
    num = 0
    diff_pos1 = diff_pos2 = -1
    diff = 0
    i = 0
    while i < len(s1) and i < len(s2):
        if s1[i] == s2[i]:
            num += 1
        else:
            if diff == 0:
                diff_pos1 = i
            elif diff == 1:
                diff_pos2 = i
            diff += 1
        i += 1
    common = 1 if num > 0 else 0
    if (
        diff == 2
        and i == len(s1)
        and i == len(s2)
        and s1[diff_pos1] == s2[diff_pos2]
        and s1[diff_pos2] == s2[diff_pos1]
    ):
        return common + 10
    return common
