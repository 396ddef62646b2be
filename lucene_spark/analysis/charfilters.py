"""Char filters — text-to-text transforms that run BEFORE tokenization
(the reference's ``analysis/charfilter`` package):

- ``html_strip`` — HTMLStripCharFilter.java (jflex): drop tags (block-
  level elements become newlines, inline elements vanish), remove
  script/style payloads, comments (incl. the ``<!---`` variants),
  declarations and processing instructions, decode character entities
  (named + decimal + hex, the full HTML table via ``html.unescape``);
  an ``escaped_tags`` set passes the listed elements through verbatim
  (the filter's escapedTags constructor arg). The reference's basic
  strip/entity/comment/reserved fixtures replay in
  ``tests/test_charfilters.py``.
- ``mapping_char_filter`` — MappingCharFilter.java: greedy longest-match
  string rewrites from a pairs table.
- ``pattern_replace_char_filter`` — PatternReplaceCharFilter.java: one
  regex replace over the whole text.

``FilteredAnalyzer(char_filters=...)`` applies them in order before the
tokenizer; character OFFSETS are not corrected (the reference carries an
offset-correction map; here offset-consuming paths raise — documented in
FilteredAnalyzer.term_position_offset_arrays).
"""

from __future__ import annotations

import html
import re

__all__ = ["html_strip", "mapping_char_filter", "pattern_replace_char_filter"]

# the HTML spec's block-level elements (the jflex grammar inserts \n for
# these and swallows inline elements)
_BLOCK_LEVEL = frozenset(
    """address article aside blockquote br canvas dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr li
    main nav noscript ol output p pre section table tfoot tr td th ul
    video audio""".split()
)

_SCRIPT_RE = re.compile(
    r"<script\b[^>]*>.*?(</script\s*>|\Z)", re.IGNORECASE | re.DOTALL
)
_STYLE_RE = re.compile(
    r"<style\b[^>]*>.*?(</style\s*>|\Z)", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?(-->|\Z)", re.DOTALL)
_DECL_RE = re.compile(r"<![^>]*>|<\?[^>]*\?>")
_TAG_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:_-]*)((\"[^\"]*\"|'[^']*'|[^>\"'])*)>")


def html_strip(text: str, escaped_tags=()) -> str:
    """HTMLStripCharFilter.java behavior over a whole string."""
    escaped = frozenset(t.lower() for t in escaped_tags)
    out = _SCRIPT_RE.sub("", text)
    out = _STYLE_RE.sub("", out)
    out = _COMMENT_RE.sub("", out)
    out = _DECL_RE.sub("", out)

    def _tag(m: re.Match) -> str:
        name = m.group(1).lower()
        if name in escaped:
            return m.group(0)
        return "\n" if name in _BLOCK_LEVEL else ""

    out = _TAG_RE.sub(_tag, out)
    return html.unescape(out)


def mapping_char_filter(pairs) -> "re callable":
    """MappingCharFilter.java: greedy longest-match rewrites. Returns a
    text->text callable for FilteredAnalyzer(char_filters=...)."""
    table = dict(pairs)
    rx = re.compile(
        "|".join(re.escape(k) for k in sorted(table, key=len, reverse=True))
    )

    def apply(text: str) -> str:
        return rx.sub(lambda m: table[m.group(0)], text)

    return apply


def pattern_replace_char_filter(pattern: str, replacement: str):
    """PatternReplaceCharFilter.java: one whole-text regex replace."""
    rx = re.compile(pattern)

    def apply(text: str) -> str:
        return rx.sub(replacement, text)

    return apply
