"""Char-filter stage — HTMLStripCharFilter basic strip / entity /
comment / reserved fixtures (charfilter/TestHTMLStripCharFilter.java:58,
:115, :121, :127, :321) plus MappingCharFilter greedy longest-match and
PatternReplaceCharFilter, end-to-end through FilteredAnalyzer."""

from lucene_spark.analysis.charfilters import (
    html_strip,
    mapping_char_filter,
    pattern_replace_char_filter,
)
from lucene_spark.analysis.filters import FilteredAnalyzer


def test_html_strip_basic():
    html = (
        '<div class="foo">this is some text</div> here is a <a href="#bar">link</a> and '
        'another <a href="http://lucene.apache.org/">link</a>. '
        "This is an entity: &amp; plus a &lt;.  Here is an &. <!-- is a comment -->"
    )
    gold = (
        "\nthis is some text\n here is a link and "
        "another link. "
        "This is an entity: & plus a <.  Here is an &. "
    )
    assert html_strip(html) == gold


def test_html_strip_entities():
    test = "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;"
    gold = "  <foo> Übermensch = Γ bar Γ"
    assert html_strip(test, escaped_tags={"reserved"}) == gold
    test2 = "&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;"
    gold2 = "  <junk/>   ! @ and ’"
    assert html_strip(test2, escaped_tags={"reserved"}) == gold2


def test_html_strip_reserved_tags_pass_through():
    test = 'aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff <other/>'
    out = html_strip(test, escaped_tags={"reserved"})
    assert '<reserved ccc="ddddd">' in out and "</reserved>" in out
    assert "<other/>" not in out


def test_html_strip_comments_and_script():
    assert html_strip("<!--- three dashes, still a valid comment ---> ") == " "
    assert html_strip("<! -- blah > ") == " "
    assert html_strip("<!--" + "x" * 500) == ""  # unterminated comment
    assert "alert" not in html_strip("a<script>alert('x')</script>b")
    assert "color" not in html_strip("a<style>.c{color:red}</style>b")


def test_mapping_and_pattern_char_filters():
    mcf = mapping_char_filter([("ph", "f"), ("qu", "k"), ("q", "x")])
    assert mcf("phquq") == "fkx"  # greedy longest match: qu before q
    prc = pattern_replace_char_filter(r"[0-9]+", "#")
    assert prc("a12b345") == "a#b#"


def test_char_filters_through_analyzer():
    a = FilteredAnalyzer(char_filters=(html_strip,))
    assert a.terms("<p>Hello <b>world</b></p><script>var x=1;</script>") == [
        "hello", "world",
    ]
    # norms see the post-strip token count
    assert a.emitted_count("<p>one two</p><script>junk junk junk</script>") == 2
    import pytest

    with pytest.raises(NotImplementedError):
        a.term_position_offset_arrays("<p>x</p>")
