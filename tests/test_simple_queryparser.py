"""SimpleQueryParser fixtures, mirroring the reference's
queryparser/simple/TestSimpleQueryParser.java (helper parses with
default operator MUST, single field, weight 1.0)."""

from lucene_spark.search import query as Q
from lucene_spark.search.simple_queryparser import (
    ALL_OPERATORS,
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    WHITESPACE_OPERATOR,
    SimpleQueryParser,
)

F = "field"


def parse(text, flags=ALL_OPERATORS):
    p = SimpleQueryParser(field=F, flags=flags, default_operator=Q.Occur.MUST)
    return p.parse(text)


def term(t):
    return Q.TermQuery(F, t)


def bq(*occur_query_pairs, msm=0):
    return Q.BooleanQuery(
        tuple(Q.BooleanClause(q, o) for o, q in occur_query_pairs), msm
    )


MUST, SHOULD, MUST_NOT = Q.Occur.MUST, Q.Occur.SHOULD, Q.Occur.MUST_NOT


def test_term():
    assert parse("foobar") == term("foobar")


def test_fuzzy():
    expected = Q.FuzzyQuery(F, "foobar", max_edits=2)
    assert parse("foobar~2") == expected
    assert parse("foobar~") == expected
    # unparsable fuzziness -> plain term (TestSimpleQueryParser.java:91-92)
    assert parse("foobar~a") == term("foobar")
    assert parse("foobar~1a") == term("foobar")
    # fuzziness above the Levenshtein cap clamps to 2 (:100-102)
    assert parse("foo~3 bar") == bq(
        (MUST, Q.FuzzyQuery(F, "foo", max_edits=2)), (MUST, term("bar"))
    )


def test_phrase_and_slop():
    phrase = Q.PhraseQuery(F, ("foo", "bar"))
    assert parse('"foo bar"') == phrase
    assert parse('"foo bar"~2') == Q.PhraseQuery(F, ("foo", "bar"), slop=2)
    assert parse('"foo bar"~10') == Q.PhraseQuery(F, ("foo", "bar"), slop=10)
    assert parse('"foo bar"~') == phrase
    assert parse('"foo bar"~a') == phrase
    assert parse('"foo bar"~1a') == phrase
    assert parse('"foo bar"~-1') == phrase
    assert parse('"foo bar"~12 baz') == bq(
        (MUST, Q.PhraseQuery(F, ("foo", "bar"), slop=12)), (MUST, term("baz"))
    )


def test_prefix():
    assert parse("foobar*") == Q.PrefixQuery(F, "foobar")
    # inner '*' chars stay; only the trailing one is the operator (:220)
    assert parse("st*ar*") == Q.PrefixQuery(F, "st*ar")
    # escaped '*' is literal; the final unescaped one is the operator (:227)
    assert parse("st*ar\\\\**") == Q.PrefixQuery(F, "st*ar\\*")


def test_and_or_not():
    and_expected = bq((MUST, term("foo")), (MUST, term("bar")))
    assert parse("foo+bar") == and_expected
    assert parse("foo bar") == and_expected  # default operator MUST
    or_expected = bq((SHOULD, term("foo")), (SHOULD, term("bar")))
    assert parse("foo|bar") == or_expected
    assert parse("foo||bar") == or_expected
    assert parse('"foo bar"+"star wars"') == bq(
        (MUST, Q.PhraseQuery(F, ("foo", "bar"))),
        (MUST, Q.PhraseQuery(F, ("star", "wars"))),
    )
    neg = bq((MUST_NOT, term("foo")), (SHOULD, Q.MatchAllDocsQuery()))
    assert parse("-foo") == neg
    assert parse("-(foo)") == neg
    assert parse("---foo") == neg


def test_default_operator_should():
    p = SimpleQueryParser(field=F)  # default SHOULD, like the reference
    assert p.parse("foo bar") == bq((SHOULD, term("foo")), (SHOULD, term("bar")))


def test_garbage_term():
    expected = term("star")
    for text in [
        "star", "star\n", "star\r", "star\t", "star(", "star)", 'star"',
        "\t \r\n\nstar   \n \r \t ", '- + "" - star \\',
    ]:
        assert parse(text) == expected, repr(text)


def test_garbage_empty():
    for text in [
        "", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "', '(" "|" ")',
        '" " " "', '(" " " ")',
    ]:
        assert parse(text) == Q.MatchNoDocsQuery(), repr(text)


def test_garbage_and_or_not():
    and_expected = bq((MUST, term("star")), (MUST, term("wars")))
    for text in [
        "star wars", "star+wars", "     star     wars   ",
        "     star +    wars   ", "  |     star + + |   wars   ",
        "  |     star + + |   wars   \\",
    ]:
        assert parse(text) == and_expected, repr(text)
    or_expected = bq((SHOULD, term("star")), (SHOULD, term("wars")))
    for text in [
        "star|wars", "     star |    wars   ", "  |     star | + |   wars   ",
        "  +     star | + +   wars   \\",
    ]:
        assert parse(text) == or_expected, repr(text)
    neg = bq((MUST_NOT, term("star")), (SHOULD, Q.MatchAllDocsQuery()))
    for text in ["-star", "---star", "- -star -"]:
        assert parse(text) == neg, repr(text)


def test_garbage_phrase_and_subquery():
    phrase = Q.PhraseQuery(F, ("star", "wars"))
    for text in [
        '"star wars"', '"star wars\\ "', '"" | "star wars"',
        '          "star wars"        ""\\',
    ]:
        assert parse(text) == phrase, repr(text)
    for text in [
        "(star)", "(star))", "((star)", "     -()(star)        \n\n\r     ",
        "| + - ( + - |      star    \n      ) \n",
    ]:
        assert parse(text) == term("star"), repr(text)


def test_compound_and_complex():
    assert parse("star wars empire") == bq(
        (MUST, term("star")), (MUST, term("wars")), (MUST, term("empire"))
    )
    assert parse("star|wars|empire") == bq(
        (SHOULD, term("star")), (SHOULD, term("wars")), (SHOULD, term("empire"))
    )
    # operator change nests the left tree (right-to-left precedence)
    inner = bq((SHOULD, term("star")), (SHOULD, term("wars")))
    assert parse("star|wars empire") == bq((MUST, inner), (MUST, term("empire")))
    inner = bq((MUST, term("star")), (MUST, term("wars")))
    assert parse("star wars | empire") == bq(
        (SHOULD, inner), (SHOULD, term("empire"))
    )
    assert parse("star + | wars | ----empire +") == bq(
        (SHOULD, inner), (SHOULD, term("empire"))
    )
    # testComplex03
    inner2 = bq((MUST, term("star")), (MUST, term("wars")))
    inner1 = bq((SHOULD, inner2), (SHOULD, term("empire")), (SHOULD, term("strikes")))
    assert parse("star wars | empire | strikes back") == bq(
        (MUST, inner1), (MUST, term("back"))
    )
    # testComplex04
    left = bq((MUST, term("star")), (MUST, term("wars")))
    right = bq((MUST, term("strikes")), (MUST, term("back")))
    assert parse("(star wars) | empire | (strikes back)") == bq(
        (SHOULD, left), (SHOULD, term("empire")), (SHOULD, right)
    )
    # testComplex05 — negation inside nested groups, empty () ignored
    inner4 = bq((MUST_NOT, term("jarjar")), (SHOULD, Q.MatchAllDocsQuery()))
    inner3 = bq((MUST, term("strikes")), (MUST, term("back")), (MUST, inner4))
    inner2 = bq((SHOULD, term("empire")), (SHOULD, inner3))
    expected = bq((SHOULD, left), (SHOULD, inner2))
    assert parse("(star wars) | (empire | (strikes back -jarjar))") == expected
    assert (
        parse("(star + wars) |(empire | (strikes + back -jarjar) () )") == expected
    )


def test_match_all_and_flags():
    assert parse("*") == Q.MatchAllDocsQuery()
    assert parse(" * ") == Q.MatchAllDocsQuery()
    # with operators disabled, the raw text is one analyzed token stream
    only_ws = WHITESPACE_OPERATOR
    assert parse("foo|bar", flags=only_ws) == bq(
        (MUST, term("foo")), (MUST, term("bar"))
    )  # '|' not an operator: 'foo|bar' analyzed -> two terms, one token
    assert parse("-foo", flags=only_ws) == term("foo")  # '-' literal, analyzed away
    assert parse("foo*", flags=only_ws | AND_OPERATOR | OR_OPERATOR) == term("foo")


def test_weights_multi_field():
    p = SimpleQueryParser(weights={"title": 2.0, "body": 1.0})
    q = p.parse("star")
    assert q == Q.BooleanQuery.of(
        should=(Q.BoostQuery(Q.TermQuery("title", "star"), 2.0), Q.TermQuery("body", "star"))
    )
    # prefix expands per field too
    q = p.parse("sta*")
    assert q == Q.BooleanQuery.of(
        should=(Q.BoostQuery(Q.PrefixQuery("title", "sta"), 2.0), Q.PrefixQuery("body", "sta"))
    )


def test_simple_parser_percolates_through_memory_index():
    """Parsed human queries score a real document via the driver-local
    one-doc index (memory/MemoryIndex.java role) — end-to-end without
    Spark: negation wrapper, prefix, fuzzy, sloppy-near all execute."""
    from lucene_spark.streaming.memory_index import MemoryIndex

    mi = MemoryIndex().add_field(
        "text", "spark merges segments while the writer flushes postings"
    )
    p = SimpleQueryParser(field="text")
    assert mi.search(p.parse("spark + post*")) > 0
    assert mi.search(p.parse("-spark")) == 0.0
    # negation of an absent term matches through the MatchAll wrapper
    assert mi.search(p.parse("-absent")) > 0
    assert mi.search(p.parse('"writer flushes"')) > 0
    assert mi.search(p.parse('"writer flushes"~0')) > 0
    # transposed phrase needs slop 2 (SloppyPhraseMatcher edit distance)
    assert mi.search(p.parse('"flushes writer"~2')) > 0
    assert mi.search(p.parse('"flushes writer"~1')) == 0.0
    assert mi.search(p.parse("mergis~1")) > 0
    assert mi.search(p.parse("absent | spark")) > 0
    assert mi.search(p.parse("absent + spark")) == 0.0
