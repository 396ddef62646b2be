"""Full ShingleFilter semantics (shingle/ShingleFilter.java:72) — the
reference's bigram/trigram tables, internal-hole and trailing-hole
fixtures (TestShingleFilter.java BI_GRAM_TOKENS[_WITH_HOLES],
testTwoTrailingHoles[TriShingle], without-unigram variants) replay
through `shingle_stream`; the analyzer integration pins the filler-mode
expansion."""

from lucene_spark.analysis.filters import FilteredAnalyzer, shingle_stream


def test_bi_gram_tokens():
    t, p = shingle_stream(
        "please divide this sentence into shingles".split(), range(6)
    )
    assert list(zip(t, p)) == [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide this", 1),
        ("this", 2), ("this sentence", 2),
        ("sentence", 3), ("sentence into", 3),
        ("into", 4), ("into shingles", 4),
        ("shingles", 5),
    ]


def test_bi_gram_tokens_with_holes():
    t, p = shingle_stream(
        ["please", "divide", "sentence", "shingles"], [0, 1, 3, 5]
    )
    assert list(zip(t, p)) == [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide _", 1),
        ("_ sentence", 2),
        ("sentence", 3), ("sentence _", 3),
        ("_ shingles", 4),
        ("shingles", 5),
    ]


def test_trailing_holes():
    t, p = shingle_stream(["purple", "wizard"], [0, 1], 2, 2, trailing_holes=2)
    assert list(zip(t, p)) == [
        ("purple", 0), ("purple wizard", 0), ("wizard", 1), ("wizard _", 1),
    ]
    t, p = shingle_stream(["purple", "wizard"], [0, 1], 2, 3, trailing_holes=2)
    assert list(zip(t, p)) == [
        ("purple", 0), ("purple wizard", 0), ("purple wizard _", 0),
        ("wizard", 1), ("wizard _", 1), ("wizard _ _", 1),
    ]


def test_tri_gram_and_no_unigrams():
    t, _ = shingle_stream("a b c d".split(), range(4), 2, 3,
                          output_unigrams=False)
    assert t == ["a b", "a b c", "b c", "b c d", "c d"]
    t, _ = shingle_stream(["solo"], [0], 2, 2, output_unigrams=False)
    assert t == []  # no shingles, no unigrams (outputUnigramsIfNoShingles=false)
    t, _ = shingle_stream(["x", "y"], [0, 1], 2, 2, separator="+",
                          output_unigrams=False)
    assert t == ["x+y"]


def test_analyzer_filler_mode_bridges_stopword_holes():
    from lucene_spark.analysis.tokenizer import StandardAnalyzer

    base = StandardAnalyzer(stopwords=frozenset({"of"}))
    a = FilteredAnalyzer(base=base, shingle_size=2, shingle_filler="_")
    t, p, n = a.term_position_arrays("wizard of oz")
    got = set(zip(t, [int(x) for x in p]))
    assert got == {
        ("wizard", 0), ("wizard _", 0), ("_ oz", 1), ("oz", 2),
    }
    assert n == 2  # shingles are overlays; stopword removed from length
