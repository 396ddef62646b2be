"""Dictionary-segmentation seam (the kuromoji/nori ROLE,
``analysis/kuromoji/.../JapaneseTokenizer.java:96``): greedy longest-match
over an external word dictionary, pluggable as IndexConfig.analyzer. The
CJK-bigram fallback path is pinned unchanged by tests/test_filters.py's
CJK suite."""

import pytest

from lucene_spark.analysis.segmenter import DictionarySegmenter

JA_WORDS = frozenset(
    {"東京", "大学", "東京大学", "日本", "日本語", "勉強", "する",
     "学生", "関西国際空港", "空港"}
)


def seg():
    return DictionarySegmenter(words=JA_WORDS)


def test_longest_match_wins():
    # 東京大学 (4 chars, in dict) beats 東京 + 大学
    assert seg().terms("東京大学") == ["東京大学"]
    assert seg().terms("関西国際空港") == ["関西国際空港"]


def test_unknown_chars_fall_back_to_singles():
    assert seg().terms("私は日本語") == ["私", "は", "日本語"]


def test_mixed_script_delegates_to_standard():
    assert seg().terms("Spark入門 guide 2024") == [
        "spark", "入門"[0], "入門"[1], "guide", "2024"
    ]


def test_positions_sequential_and_offsets_span_source():
    toks = seg().tokens("日本語abc東京")
    assert [(t.term, t.position) for t in toks] == [
        ("日本語", 0), ("abc", 1), ("東京", 2)
    ]
    text = "日本語abc東京"
    for t in toks:
        assert text[t.start_offset : t.end_offset] == t.term


def test_stopwords_leave_position_gaps():
    s = DictionarySegmenter(words=JA_WORDS, stopwords=frozenset({"する"}))
    toks = s.tokens("勉強する日本語")
    assert [(t.term, t.position) for t in toks] == [("勉強", 0), ("日本語", 2)]


def test_ja_corpus_indexes_and_phrase_matches(spark):
    """Verdict item 7 done-criterion: a JA fixture corpus indexes through
    the segmenter and a (dictionary-word) phrase query matches — and the
    result is rank-identical to the pure-Python oracle under the SAME
    analyzer."""
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher
    from tests.oracle import OracleIndex

    texts = [
        "私は東京大学で日本語を勉強する",
        "東京大学の学生です",
        "日本語の勉強は楽しい",
        "関西国際空港から東京へ",
        "nothing japanese here",
    ]
    an = seg()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    cfg = IndexConfig(doc_id_col="doc_id", docs_per_segment=4, analyzer=an)
    idx = build_index(spark, docs, cfg)
    s = IndexSearcher(idx)
    oracle = OracleIndex({i: t for i, t in enumerate(texts)}, analyzer=an)

    # term query on a segmented WORD (not a single ideograph)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in s.search(Q.TermQuery("content", "東京大学"), k=5).collect()
    ]
    assert got == oracle.top_k(oracle.term_scores("東京大学"), 5)
    assert sorted(d for d, _ in got) == [0, 1]

    # phrase over two consecutive dictionary words
    phrase = Q.PhraseQuery("content", ("日本語", "を"))
    hits = {int(r["doc_id"]) for r in s.search(phrase, k=5).collect()}
    assert hits == {0}


def test_from_dataframe_builds_dictionary(spark):
    df = spark.createDataFrame([("東京",), ("大学",)], "word string")
    s = DictionarySegmenter.from_dataframe(df)
    assert s.terms("東京大学") == ["東京", "大学"]  # no 4-char entry here


# ---------------------------------------------------------------- lattice


def lat():
    from lucene_spark.analysis.segmenter import LatticeSegmenter

    # a costed mini-lexicon around the classic longest-match trap
    # 日本人参: greedy grabs 日本人 and strands 参; the cost model
    # (compound nouns priced above their parts, like a real lexicon)
    # decodes 日本 + 人参
    return LatticeSegmenter(
        entries={
            "日本": (0, 1, 1),
            "人参": (0, 1, 1),
            "日本人": (100, 1, 1),
            "参": (100, 1, 1),
            "政権": (0, 1, 1),
            "参政権": (50, 1, 1),
        }
    )


def test_viterbi_beats_greedy_on_compound_trap():
    assert lat().terms("日本人参") == ["日本", "人参"]
    assert DictionarySegmenter(words=frozenset(lat().entries)).terms(
        "日本人参"
    ) == ["日本人", "参"]


def test_viterbi_total_cost_not_local_choice():
    # 参政権(50) < 参(100)+政権(0)? no: 100 > 50, lattice takes the
    # single cheaper entry even though 政権 itself is free
    assert lat().terms("参政権") == ["参政権"]


def test_unknown_nodes_keep_every_position_reachable():
    assert lat().terms("私は日本") == ["私", "は", "日本"]


def test_connection_matrix_prices_adjacency():
    from lucene_spark.analysis.segmenter import LatticeSegmenter

    entries = {
        "東京": (10, 2, 2),
        "東": (10, 3, 3),
        "京都": (10, 4, 4),
        "都": (10, 5, 5),
    }
    # flat word costs: 東京+都 and 東+京都 tie at 20 until the
    # connection matrix penalizes the 東京->都 adjacency
    assert LatticeSegmenter(
        entries=entries, connections={(2, 5): 1000}
    ).terms("東京都") == ["東", "京都"]
    assert LatticeSegmenter(
        entries=entries, connections={(3, 4): 1000}
    ).terms("東京都") == ["東京", "都"]


def test_lattice_tie_break_is_deterministic():
    from lucene_spark.analysis.segmenter import LatticeSegmenter

    # exact tie between 東京+都 and 東+京都 -> longer LAST word wins
    entries = {
        "東京": (10, 1, 1),
        "東": (10, 1, 1),
        "京都": (10, 1, 1),
        "都": (10, 1, 1),
    }
    s = LatticeSegmenter(entries=entries)
    assert s.terms("東京都") == ["東", "京都"]


def test_lattice_offsets_and_mixed_script():
    toks = lat().tokens("spark 日本人参 join")
    assert [t.term for t in toks] == ["spark", "日本", "人参", "join"]
    text = "spark 日本人参 join"
    for t in toks:
        assert text[t.start_offset : t.end_offset] == t.term


def test_lattice_corpus_indexes_and_matches(spark):
    """The lattice analyzer is a drop-in IndexConfig.analyzer: the
    compound trap decodes cost-correctly in the INDEX, so the word-level
    term query matches and is rank-identical to the pure-Python oracle."""
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher
    from tests.oracle import OracleIndex

    texts = [
        "日本人参を食べる",
        "日本の政権",
        "参政権の話",
        "plain english row",
    ]
    an = lat()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    cfg = IndexConfig(doc_id_col="doc_id", docs_per_segment=4, analyzer=an)
    idx = build_index(spark, docs, cfg)
    s = IndexSearcher(idx)
    oracle = OracleIndex({i: t for i, t in enumerate(texts)}, analyzer=an)

    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in s.search(Q.TermQuery("content", "人参"), k=5).collect()
    ]
    assert got == oracle.top_k(oracle.term_scores("人参"), 5)
    assert [d for d, _ in got] == [0]


def test_lattice_from_dataframe(spark):
    from lucene_spark.analysis.segmenter import LatticeSegmenter

    df = spark.createDataFrame(
        [("日本", 0, 1, 1), ("人参", 0, 1, 1), ("日本人", 100, 1, 1), ("参", 100, 1, 1)],
        "word string, cost int, left_id int, right_id int",
    )
    s = LatticeSegmenter.from_dataframe(df)
    assert s.terms("日本人参") == ["日本", "人参"]


def test_lattice_path_is_globally_optimal_property():
    """Hypothesis pin: over random dictionaries/costs/texts, the Viterbi
    path's total cost equals the brute-force minimum over ALL
    segmentations (dictionary words + single-char unknown nodes)."""
    from hypothesis import given, settings, strategies as st

    from lucene_spark.analysis.segmenter import LatticeSegmenter

    ALPHA = "東京都大学"

    @st.composite
    def case(draw):
        words = draw(
            st.lists(
                st.text(ALPHA, min_size=1, max_size=3), min_size=1,
                max_size=6, unique=True,
            )
        )
        entries = {
            w: (draw(st.integers(0, 50)), draw(st.integers(0, 3)),
                draw(st.integers(0, 3)))
            for w in words
        }
        conn = {
            (draw(st.integers(0, 3)), draw(st.integers(0, 3))):
                draw(st.integers(0, 30))
            for _ in range(draw(st.integers(0, 4)))
        }
        text = draw(st.text(ALPHA, min_size=1, max_size=7))
        return entries, conn, text

    def brute_min(entries, conn, text, unk_cost, unk_id):
        best = {}

        def rec(i, rid):
            if i == len(text):
                return 0
            key = (i, rid)
            if key in best:
                return best[key]
            out = None
            cands = [
                (w, e[0], e[1], e[2])
                for w, e in entries.items()
                if text.startswith(w, i)
            ]
            if text[i] not in entries:
                cands.append((text[i], unk_cost, unk_id, unk_id))
            for w, wc, lid, rid2 in cands:
                c = wc + conn.get((rid, lid), 0) + rec(i + len(w), rid2)
                if out is None or c < out:
                    out = c
            best[key] = out
            return out

        return rec(0, unk_id)

    @settings(max_examples=150, deadline=None)
    @given(case())
    def check(c):
        entries, conn, text = c
        seg = LatticeSegmenter(entries=entries, connections=conn)
        got = seg._segment_run(text, 0)
        # recompute the emitted path's cost
        cost, rid = 0, seg.unknown_id
        for w, s, e in got:
            assert text[s:e] == w
            ent = seg.entries.get(w)
            wc, lid, rid2 = (
                ent if ent is not None
                else (seg.unknown_cost, seg.unknown_id, seg.unknown_id)
            )
            cost += wc + conn.get((rid, lid), 0)
            rid = rid2
        assert "".join(w for w, _, _ in got) == text
        assert cost == brute_min(
            entries, conn, text, seg.unknown_cost, seg.unknown_id
        )

    check()


def test_lattice_keeps_per_rid_states_not_per_position():
    """Regression: two zero-cost prefixes end at the same position with
    DIFFERENT right ids; collapsing to one state per position would keep
    the longer word and pay the 100-cost adjacency. The MeCab-style
    (position, right_id) state space finds the free path."""
    from lucene_spark.analysis.segmenter import LatticeSegmenter

    entries = {"東京": (0, 2, 2), "東": (0, 1, 1), "京": (0, 1, 1), "都": (0, 3, 3)}
    conn = {(2, 3): 100, (1, 3): 0, (1, 1): 0}
    s = LatticeSegmenter(entries=entries, connections=conn)
    assert s.terms("東京都") == ["東", "京", "都"]


def test_extra_scripts_thai_dictionary_break():
    """ICUTokenizer.java:49 breaks Thai/Lao/Khmer/Myanmar with a
    DICTIONARY, not rules — extra_scripts adds those ranges to the
    dictionary-segmented run class (both greedy and lattice modes)."""
    from lucene_spark.analysis.segmenter import LatticeSegmenter

    s = DictionarySegmenter(
        words=frozenset({"สวัสดี", "ครับ", "ภาษา", "ไทย"}), extra_scripts="฀-๿"
    )
    assert s.terms("สวัสดีครับ hello ภาษาไทย") == [
        "สวัสดี", "ครับ", "hello", "ภาษา", "ไทย"
    ]
    lat_s = LatticeSegmenter(
        entries={"สวัสดี": (0, 1, 1), "ครับ": (0, 1, 1)}, extra_scripts="฀-๿"
    )
    assert lat_s.terms("สวัสดีครับ") == ["สวัสดี", "ครับ"]
    # the default run class is untouched
    assert DictionarySegmenter(words=frozenset({"東京"})).terms("東京 ok") == [
        "東京", "ok"
    ]


def test_mecab_format_loaders():
    """A dictionary in the published MeCab CSV/matrix.def format drops
    straight into the lattice — the data path kuromoji/nori compile
    their dictionaries from."""
    from lucene_spark.analysis.segmenter import (
        LatticeSegmenter,
        parse_mecab_csv,
        parse_mecab_matrix,
    )

    csv = """
日本,1,1,0,名詞
人参,1,1,0,名詞
日本人,1,1,100,名詞
参,1,1,100,名詞
参,1,1,50,接尾
"""
    matrix = """2 2
0 0 0
1 1 10
"""
    entries = parse_mecab_csv(csv)
    assert entries["参"] == (50, 1, 1)  # cheapest homograph kept
    conn = parse_mecab_matrix(matrix)
    assert conn == {(1, 1): 10}
    s = LatticeSegmenter(entries=entries, connections=conn)
    assert s.terms("日本人参") == ["日本", "人参"]


def test_mecab_loader_errors():
    from lucene_spark.analysis.segmenter import (
        parse_mecab_csv,
        parse_mecab_matrix,
    )

    with pytest.raises(ValueError):
        parse_mecab_csv("word,1,2")  # too few columns
    with pytest.raises(ValueError):
        parse_mecab_matrix("1 1\n0 0")  # bad row arity


def test_unknown_katakana_runs_group_as_words():
    """The reference's UnknownDictionary behavior (kuromoji
    JapaneseTokenizer.java:96 + dict/CharacterDefinition.java): an unseen
    katakana loanword decodes as ONE token spanning the same-class run,
    not per-char confetti; the flat legacy fallback (no classes) still
    emits per-char nodes so existing decodes are unchanged."""
    from lucene_spark.analysis.segmenter import (
        LatticeSegmenter,
        UnknownCharClass,
    )

    entries = {"の": (100, 5, 5), "学生": (200, 3, 3), "大学": (150, 2, 2)}
    kat = UnknownCharClass(
        chars="゠-ヿㇰ-ㇿ", cost=3000, left_id=7, right_id=7, group=True
    )
    seg = LatticeSegmenter(entries=entries, unknown_classes={"KATAKANA": kat})
    assert seg.terms("大学のコンピュータ学生") == [
        "大学", "の", "コンピュータ", "学生",
    ]
    legacy = LatticeSegmenter(entries=entries)
    assert legacy.terms("大学のコンピュータ学生") == [
        "大学", "の", "コ", "ン", "ピ", "ュ", "ー", "タ", "学生",
    ]


def test_unknown_class_invoke_and_length_flags():
    """invoke=0 keeps unknowns out of dictionary positions; invoke=1
    lets a cheap grouped unknown beat an expensive dictionary split;
    length=n adds sub-run candidates so the lattice can stop a group
    where a good dictionary word resumes."""
    from lucene_spark.analysis.segmenter import (
        LatticeSegmenter,
        UnknownCharClass,
    )

    # dictionary knows ミルク only; invoke=1 + group lets the whole run win
    entries = {"ミルク": (8000, 1, 1)}
    kat_invoke = UnknownCharClass(
        chars="゠-ヿㇰ-ㇿ", cost=3000, invoke=True, group=True
    )
    seg = LatticeSegmenter(
        entries=entries, unknown_classes={"KATAKANA": kat_invoke}
    )
    assert seg.terms("ミルクセーキ") == ["ミルクセーキ"]
    # invoke=0: the dictionary word fires first, unknown covers the tail
    kat_quiet = UnknownCharClass(
        chars="゠-ヿㇰ-ㇿ", cost=3000, invoke=False, group=True
    )
    seg2 = LatticeSegmenter(
        entries=entries, unknown_classes={"KATAKANA": kat_quiet}
    )
    assert seg2.terms("ミルクセーキ") == ["ミルク", "セーキ"]
    # length candidates: group=False, length=2 decodes in <=2-char pieces
    kat_len = UnknownCharClass(
        chars="゠-ヿㇰ-ㇿ", cost=3000, invoke=False, group=False, length=2
    )
    seg3 = LatticeSegmenter(entries={}, unknown_classes={"KATAKANA": kat_len})
    out = seg3.terms("セーキ")
    assert out in (["セー", "キ"], ["セ", "ーキ"])
    assert all(len(t) <= 2 for t in out)


def test_char_def_unk_def_loaders_and_rank_identity(spark):
    """parse_mecab_char_def + apply_mecab_unk_csv read the published
    formats; a mixed known/unknown corpus indexed with the class-aware
    lattice is rank-identical between the Spark build and the pure-Python
    analyzer (same analyzer object both sides)."""
    from pyspark.sql import functions as F

    from lucene_spark.analysis.segmenter import (
        LatticeSegmenter,
        apply_mecab_unk_csv,
        parse_mecab_char_def,
        parse_mecab_csv,
    )
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher

    char_def = """
DEFAULT 0 1 0
KATAKANA 1 1 2
HIRAGANA 0 1 2
KANJI 0 0 0
0x30A1..0x30FA KATAKANA
0x30FC KATAKANA
0x3041..0x3096 HIRAGANA
0x4E00..0x9FFF KANJI
"""
    unk = """
KATAKANA,7,7,3000,名詞
KATAKANA,8,8,4500,名詞
HIRAGANA,5,5,6000,助詞
KANJI,9,9,11000,名詞
"""
    classes = apply_mecab_unk_csv(parse_mecab_char_def(char_def), unk)
    assert classes["KATAKANA"].cost == 3000  # cheapest row kept
    assert classes["KATAKANA"].invoke and classes["KATAKANA"].group
    assert "DEFAULT" not in classes  # no mapped ranges -> fallback tier
    entries = parse_mecab_csv("大学,2,2,150,名詞\n学生,3,3,200,名詞\nの,5,5,100,助詞")
    seg = LatticeSegmenter(entries=entries, unknown_classes=classes)
    texts = [
        "大学のコンピュータ学生",
        "ミルクセーキの大学",
        "データベース学生",
        "大学の学生",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = build_index(
        spark,
        docs,
        IndexConfig(
            text_col="text", field_name="text", doc_id_col="doc_id",
            analyzer=seg,
        ),
    )
    # the grouped unknown term is a real indexed term
    terms = {r["term"] for r in idx.termstats.select("term").collect()}
    assert "コンピュータ" in terms and "ミルクセーキ" in terms
    s = IndexSearcher(idx)
    hits = s.search(Q.TermQuery("text", "コンピュータ"), k=5).collect()
    assert [r["doc_id"] for r in hits] == [0]
    # rank identity vs the pure-Python side: same analyzer tokenizes the
    # corpus identically, so df/length stats agree
    py_lengths = {i: len(seg.terms(t)) for i, t in enumerate(texts)}
    spark_lengths = {
        r["doc_id"]: r["field_len"]
        for r in idx.docs.select(
            "doc_id", F.size(F.col("_terms")).alias("field_len")
        ).collect()
    } if "_terms" in idx.docs.columns else None
    if spark_lengths is not None:
        assert spark_lengths == py_lengths


def test_mecab_full_format_fixture_decode():
    """All four published MeCab file formats through the loaders at once
    (entries CSV with feature columns, matrix.def with a size header and
    negative costs, char.def categories + code-point mappings, unk.def
    with homograph rows), then a realistic decode: dictionary homograph
    resolution (東京大学 as one entry beats 東京+大学 via costs), particle
    attachment, and a grouped unknown katakana run in the same sentence."""
    import os

    from lucene_spark.analysis.segmenter import (
        LatticeSegmenter,
        apply_mecab_unk_csv,
        parse_mecab_char_def,
        parse_mecab_csv,
        parse_mecab_matrix,
    )

    d = os.path.join(os.path.dirname(__file__), "data", "mecab")

    def rd(name):
        return open(os.path.join(d, name), encoding="utf-8").read()

    entries = parse_mecab_csv(rd("entries.csv"))
    conn = parse_mecab_matrix(rd("matrix.def"))
    classes = apply_mecab_unk_csv(parse_mecab_char_def(rd("char.def")), rd("unk.def"))
    assert entries["東京大学"] == (6012, 1288, 1288)
    assert conn[(1285, 1299)] == -310  # negative connection costs survive
    assert classes["KATAKANA"].cost == 9461  # cheapest unk row kept
    seg = LatticeSegmenter(
        entries=entries, connections=conn, unknown_classes=classes
    )
    # 東京大学 (6012) beats 東京+大学 (3003+120+4052=7175)
    assert seg.terms("東京大学の学生") == ["東京大学", "の", "学生"]
    # unknown katakana loanword groups; known words still resolve around it
    assert seg.terms("コンピュータの学生") == ["コンピュータ", "の", "学生"]
    # homograph surface 人参 vs 日本人+参: composed word wins on cost
    assert "人参" in seg.terms("人参が")


def test_pos_stoptags_and_reading_form():
    """kuromoji's token-attribute filters on the lattice: POS
    stop-filtering (JapanesePartOfSpeechStopFilter — drops leave
    position holes like stopwords, multi-depth stoptag paths match as
    prefixes of the IPADIC POS hierarchy) and reading-form substitution
    (ReadingFormFilter — the reading column replaces the surface term,
    offsets still point at the surface text; unknowns keep surface)."""
    from lucene_spark.analysis.segmenter import (
        LatticeSegmenter,
        UnknownCharClass,
        parse_mecab_csv,
        parse_mecab_csv_features,
    )

    csv = (
        "東京,1288,1288,3003,名詞,固有名詞,地域,一般,*,*,東京,トウキョウ,トーキョー\n"
        "の,1299,1299,-642,助詞,連体化,*,*,*,*,の,ノ,ノ\n"
        "が,1301,1301,-840,助詞,格助詞,一般,*,*,*,が,ガ,ガ\n"
        "学生,1285,1285,4356,名詞,一般,*,*,*,*,学生,ガクセイ,ガクセイ\n"
    )
    entries = parse_mecab_csv(csv)
    feats = parse_mecab_csv_features(csv)
    assert feats["東京"][0] == "名詞" and feats["東京"][7] == "トウキョウ"

    # depth-1 stoptag drops every particle; holes preserved
    seg = LatticeSegmenter(
        entries=entries, features=feats, pos_stoptags=frozenset(["助詞"])
    )
    toks = seg.tokens("東京の学生が")
    assert [(t.term, t.position) for t in toks] == [("東京", 0), ("学生", 2)]
    # depth-2 stoptag drops only the case particle, keeps the adnominal
    seg2 = LatticeSegmenter(
        entries=entries, features=feats,
        pos_stoptags=frozenset(["助詞-格助詞"]),
    )
    assert [t.term for t in seg2.tokens("東京の学生が")] == ["東京", "の", "学生"]

    # reading form: IPADIC reading column (index 7)
    seg3 = LatticeSegmenter(entries=entries, features=feats, reading_index=7)
    assert [t.term for t in seg3.tokens("東京の学生")] == [
        "トウキョウ", "ノ", "ガクセイ",
    ]
    # offsets still span the SURFACE text
    t0 = seg3.tokens("東京の学生")[0]
    assert (t0.start_offset, t0.end_offset) == (0, 2)
    # unknown words carry no features: kept, surface form, never dropped
    kat = UnknownCharClass(chars="゠-ヿㇰ-ㇿ", cost=3000, group=True)
    seg4 = LatticeSegmenter(
        entries=entries, features=feats, reading_index=7,
        pos_stoptags=frozenset(["助詞"]),
        unknown_classes={"KATAKANA": kat},
    )
    assert [t.term for t in seg4.tokens("東京のコンピュータ")] == [
        "トウキョウ", "コンピュータ",
    ]
