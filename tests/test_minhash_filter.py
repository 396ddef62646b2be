"""MinHashFilter — replays the reference's TestMinHashFilter vectors
(``analysis/common/src/test/.../minhash/TestMinHashFilter.java``):
murmur3_x64_128 64-bit pairs (testIntHash/testStringHash), the exact
char-encoded min-hash tokens for single and multi hash counts
(testTokenStreamSingleInput/testTokenStream1), ordering, and the
rotation fix-up + bucket-count invariants."""

from lucene_spark.analysis.minhash import min_hash_tokens, murmur3_x64_128

WOOF5 = "woof woof woof woof woof"
PUFF5 = "woof woof woof woof puff"
# char codepoints of the expected emissions (transcribed from the Java
# literals; the degenerate-string fixture decodes to exactly these)
TOK_WOOF_H1 = [8449, 54077, 64133, 32857, 8605, 41409, 54897, 26479]
TOK_PUFF_H1 = [36347, 63457, 43013, 56843, 52284, 34231, 57934, 42302]
TOK_WOOF_H2_0 = [0, 0, 8449, 54077, 64133, 32857, 8605, 41409]
TOK_WOOF_H2_1 = [0, 1, 16887, 58164, 39536, 14926, 6529, 17276]


def _ords(tokens):
    return [[ord(c) for c in t] for t in tokens]


def test_int_hash():
    assert murmur3_x64_128((0).to_bytes(4, "big")) == (
        -3485513579396041028, 6383328099726337777,
    )


def test_string_hash():
    assert murmur3_x64_128(WOOF5.encode("utf-16-le")) == (
        7638079586852243959, 4378804943379391304,
    )


def test_token_stream_single_input():
    assert _ords(min_hash_tokens([WOOF5], 1, 1, 100, False)) == [TOK_WOOF_H1]
    assert _ords(min_hash_tokens([WOOF5], 2, 1, 1, False)) == [
        TOK_WOOF_H2_0, TOK_WOOF_H2_1,
    ]


def test_token_stream_two_shingles():
    got = _ords(min_hash_tokens([WOOF5, PUFF5], 1, 1, 100, False))
    # ascending (val2, val1) unsigned order within the bucket
    assert got == [TOK_WOOF_H1, TOK_PUFF_H1]


def test_hash_set_size_caps_per_bucket():
    toks = [f"shingle number {i} of this stream" for i in range(50)]
    assert len(min_hash_tokens(toks, 1, 1, 5, False)) == 5
    assert len(min_hash_tokens(toks, 1, 1, 100, False)) == 50


def test_rotation_fills_empty_buckets():
    # 1 shingle, 512 buckets: rotation copies the single hash everywhere
    full = min_hash_tokens([WOOF5], 1, 512, 1, True)
    assert len(full) == 512
    assert len(set(full)) == 1
    # without rotation only the hash's own bucket emits
    assert len(min_hash_tokens([WOOF5], 1, 512, 1, False)) == 1


def test_factory_defaults_dedupe_exact_duplicates():
    # identical shingles hash identically: one min per bucket
    toks = [WOOF5] * 10
    assert min_hash_tokens(toks, 1, 1, 100, False) == min_hash_tokens(
        [WOOF5], 1, 1, 100, False
    )
