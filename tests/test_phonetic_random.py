"""Random blasts over the new analysis encoders — the reference runs
``checkRandomData`` over every filter (BaseTokenStreamTestCase); here
hypothesis drives arbitrary unicode through each encoder asserting the
structural invariants (no exceptions, output alphabets, determinism)."""

import string

from hypothesis import given, settings, strategies as st

from lucene_spark.analysis import phonetic as ph
from lucene_spark.analysis.minhash import min_hash_tokens, murmur3_x64_128
from lucene_spark.analysis.snowball import english_snowball_stem

any_text = st.text(max_size=24)
wordish = st.text(alphabet=string.ascii_letters, min_size=1, max_size=24)


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_encoders_never_raise_and_are_deterministic(s):
    for enc in (
        ph.soundex, ph.refined_soundex, ph.metaphone, ph.double_metaphone,
        ph.caverphone2, ph.nysiis, ph.cologne_phonetic,
    ):
        a, b = enc(s), enc(s)
        assert a == b
        assert isinstance(a, str)
    assert ph.daitch_mokotoff(s) == ph.daitch_mokotoff(s)


@settings(max_examples=300, deadline=None)
@given(wordish)
def test_encoder_alphabets(s):
    sx = ph.soundex(s)
    assert len(sx) == 4 and sx[0].isalpha() and all(
        c.isdigit() for c in sx[1:]
    )
    cv = ph.caverphone2(s)
    assert len(cv) == 10
    ny = ph.nysiis(s)
    assert len(ny) <= 6 and ny.isupper()
    for code in ph.daitch_mokotoff(s):
        assert len(code) == 6 and code.isdigit()
    dmp = ph.double_metaphone(s)
    dma = ph.double_metaphone(s, alternate=True)
    assert set(dmp) <= set("0AFHJKLMNPRSTX ")
    assert set(dma) <= set("0AFHJKLMNPRSTX ")


@settings(max_examples=300, deadline=None)
@given(wordish)
def test_snowball_invariants(s):
    out = english_snowball_stem(s.lower())
    assert english_snowball_stem(s.lower()) == out  # deterministic
    assert len(out) <= len(s) + 1  # only the e-restore can grow a stem


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=12))
def test_minhash_invariants(tokens):
    out = min_hash_tokens(tokens, 1, 1, 100, False)
    # one min-hash per DISTINCT input token, ascending unsigned order
    assert len(out) == len(set(tokens))
    assert out == sorted(out, key=lambda t: [ord(c) for c in t])
    # murmur determinism across str/bytes boundary
    for t in tokens[:3]:
        b = t.encode("utf-16-le")
        assert murmur3_x64_128(b) == murmur3_x64_128(bytes(b))
