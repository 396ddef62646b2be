"""Pin the static surface->term maps the kstem/snowball/beider-morse
oracle pairs embed: over the FULL corpus vocabulary (all sf dirs), the
engine's own analyzers must produce exactly the rewrites the oracle SQL
hard-codes — no more, no fewer. If the driver's testdata ever grows a
token these maps miss, these tests fail before the oracle pair can
silently diverge."""

import os

import duckdb
import pytest

from lucene_spark.entry_extras import (
    _KSTEM_LEXICON,
    _KSTEM_MAP,
    _SNOWBALL_EN_MAP,
)

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


def _vocab(sf_dir: str) -> list:
    con = duckdb.connect()
    rows = con.sql(
        "SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    return sorted(r[0] for r in rows)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kstem_oracle_map_is_the_full_vocab_image(sf_dir):
    from lucene_spark.analysis.kstem import KStem

    stem = KStem(lexicon=_KSTEM_LEXICON).stem
    image = {t: stem(t) for t in _vocab(sf_dir) if stem(t) != t}
    assert image == dict(_KSTEM_MAP)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_snowball_en_oracle_map_is_the_full_vocab_image(sf_dir):
    from lucene_spark.analysis.snowball import english_snowball_stem as stem

    image = {t: stem(t) for t in _vocab(sf_dir) if stem(t) != t}
    assert image == dict(_SNOWBALL_EN_MAP)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_beider_morse_faltar_preimage_is_exactly_filter(sf_dir):
    from lucene_spark.analysis.beidermorse import beider_morse_terms

    (code,) = beider_morse_terms("philter")
    preimage = {t for t in _vocab(sf_dir) if code in beider_morse_terms(t)}
    assert preimage == {"filter"}
    # and the misspelling really is single-code, so the query term is
    # deterministic
    assert code == "faltar"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_translit_oracle_map_is_the_full_vocab_image(sf_dir):
    from lucene_spark.analysis.translit import Transliterator
    from lucene_spark.entry_extras import _TRANSLIT_MAP, _TRANSLIT_RULES

    t = Transliterator(_TRANSLIT_RULES)
    image = {w: t(w) for w in _vocab(sf_dir) if t(w) != w}
    assert image == dict(_TRANSLIT_MAP)
