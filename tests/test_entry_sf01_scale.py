"""Scale cross-check for the round-4 driver pairs: the local replica
(tests/test_entry.py) runs every pair at the driver's sf0.01; this
module re-runs the NEWEST pairs at sf0.1 — 10x the rows — so any
scale-dependent oracle assumption (vocabulary images, winding margins,
the unrolled lattice-DP position bound, collation key ordering) breaks
loudly here before it can drift."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: the pairs whose oracles embed scale-sensitive artifacts
NAMES = [
    "geo3d_polygon_query",       # winding-margin robustness
    "cjk_lattice_min_cost",      # unrolled DP bound vs string length
    "collation_sort_query",      # numeric-key ordering over all nations
    "kstem_query",               # vocabulary-image map
    "snowball_en_query",         # vocabulary-image map
    "beider_morse_query",        # phoneme-preimage singleton
    "icu_transform_query",       # vocabulary-image map
    "text_repetition_scores",    # gram DP over longer docs
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.mark.parametrize("name", NAMES)
def test_new_pairs_match_oracle_at_sf01(spark, con, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    orows = sorted(tuple(r) for r in con.sql(entry_mod.oracle_sql()[name]).fetchall())
    assert len(srows) == len(orows)
    assert srows == orows
