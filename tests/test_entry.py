"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and compare against oracle_sql() through DuckDB —
row count, column names, and exact values (order-insensitive)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _norm_rows(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                # exact float compare (both sides contract to the same f32/f64)
                vals.append(v)
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    rel = con.sql(sql)
    duck_cols = [c.lower() for c in rel.columns]
    assert spark_cols == duck_cols or sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns differ spark={spark_cols} duck={duck_cols}"
    )
    srows = [tuple(r[c] for c in sdf.columns) for r in sdf.collect()]
    # reorder duck columns to spark order
    drows_raw = rel.fetchall()
    idx_map = [duck_cols.index(c) for c in spark_cols]
    drows = [tuple(r[i] for i in idx_map) for r in drows_raw]
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sn, dn = _norm_rows(srows), _norm_rows(drows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_queries_have_oracles_or_are_flagged():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o).issubset(set(q))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score", "lang", "source"}
