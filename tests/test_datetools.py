"""DateTools goldens transcribed from the reference's TestDateTools.java
(stringToDate/timeToString/round expectations, GMT), plus the Column
twin's equivalence and its pushdown plan shape."""

import datetime as dt

import pytest

from lucene_spark.analysis.datetools import (
    Resolution as R,
    encode_col,
    round_time,
    string_to_time,
    time_to_string,
)


def _iso(ms):
    d = dt.datetime.fromtimestamp(ms / 1000, tz=dt.timezone.utc)
    return d.strftime("%Y-%m-%d %H:%M:%S") + f":{ms % 1000:03d}"


_BASE = int(
    dt.datetime(2004, 2, 3, 22, 8, 56, 333000, tzinfo=dt.timezone.utc).timestamp()
    * 1000
)


def test_string_to_date_goldens():
    assert _iso(string_to_time("2004")) == "2004-01-01 00:00:00:000"
    assert _iso(string_to_time("20040705")) == "2004-07-05 00:00:00:000"
    assert _iso(string_to_time("200407050910")) == "2004-07-05 09:10:00:000"
    assert _iso(string_to_time("20040705091055990")) == "2004-07-05 09:10:55:990"
    assert string_to_time("197001010000") == 0


@pytest.mark.parametrize("bad", ["97", "200401011235009999", "aaaa"])
def test_invalid_date_strings_raise(bad):
    with pytest.raises(ValueError):
        string_to_time(bad)


def test_time_to_string_goldens():
    want = {
        R.YEAR: "2004",
        R.MONTH: "200402",
        R.DAY: "20040203",
        R.HOUR: "2004020322",
        R.MINUTE: "200402032208",
        R.SECOND: "20040203220856",
        R.MILLISECOND: "20040203220856333",
    }
    for res, s in want.items():
        assert time_to_string(_BASE, res) == s
    neg = int(
        dt.datetime(1961, 3, 5, 23, 9, 51, 444000, tzinfo=dt.timezone.utc).timestamp()
        * 1000
    )
    assert time_to_string(neg, R.MILLISECOND) == "19610305230951444"
    assert time_to_string(neg, R.HOUR) == "1961030523"
    assert time_to_string(0, R.MILLISECOND) == "19700101000000000"


def test_round_goldens():
    assert _iso(round_time(_BASE, R.YEAR)) == "2004-01-01 00:00:00:000"
    assert _iso(round_time(_BASE, R.MONTH)) == "2004-02-01 00:00:00:000"
    assert _iso(round_time(_BASE, R.DAY)) == "2004-02-03 00:00:00:000"
    assert _iso(round_time(_BASE, R.HOUR)) == "2004-02-03 22:00:00:000"
    assert _iso(round_time(_BASE, R.MINUTE)) == "2004-02-03 22:08:00:000"
    assert _iso(round_time(_BASE, R.SECOND)) == "2004-02-03 22:08:56:000"


def test_column_twin_matches_python(spark):
    rows = [
        (dt.datetime(2004, 2, 3, 22, 8, 56, 333000),),
        (dt.datetime(1999, 12, 31, 23, 59, 59, 999000),),
        (dt.datetime(1970, 1, 1, 0, 0, 0, 0),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz")
    for res in R:
        got = [r[0] for r in df.select(encode_col("ts", res)).collect()]
        want = [
            time_to_string(
                int(t[0].replace(tzinfo=dt.timezone.utc).timestamp() * 1000), res
            )
            for t in rows
        ]
        assert got == want, res


def test_range_filter_is_codegen(spark):
    # the encoded range predicate must stay JVM-side (no Python eval)
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    enc = encode_col(F.col("ts"), R.DAY)
    plan = (
        ev.select(enc.alias("day"))
        .filter((F.col("day") >= "20240105") & (F.col("day") <= "20240112"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
