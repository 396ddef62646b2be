"""Stateful streaming dedup: first-seen-wins across micro-batches via
applyInPandasWithState (streaming/stream_dedup.py). Two file drops into a
watched directory = two micro-batches; cross-batch duplicates must be
suppressed by the state store, within-batch duplicates collapse to the
min doc id."""

import time

from pyspark.sql import functions as F

from lucene_spark.streaming.stream_dedup import first_seen_stream


def _rows(spark, name):
    return {
        tuple(r) for r in spark.sql(f"SELECT content_sha256, doc_id FROM {name}").collect()
    }


def test_first_seen_across_batches(spark, tmp_path):
    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "drop").mkdir()

    schema = "doc_id long, text string"
    batch1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    )
    batch1.write.mode("append").parquet(drop)

    stream = spark.readStream.schema(batch1.schema).parquet(drop)
    out = first_seen_stream(stream, text_col="text", id_col="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = _rows(spark, "dedup_sink")
        # batch 1: 'alpha' collapses to doc 1, 'beta' stays
        assert {d for _, d in got1} == {1, 2}
        sha_by_doc = {d: s for s, d in got1}

        # batch 2: one duplicate of 'alpha' (suppressed), one new text,
        # and a within-batch duplicate pair of 'gamma' (collapses to 4)
        batch2 = spark.createDataFrame(
            [(10, "alpha"), (5, "gamma"), (4, "gamma"), (6, "delta")], schema
        )
        batch2.write.mode("append").parquet(drop)
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            if len(_rows(spark, "dedup_sink")) >= 4:
                break
            time.sleep(0.5)
        got2 = _rows(spark, "dedup_sink")
        docs = {d for _, d in got2}
        assert docs == {1, 2, 4, 6}, docs  # 10 ('alpha' again) suppressed
        # the suppressed duplicate's hash is the one batch 1 emitted
        assert sha_by_doc[1] in {s for s, _ in got2}
    finally:
        q.stop()


def test_output_matches_batch_dedup(spark, tmp_path):
    """On a single batch the streaming operator equals the batch
    exact-dedup keep-min rule."""
    from lucene_spark.pipeline import dedup

    drop = str(tmp_path / "drop2")
    ckpt = str(tmp_path / "ckpt2")
    (tmp_path / "drop2").mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    docs.select("doc_id", "text").write.mode("append").parquet(drop)

    stream = spark.readStream.schema("doc_id long, text string").parquet(drop)
    q = (
        first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink2")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = _rows(spark, "dedup_sink2")
    finally:
        q.stop()
    want = {
        (r.content_sha256, r.min_doc_id)
        for r in dedup.exact_duplicate_groups(docs, text_col="text").collect()
    }
    assert got == want
