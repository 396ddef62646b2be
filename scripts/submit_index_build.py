"""spark-submit entry point: checkpointed, resumable index build + smoke query.

The north-rule deployment shape (BASELINE.json: "runs via spark-submit
--py-files at 10^12-file scale"):

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> --py-files dist/lucene_spark.zip \\
        scripts/submit_index_build.py \\
        --input /path/to/corpus_parquet --index-dir /path/to/index \\
        [--docs-per-segment 1048576] [--query "merge AND flush"]

No ``master``/``local[...]`` is hard-coded: spark-submit owns cluster
topology, executor count, and memory. The script only declares the plan.

What one run does:

1. ``build_segmented`` — one segment per ``docs_per_segment`` id range,
   each committed to the ``_checkpoint`` table (segments_N analog) with
   its content-sha256 XOR fingerprint, doc/block counts and wall time.
   **Resume = rerun the same command**: completed segments are skipped,
   so a killed 10^12-file build restarts from the last committed segment
   (`lucene_spark/index/segments.py build_segmented`).
2. Per-row invariant: re-hash the persisted docs copy and count rows
   where ``sha2(content, 256)`` differs from the ``content_sha256``
   carried through the build — must be 0 (BASELINE.md "Row invariant").
3. Optional ``--query``: parse with the classic QueryParser and run a
   BM25 top-10 against the freshly loaded segments (end-to-end smoke of
   the index just written).

Prints ONE JSON line: segment/doc/block counts, build wall, sha
mismatches, and smoke-query hits.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet dir, input-hint schema")
    ap.add_argument("--index-dir", required=True, help="index output dir")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--field-name", default="content")
    ap.add_argument("--docs-per-segment", type=int, default=1 << 20)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--skip-sha-check", action="store_true")
    ap.add_argument("--query", default=None, help="classic-syntax smoke query")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("lucene-spark-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolve from --py-files lucene_spark.zip on driver + executors
    from lucene_spark.index.build import IndexConfig
    from lucene_spark.index.segments import build_segmented, list_segments

    corpus = spark.read.parquet(args.input)
    cfg = IndexConfig(
        text_col=args.text_col,
        field_name=args.field_name,
        order_by=None,  # arrival-order ids: no global sort shuffle
        docs_per_segment=args.docs_per_segment,
        with_positions=not args.no_positions,
    )
    already_done = len(list_segments(spark, args.index_dir))
    t0 = time.time()
    idx = build_segmented(spark, corpus, cfg, args.index_dir)
    build_sec = time.time() - t0
    segs = list_segments(spark, args.index_dir)
    n_docs = sum(s["n_docs"] for s in segs)

    sha_mismatches = None
    if not args.skip_sha_check:
        docs = spark.read.parquet(f"{args.index_dir}/docs")
        sha_mismatches = docs.filter(
            F.sha2(F.coalesce(F.col(args.text_col), F.lit("")), 256)
            != F.col("content_sha256")
        ).count()

    smoke = None
    if args.query:
        from lucene_spark.search.queryparser import QueryParser
        from lucene_spark.search.searcher import IndexSearcher

        q = QueryParser(args.field_name).parse(args.query)
        hits = IndexSearcher(idx).search(q, k=10).collect()
        smoke = {
            "query": args.query,
            "n_hits": len(hits),
            "top_doc": int(hits[0]["doc_id"]) if hits else None,
            "top_score": float(hits[0]["score"]) if hits else None,
        }

    out = {
        "metric": "submit_index_build",
        "index_dir": args.index_dir,
        "n_segments": len(segs),
        "segments_resumed": already_done,
        "segments_built": len(segs) - already_done,
        "n_docs": n_docs,
        "n_blocks": sum(s["n_blocks"] for s in segs),
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1) if build_sec > 0 else None,
        "sha256_mismatches": sha_mismatches,
        "smoke": smoke,
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if not sha_mismatches else 1


if __name__ == "__main__":
    sys.exit(main())
