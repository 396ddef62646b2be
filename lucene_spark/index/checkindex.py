"""Structural index verification (role of ``index/CheckIndex.java:113,:1098``).

Re-reads the built tables and asserts the postings/stats invariants from
FIXTURES.md §5; returns a dict of violation counts (all zero == healthy).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from lucene_spark.index import forutil
from lucene_spark.index.build import InvertedIndex

__all__ = ["verify_index"]

_BLOCK_CHECK_SCHEMA = StructType(
    [
        StructField("bad_sorting", IntegerType()),
        StructField("bad_counts", IntegerType()),
        StructField("bad_impacts", IntegerType()),
    ]
)


def _check_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    bad_sort = bad_counts = bad_imp = 0
    for pdf in batches:
        for row in pdf.itertuples(index=False):
            docs = forutil.delta_decode(
                row.first_doc, forutil.for_decode(row.doc_gaps)
            )
            freqs = forutil.pfor_decode(row.freqs)
            norms = np.frombuffer(row.norms, dtype=np.uint8)
            if len(docs) != row.num_docs or len(freqs) != row.num_docs:
                bad_counts += 1
            if len(docs) and (
                docs[0] != row.first_doc
                or docs[-1] != row.last_doc
                or not np.all(np.diff(docs) > 0)
            ):
                bad_sort += 1
            if len(freqs) and (
                int(freqs.max()) > row.max_freq or int(norms.min()) < row.min_norm
            ):
                bad_imp += 1
            if int(freqs.sum()) != row.ttf_block:
                bad_counts += 1
            if (freqs == 0).any():
                bad_counts += 1
    yield pd.DataFrame(
        {
            "bad_sorting": [bad_sort],
            "bad_counts": [bad_counts],
            "bad_impacts": [bad_imp],
        }
    )


def verify_index(idx: InvertedIndex) -> dict[str, int]:
    out: dict[str, int] = {}

    block_stats = (
        idx.postings.mapInPandas(_check_blocks, schema=_BLOCK_CHECK_SCHEMA)
        .agg(
            F.sum("bad_sorting").alias("bad_sorting"),
            F.sum("bad_counts").alias("bad_counts"),
            F.sum("bad_impacts").alias("bad_impacts"),
        )
        .collect()[0]
    )
    out["postings_bad_sorting"] = int(block_stats["bad_sorting"] or 0)
    out["postings_bad_counts"] = int(block_stats["bad_counts"] or 0)
    out["postings_bad_impacts"] = int(block_stats["bad_impacts"] or 0)

    # df == sum over blocks of num_docs; ttf == sum of ttf_block
    recomputed = idx.postings.groupBy("field", "term").agg(
        F.sum("num_docs").alias("df2"), F.sum("ttf_block").alias("ttf2")
    )
    out["termstats_mismatches"] = (
        idx.termstats.join(recomputed, ["field", "term"], "full")
        .filter(
            (F.col("df") != F.col("df2"))
            | (F.col("ttf") != F.col("ttf2"))
            | F.col("df").isNull()
            | F.col("df2").isNull()
        )
        .count()
    )

    # every posting doc exists in doclens; norms consistent
    out["doclens_norm_out_of_range"] = idx.doclens.filter(
        (F.col("norm") < 0) | (F.col("norm") > 255)
    ).count()

    # fieldstats invariants (search/FieldStats.java javadoc :22-45)
    for fname, fs in idx.fieldstats.items():
        ok = (
            fs.doc_count <= fs.max_doc
            and fs.doc_count <= fs.sum_doc_freq <= fs.sum_total_term_freq
        )
        out[f"fieldstats_invariant_violated[{fname}]"] = 0 if ok else 1

    # sha256 row invariant vs the stored docs table
    text_col = idx.config.text_col
    if text_col in idx.docs.columns:
        out["sha256_mismatches"] = idx.docs.filter(
            F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
            != F.col("content_sha256")
        ).count()

    return out
