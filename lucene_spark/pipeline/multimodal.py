"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; the heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched pandas UDFs via ``mapInPandas`` so
each Spark task streams record batches without materializing a partition.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this environment:
``decode_image`` raises ``NotImplementedError`` by design, and the tested
path uses ``fake_decode_meta`` — a deterministic md5-derived stand-in with
the REAL plumbing (schema, batching, partitioning) so swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "attach_payload",
    "decode_image",
    "fake_decode_meta",
    "image_meta",
    "sample_frames",
]


def attach_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload:binary, mime, n_bytes) — the multimodal column shape.

    The synthetic payload is the utf-8 content bytes; a real pipeline reads
    ``binaryFile`` sources or Iceberg binary columns into the same schema.
    """
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.length(payload).alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Real image decode — requires PIL, which is not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg; wire a real decoder here and "
        "reuse fake_decode_meta's mapInPandas plumbing unchanged"
    )


META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def _h60_bytes(payload: bytes) -> int:
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in: metadata derived from md5(payload).

    width  = 16 + h60 % 240,  height = 16 + (h60 >> 8) % 240,
    n_frames = 1 + (h60 >> 16) % 8,  mean_intensity = (h60 % 256) / 255.
    (Mirrors to SQL via md5(text) — the oracle contract.)
    """
    for pdf in batches:
        hs = pdf["payload"].map(_h60_bytes)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (16 + hs % 240).astype("int32"),
                "height": (16 + (hs // 256) % 240).astype("int32"),
                "n_frames": (1 + (hs // 65536) % 8).astype("int32"),
                "mean_intensity": (hs % 256) / 255.0,
            }
        )


def image_meta(media: DataFrame) -> DataFrame:
    """payload table -> decoded metadata rows (Arrow-batched, no shuffle)."""
    return media.select("doc_id", "payload").mapInPandas(
        fake_decode_meta, schema=META_SCHEMA
    )


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: one row per kept frame index (0, stride, 2*stride…).

    The explode happens JVM-side on the decoded n_frames, so the binary
    payload is never duplicated per frame — only (doc_id, frame_idx) rows.
    """
    meta = image_meta(media)
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )
