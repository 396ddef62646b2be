"""Multimodal-column processing: binary image payloads + typed metadata.

Images/video ride through the pipeline as ``binary`` columns; the heavy
per-item work (decode, frame-sample) runs as Arrow-batched pandas UDFs via
``mapInPandas`` so each Spark task streams record batches without
materializing a partition.

The decode path is REAL: payloads are uncompressed 24-bit BMP images or
COMPRESSED PNG images (pure-stdlib codecs — BMP via struct, PNG via zlib
DEFLATE with full scanline-filter reconstruction; no PIL/libjpeg needed
in this environment), optionally wrapped in a tiny multi-frame container
(``LSMF`` magic + frame count) for the video case. ``decode_image``
dispatches on the file magic: BMP parses the actual BITMAPFILEHEADER /
BITMAPINFOHEADER and pixel rows (4-byte-aligned, bottom-up); PNG walks
the chunk list (IHDR/IDAT/IEND, CRC-checked), inflates the IDAT stream
and reconstructs all five filter types (None/Sub/Up/Average/Paeth) per
the PNG spec, for 8-bit grayscale and truecolor; JPEG (``jpeg.py``)
Huffman-decodes the baseline-sequential scan, dequantizes with the
stream's own DQT tables and runs the IDCT. Mean intensity comes from the
reconstructed pixel bytes. Progressive/chroma JPEG and ffmpeg container
formats raise — wire a library decoder into ``decode_image`` and every
downstream operator (schema, batching, partitioning) is unchanged.

The synthetic payload generator is deterministic (dimensions and frame
count derived from md5 of the source text; pixel rows alternate two
constant intensities), so a SQL oracle reproduces the decoded metadata in
closed form while the engine path genuinely decodes bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_payload",
    "encode_bmp",
    "encode_png",
    "encode_jpeg",
    "encode_jpeg_color",
    "decode_image",
    "decode_container",
    "image_meta",
    "sample_frames",
    "encode_wav",
    "decode_audio",
    "attach_audio_payload",
    "audio_meta",
]

_MAGIC = b"LSMF"  # multi-frame container: magic + u32 frame count + frames


def encode_bmp(width: int, height: int, row_values: list[int]) -> bytes:
    """Uncompressed 24-bit bottom-up BMP; row y is the constant grayscale
    ``row_values[y]`` (r=g=b). Rows padded to 4-byte boundaries."""
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    pixel_size = (row_bytes + pad) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        v = row_values[y] & 0xFF
        rows.append(bytes([v, v, v]) * width + b"\x00" * pad)
    return header + info + b"".join(rows)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, row_values: list[int]) -> bytes:
    """8-bit grayscale PNG (color type 0, non-interlaced); row y is the
    constant intensity ``row_values[y]``. Scanlines use filter 0 and the
    IDAT stream is real zlib DEFLATE — a conforming decoder (this module's
    or any library's) reads these bytes."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([row_values[y] & 0xFF]) * width for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_jpeg(width: int, height: int, row_values: list[int]) -> bytes:
    """Baseline grayscale JFIF; row y is the constant intensity
    ``row_values[y]``. Real DCT + Huffman entropy coding (``jpeg.py``) —
    lossy, unlike the BMP/PNG twins, so decoded means match the source
    only to quantization error."""
    from lucene_spark.pipeline import jpeg

    # index per row so a short row_values raises like the BMP/PNG twins
    px = np.repeat(
        np.array([row_values[y] for y in range(height)], dtype=np.uint8)[:, None],
        width,
        axis=1,
    )
    return jpeg.encode_jpeg_pixels(px)


def encode_jpeg_color(
    width: int, height: int, row_colors: list[tuple[int, int, int]]
) -> bytes:
    """Baseline color JFIF with 4:2:0 chroma subsampling; row y is the
    constant RGB color ``row_colors[y]``. Real YCbCr conversion + DCT +
    interleaved-MCU Huffman coding (``jpeg.py``) — lossy like the
    grayscale twin, exact on dimensions."""
    from lucene_spark.pipeline import jpeg

    px = np.repeat(
        np.array([row_colors[y] for y in range(height)], dtype=np.uint8)[:, None, :],
        width,
        axis=1,
    )
    return jpeg.encode_jpeg_pixels(px, subsampling="4:2:0")


def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct PNG scanlines (spec §9 'Filtering'): ``raw`` is the
    inflated IDAT stream reshaped to (height, 1 + stride); returns the
    (height, stride) reconstructed bytes. All five filter types."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 1:  # Sub — prefix dependency, sequential per pixel
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} is not in the spec")
        prev = (rec & 0xFF).astype(np.uint8)
        out[y] = prev
    return out


def _decode_png(payload: bytes) -> tuple[int, int, float]:
    """Chunk walk + inflate + unfilter for 8-bit grayscale (color type 0)
    and truecolor (type 2), non-interlaced — the shapes this pipeline
    emits and the common ones in the wild. CRCs are verified (the role
    CheckIndex's checksum pass plays for index files)."""
    pos = len(_PNG_SIG)
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} fails CRC")
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    "built-in PNG codec reads 8-bit gray/truecolor, "
                    "non-interlaced; wire PIL here for other shapes"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG payload missing IHDR or IDAT")
    bpp = 1 if color_type == 0 else 3
    stride = width * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError("PNG IDAT stream length does not match dimensions")
    px = _png_unfilter(raw.reshape(height, 1 + stride), height, stride, bpp)
    return int(width), int(height), float(px.mean()) / 255.0


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Parse a real BMP or PNG payload -> (width, height, mean_intensity).

    mean_intensity = mean of all pixel channel bytes / 255 (padding
    excluded). Other formats raise — swap in a library decoder here.
    """
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from lucene_spark.pipeline import jpeg

        return jpeg.decode_jpeg_meta(payload)
    if payload[:2] != b"BM":
        raise NotImplementedError(
            "built-in codecs cover BMP, PNG and baseline JPEG in this "
            "environment; wire PIL/libjpeg here for other formats — "
            "downstream plumbing is format-agnostic"
        )
    off = struct.unpack_from("<I", payload, 10)[0]
    size, width, height, _planes, bpp = struct.unpack_from(
        "<IiiHH", payload, 14
    )
    if bpp != 24 or size != 40:
        raise NotImplementedError("built-in codec reads 24-bit BITMAPINFOHEADER")
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    h = abs(height)
    px = np.frombuffer(
        payload, dtype=np.uint8, count=(row_bytes + pad) * h, offset=off
    ).reshape(h, row_bytes + pad)[:, :row_bytes]
    return width, h, float(px.mean()) / 255.0


def decode_container(payload: bytes) -> tuple[int, bytes]:
    """(n_frames, first_frame_bytes) of an LSMF multi-frame payload; a bare
    BMP counts as a single frame."""
    if payload[:4] == _MAGIC:
        n = struct.unpack_from("<I", payload, 4)[0]
        return n, payload[8:]
    return 1, payload


def _h60(data: bytes) -> int:
    return int(hashlib.md5(data).hexdigest()[:15], 16)


def _make_payload(text: str, fmt: str = "bmp") -> bytes:
    """Deterministic multi-frame image payload for one doc: dimensions and
    frame count from md5(text); rows alternate two constant intensities
    (closed-form mean for the SQL oracle — identical for the lossless
    codecs, since BMP replicates each row value across 3 channels and PNG
    stores it once in grayscale, and the mean is per channel byte; JPEG
    is lossy, so its decoded mean matches only to quantization error)."""
    h = _h60(text.encode("utf-8"))
    width = 16 + h % 240
    height = 16 + (h // 256) % 240
    n_frames = 1 + (h // 65536) % 8
    if fmt == "jpeg420":
        # color twin: rows banded in runs of 16 alternating two md5-derived
        # RGB colors — every 8x8 luma block and (at 4:2:0) every chroma
        # block is constant, so quantization error stays within a couple of
        # intensity levels and the closed-form source mean is a tight bound
        c1 = tuple((h >> s) % 256 for s in (32, 36, 40))
        c2 = tuple((h >> s) % 256 for s in (44, 48, 52))
        colors = [c1 if (y // 16) % 2 == 0 else c2 for y in range(height)]
        frame = encode_jpeg_color(width, height, colors)
        return _MAGIC + struct.pack("<I", n_frames) + frame * n_frames
    v1 = h % 256
    v2 = (h // 16777216) % 256
    rows = [v1 if y % 2 == 0 else v2 for y in range(height)]
    enc = {"bmp": encode_bmp, "png": encode_png, "jpeg": encode_jpeg}[fmt]
    frame = enc(width, height, rows)
    return _MAGIC + struct.pack("<I", n_frames) + frame * n_frames


_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_payload(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "bmp",
) -> DataFrame:
    """(doc_id, payload:binary, mime, n_bytes) — the multimodal column
    shape, payload = REAL multi-frame image bytes synthesized per doc
    (``fmt``: "bmp" uncompressed, "png" zlib-compressed, or "jpeg"
    DCT-coded; identical decoded metadata for the lossless pair, mean to
    quantization error for jpeg). A production pipeline reads
    ``binaryFile`` sources or Iceberg binary columns into the same
    schema."""
    if fmt not in ("bmp", "png", "jpeg", "jpeg420"):
        raise ValueError(
            f"fmt must be 'bmp', 'png', 'jpeg' or 'jpeg420', got {fmt!r}"
        )
    mime = f"video/x-lsmf-{fmt}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _make_payload(t if isinstance(t, str) else "", fmt)
                for t in pdf[text_col].fillna("")
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": mime,
                    "n_bytes": np.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema=_PAYLOAD_SCHEMA)


META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def _decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode: parse container + BMP headers + pixel rows per payload."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "width", "height", "n_frames", "mean_intensity")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames, frame = decode_container(bytes(payload))
            w, h, mean = decode_image(frame)
            out["doc_id"].append(int(doc_id))
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(n_frames)
            out["mean_intensity"].append(mean)
        yield pd.DataFrame(
            {
                "doc_id": np.array(out["doc_id"], dtype="int64"),
                "width": np.array(out["width"], dtype="int32"),
                "height": np.array(out["height"], dtype="int32"),
                "n_frames": np.array(out["n_frames"], dtype="int32"),
                "mean_intensity": np.array(out["mean_intensity"], dtype="float64"),
            }
        )


def image_meta(media: DataFrame) -> DataFrame:
    """payload table -> decoded metadata rows (Arrow-batched, no shuffle)."""
    return media.select("doc_id", "payload").mapInPandas(
        _decode_meta, schema=META_SCHEMA
    )


# ---- audio (RIFF/WAVE PCM) --------------------------------------------------

#: md5-derived sample-rate choices for the synthetic generator
_AUDIO_RATES = (8000, 16000, 22050, 44100)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE bytes. A LIST/INFO chunk is written
    between fmt and data on purpose: decoders must genuinely walk the
    chunk list, not assume data starts at byte 44."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    info = b"INFOISFT" + struct.pack("<I", 12) + b"lucene_spark"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_audio(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a real RIFF/WAVE payload by walking its chunk list ->
    (sample_rate, n_channels, n_samples, peak_abs, sum_abs).

    peak_abs / sum_abs are computed from the decoded PCM samples (int16,
    absolute values). Compressed / non-PCM formats raise — wire a library
    decoder here; downstream plumbing is format-agnostic.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only the built-in RIFF/WAVE PCM codec is available in this "
            "environment; wire soundfile/ffmpeg here for other formats"
        )
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    fmt = data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks to even
    if fmt is None or data is None:
        raise ValueError("malformed WAVE: missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("built-in codec reads 16-bit PCM only")
    pcm = np.frombuffer(data, dtype="<i2")
    n_samples = len(pcm) // n_channels
    absval = np.abs(pcm.astype(np.int64))
    return (
        sample_rate,
        n_channels,
        n_samples,
        int(absval.max(initial=0)),
        int(absval.sum()),
    )


def _make_audio_payload(text: str) -> bytes:
    """Deterministic mono PCM payload for one doc: sample rate, block
    length k, repeat count m and the two alternating amplitudes all derive
    from md5(text); samples are m repeats of (k * a1, k * -a2), so every
    decoded metric has a closed form for the SQL oracle:
    n_samples = 2*k*m, peak_abs = max(a1, a2), sum_abs = k*m*(a1+a2)."""
    h = _h60(text.encode("utf-8"))
    sample_rate = _AUDIO_RATES[h % 4]
    k = 2 + (h // 4) % 14
    m = 4 + (h // 64) % 61
    a1 = 500 + (h // 4096) % 15000
    a2 = 300 + (h // 67108864) % 15000
    block = [a1] * k + [-a2] * k
    return encode_wav(sample_rate, np.array(block * m, dtype=np.int16))


def attach_audio_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload:binary, mime, n_bytes) with REAL RIFF/WAVE bytes
    synthesized per doc — the audio twin of ``attach_payload``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _make_audio_payload(t if isinstance(t, str) else "")
                for t in pdf[text_col].fillna("")
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "audio/wav",
                    "n_bytes": np.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema=_PAYLOAD_SCHEMA)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("peak_abs", IntegerType()),
        StructField("sum_abs", LongType()),
        StructField("duration_ms", DoubleType()),
    ]
)


def _decode_audio_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k.name: [] for k in AUDIO_META_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            sr, nch, n, peak, sabs = decode_audio(bytes(payload))
            rows["doc_id"].append(int(doc_id))
            rows["sample_rate"].append(sr)
            rows["n_channels"].append(nch)
            rows["n_samples"].append(n)
            rows["peak_abs"].append(peak)
            rows["sum_abs"].append(sabs)
            rows["duration_ms"].append(float(n) * 1000.0 / float(sr))
        yield pd.DataFrame(
            {
                "doc_id": np.array(rows["doc_id"], dtype="int64"),
                "sample_rate": np.array(rows["sample_rate"], dtype="int32"),
                "n_channels": np.array(rows["n_channels"], dtype="int32"),
                "n_samples": np.array(rows["n_samples"], dtype="int64"),
                "peak_abs": np.array(rows["peak_abs"], dtype="int32"),
                "sum_abs": np.array(rows["sum_abs"], dtype="int64"),
                "duration_ms": np.array(rows["duration_ms"], dtype="float64"),
            }
        )


def audio_meta(media: DataFrame) -> DataFrame:
    """audio payload table -> decoded metadata (Arrow-batched, no shuffle)."""
    return media.select("doc_id", "payload").mapInPandas(
        _decode_audio_meta, schema=AUDIO_META_SCHEMA
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
