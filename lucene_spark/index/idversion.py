"""Versioned primary-key lookups — the idversion codec role
(``sandbox/codecs/idversion/IDVersionPostingsFormat.java:33-50``): a
PK (ID) field where every ID carries a long version, supporting the
one query that codec exists for —
``IDVersionSegmentTermsEnum.seekExact(id, minVersion)``: "was this ID
already indexed with a version > N?" — used during indexing (with
LiveFieldValues) to SKIP re-indexing docs that already exist newer.

Faithful shape, Spark-first layout:

- the ID postings are DOCS_ONLY with the docID pulsed into the terms
  dictionary and the version as the first-token payload (:46-47) — here
  one slim table ``(seg_id, id, version, doc_id)``, which IS the pulsed
  form: no positions, no freqs, term row = posting row;
- the version block-tree keeps the MAX version per index block so
  lookups can fail from the terms index alone
  (``VersionBlockTreeTermsWriter`` pair output) — here a driver-side
  per-segment ``max_version`` dict plus optional per-segment bloom
  filters (``index/bloom.py``) play that role: a ``seek_exact(id,
  min_version)`` against a segment whose max version <= min_version, or
  whose bloom says NO, costs zero I/O;
- versions must be >= 0 (``IDVersionPostingsFormat.MIN_VERSION``) and
  the app should assign them monotonically increasing (:41-44); the
  latest (max-version) row per ID is the live one.

100 TB story: the metadata prunes segments BEFORE the parquet scan, so
an optimistic-concurrency ingest (check-then-write per batch of keys)
reads only segments that can possibly hold a newer version of a key —
the exact access pattern the reference codec optimizes for.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.bloom import FuzzySet, build_bloom_filters

__all__ = ["IDVersionIndex", "build_id_version_index"]

#: IDVersionPostingsFormat.MIN_VERSION — versions must be >= this
MIN_VERSION = 0


@dataclass
class IDVersionIndex:
    """Handle over the versioned-PK table + fail-fast metadata."""

    table: DataFrame  # (seg_id, id, version, doc_id)
    seg_max_version: dict[int, int]  # per-segment max version (terms-index role)
    blooms: dict[int, FuzzySet] | None = None  # per-segment ID existence

    def _candidate_segments(self, ids: list[str], min_version: int) -> list[int]:
        segs = [
            s for s, mv in self.seg_max_version.items() if mv > min_version
        ]
        if self.blooms is not None:
            idb = [i.encode("utf-8") for i in ids]
            segs = [
                s
                for s in segs
                if s not in self.blooms
                or any(self.blooms[s].contains(i) for i in idb)
            ]
        return segs

    def seek_exact(self, ids: list[str] | str, min_version: int = MIN_VERSION - 1) -> DataFrame:
        """The seekExact(id, minVersion) surface
        (``IDVersionSegmentTermsEnum.java`` seekExact(BytesRef, long)):
        for each requested ID, the LIVE (max-version) row — but only
        when that version is > ``min_version``. Segments whose recorded
        max version <= min_version (or whose bloom says NO for every
        requested ID) never reach the scan."""
        if isinstance(ids, str):
            ids = [ids]
        segs = self._candidate_segments(ids, min_version)
        if not segs:
            return self.table.filter(F.lit(False)).select("id", "version", "doc_id")
        t = self.table.filter(
            F.col("seg_id").isin(segs) & F.col("id").isin(ids)
        )
        # live row per id = max (version, doc_id) — monotonic versions
        latest = t.groupBy("id").agg(
            F.max(F.struct("version", "doc_id")).alias("m")
        )
        return latest.select(
            "id", F.col("m.version").alias("version"), F.col("m.doc_id").alias("doc_id")
        ).filter(F.col("version") > min_version)


def build_id_version_index(
    docs: DataFrame,
    id_col: str,
    version_col: str,
    doc_id_col: str = "doc_id",
    docs_per_segment: int = 1 << 20,
    with_blooms: bool = True,
) -> IDVersionIndex:
    """One aggregation pass builds the pulsed table + per-segment max
    versions; versions < MIN_VERSION raise like the writer does
    (``IDVersionPostingsWriter`` checks the payload range)."""
    t = docs.select(
        F.expr(f"{doc_id_col} DIV {docs_per_segment}").alias("seg_id"),
        F.col(id_col).cast("string").alias("id"),
        F.col(version_col).cast("long").alias("version"),
        F.col(doc_id_col).cast("long").alias("doc_id"),
    )
    bad = t.filter(F.col("version") < MIN_VERSION).count()
    if bad:
        raise ValueError(
            f"{bad} rows have version < MIN_VERSION={MIN_VERSION} "
            "(IDVersionPostingsFormat requires non-negative versions)"
        )
    t = t.persist()
    seg_max = {
        int(r["seg_id"]): int(r["mv"])
        for r in t.groupBy("seg_id").agg(F.max("version").alias("mv")).collect()
    }
    blooms = None
    if with_blooms:
        # reuse the bloom builder over a postings-shaped frame
        class _Shim:
            pass

        shim = _Shim()
        shim.postings = t.select(
            F.lit("id").alias("field"), "seg_id", F.col("id").alias("term")
        )
        shim.docs = t.select("doc_id")

        class _Cfg:
            pass

        cfg = _Cfg()
        cfg.field_name = "id"
        cfg.docs_per_segment = docs_per_segment
        shim.config = cfg
        blooms = build_bloom_filters(shim, "id")
    return IDVersionIndex(t, seg_max, blooms)
