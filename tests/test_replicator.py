"""Replicator: publish/sync revisions of a saved index to a replica dir.

Protocol fidelity targets (see lucene_spark/index/replicator.py):
revision = exact file set + checksums (CopyState), diff copies only
changed files (CopyJob), manifest commits LAST, unreferenced files are
deleted after the switch (ReplicaFileDeleter), searches on the replica
equal the primary's.
"""

import os

import pytest

from lucene_spark.index import replicator as R
from lucene_spark.index.build import IndexConfig, build_index, load_index
from lucene_spark.search import query as Q
from lucene_spark.search.searcher import IndexSearcher

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    primary = str(tmp_path_factory.mktemp("primary"))
    replica = str(tmp_path_factory.mktemp("replica"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    idx = build_index(
        spark,
        docs,
        IndexConfig(text_col="text", field_name="text", doc_id_col="doc_id"),
    )
    idx.save(primary)
    return primary, replica, docs


def _topk(spark, index_dir, k=10):
    s = IndexSearcher(load_index(spark, index_dir))
    return [
        (r["doc_id"], r["score"])
        for r in s.search(Q.TermQuery("text", "spark"), k=k).collect()
    ]


def test_publish_and_first_sync(spark, dirs):
    primary, replica, _ = dirs
    rev = R.publish(primary)
    assert rev.version == 1 and len(rev.files) > 0
    stats = R.sync(primary, replica)
    assert stats["version"] == 1
    assert stats["files_copied"] == len(rev.files)
    assert stats["files_deleted"] == 0
    # the replica answers queries identically to the primary
    assert _topk(spark, replica) == _topk(spark, primary)


def test_sync_is_idempotent(spark, dirs):
    primary, replica, _ = dirs
    stats = R.sync(primary, replica)  # same revision: nothing moves
    assert stats["files_copied"] == 0 and stats["bytes_copied"] == 0
    assert stats["files_reused"] > 0


def test_incremental_sync_copies_only_changed(spark, dirs):
    primary, replica, docs = dirs
    # new commit on the primary: different corpus subset -> docs/postings
    # parquet part files change; publish rev 2
    idx2 = build_index(
        spark,
        docs.limit(150),
        IndexConfig(text_col="text", field_name="text", doc_id_col="doc_id"),
    )
    idx2.save(primary)
    rev2 = R.publish(primary)
    assert rev2.version == 2
    stats = R.sync(primary, replica)
    assert stats["version"] == 2
    # something changed and something was reusable (parquet dirs rewritten
    # with identical bytes hash-match and are skipped)
    assert stats["files_copied"] > 0
    # stale rev-1-only files were reclaimed after the switch
    live = {m.path for m in rev2.files}
    on_disk = []
    for root, ds, fs in os.walk(replica):
        ds[:] = [d for d in ds if d != "_revisions"]
        on_disk.extend(
            os.path.relpath(os.path.join(root, f), replica) for f in fs
        )
    assert set(on_disk) == live
    assert _topk(spark, replica) == _topk(spark, primary)


def test_crash_mid_copy_keeps_old_revision(spark, dirs):
    primary, replica, docs = dirs
    # simulate a partial copy: write garbage under a data path the next
    # revision references, with NO manifest install
    rev = R.latest_revision(primary)
    victim = os.path.join(replica, rev.files[0].path)
    with open(victim, "wb") as f:
        f.write(b"torn copy")
    # replica manifest still says rev 2 with the old checksum: re-sync
    # detects the mismatch (size/hash) and re-copies — but because the
    # local manifest version equals the primary's, force a new primary rev
    R.publish(primary)
    stats = R.sync(primary, replica)
    assert stats["files_copied"] >= 1  # the torn file was repaired
    assert _topk(spark, replica) == _topk(spark, primary)
