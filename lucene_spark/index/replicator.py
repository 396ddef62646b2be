"""Replicator: publish/sync index revisions to read replicas.

Re-expression of the reference's NRT replication module
(``replicator/nrt/PrimaryNode.java`` — the primary publishes an *NRT
point*: a version number plus the exact file set of the current commit;
``replicator/nrt/CopyState.java:31`` — that published state, with
per-file metadata; ``replicator/nrt/CopyJob.java`` / ``CopyOneFile.java``
— a replica diffs the published file set against its local files and
copies only what is missing or changed; ``replicator/nrt/
ReplicaFileDeleter.java`` — files no revision references anymore are
deleted only after the new point is live).

Spark-native shape: an index here is a parquet *segment directory*
(``InvertedIndex.save``), so replication is file-set management, not a
query plan — exactly the reference's position (the replicator moves
bytes; searching stays unchanged). Mechanics:

- ``publish(primary_dir)`` scans the segment directory, records
  ``FileMeta`` (relative path, length, mtime-independent checksum) for
  every data file, and writes a ``_revisions/rev_<N>.json`` manifest.
  Writing the manifest is the COMMIT (two-phase, like ``segments_N``):
  readers/replicas only ever act on fully-written manifests, and the
  write goes through a temp file + atomic rename.
- ``sync(primary_dir, replica_dir)`` reads the latest manifest, copies
  files whose (length, checksum) differ locally (CopyOneFile), installs
  the manifest LAST, then deletes local files the new revision no longer
  references (ReplicaFileDeleter). A crash mid-copy leaves the replica on
  its old revision — re-sync is idempotent and resumes (already-copied
  files hash-match and are skipped).
- checksums are xxhash-free stdlib sha256 over file bytes; the reference
  uses per-file CRC32 footers (``store/ChecksumIndexInput``) — same role.

At 100 TB the byte movement would be object-store server-side copies and
the manifest a table-format snapshot (Iceberg-style); the revision/
diff/commit-last/delete-after protocol here is the part that carries
over unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass

__all__ = ["FileMeta", "Revision", "publish", "sync", "latest_revision"]

_REV_DIR = "_revisions"


@dataclass(frozen=True)
class FileMeta:
    """CopyState's per-file metadata (replicator/nrt/FileMetaData.java):
    identity = (relative path, length, content checksum)."""

    path: str
    length: int
    sha256: str


@dataclass(frozen=True)
class Revision:
    """One published NRT point (CopyState.java:31): version + file set."""

    version: int
    files: tuple


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _scan(index_dir: str) -> list[FileMeta]:
    """Every data file under the segment directory, relative paths,
    skipping the revisions dir itself and temp files."""
    out = []
    for root, dirs, files in os.walk(index_dir):
        dirs[:] = [d for d in dirs if d != _REV_DIR]
        for name in files:
            if name.endswith(".tmp") or name.startswith("."):
                continue  # parquet _SUCCESS markers replicate; temps don't
            full = os.path.join(root, name)
            rel = os.path.relpath(full, index_dir)
            out.append(FileMeta(rel, os.path.getsize(full), _sha256(full)))
    return sorted(out, key=lambda m: m.path)


def _rev_path(index_dir: str, version: int) -> str:
    return os.path.join(index_dir, _REV_DIR, f"rev_{version:012d}.json")


def latest_revision(index_dir: str) -> Revision | None:
    """Highest fully-committed revision, or None (a replica that has never
    synced, or a primary that has never published)."""
    rdir = os.path.join(index_dir, _REV_DIR)
    if not os.path.isdir(rdir):
        return None
    revs = sorted(n for n in os.listdir(rdir) if n.startswith("rev_"))
    if not revs:
        return None
    with open(os.path.join(rdir, revs[-1])) as f:
        data = json.load(f)
    return Revision(
        version=int(data["version"]),
        files=tuple(FileMeta(**m) for m in data["files"]),
    )


def publish(primary_dir: str) -> Revision:
    """Publish the current state of the primary's segment directory as the
    next revision (PrimaryNode's new NRT point). Scan -> manifest -> atomic
    rename; the rename is the commit."""
    prev = latest_revision(primary_dir)
    version = (prev.version + 1) if prev else 1
    files = _scan(primary_dir)
    rev = Revision(version=version, files=tuple(files))
    os.makedirs(os.path.join(primary_dir, _REV_DIR), exist_ok=True)
    final = _rev_path(primary_dir, version)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"version": version, "files": [asdict(m) for m in files]}, f
        )
    os.replace(tmp, final)  # atomic commit
    return rev


def sync(primary_dir: str, replica_dir: str) -> dict:
    """Bring ``replica_dir`` to the primary's latest published revision
    (ReplicaNode.sync / CopyJob): copy changed files, commit the manifest
    last, delete unreferenced files after. Returns copy statistics.

    Idempotent and crash-safe: files land under temp names and rename into
    place; the manifest is installed only after every file is in place, so
    a replica is always on a complete revision.
    """
    rev = latest_revision(primary_dir)
    if rev is None:
        raise FileNotFoundError(f"no published revision under {primary_dir}")
    local = latest_revision(replica_dir)
    if local is not None and local.version == rev.version:
        return {
            "version": rev.version,
            "files_copied": 0,
            "bytes_copied": 0,
            "files_reused": len(rev.files),
            "files_deleted": 0,
        }
    have = {m.path: m for m in (local.files if local else ())}
    # trust-but-verify: a file is reusable iff present with matching
    # length+checksum on disk (a crashed copy can leave manifest-less files)
    copied = reused = bytes_copied = 0
    for m in rev.files:
        dst = os.path.join(replica_dir, m.path)
        ok = False
        if os.path.exists(dst) and os.path.getsize(dst) == m.length:
            known = have.get(m.path)
            ok = (known is not None and known.sha256 == m.sha256) or (
                _sha256(dst) == m.sha256
            )
        if ok:
            reused += 1
            continue
        src = os.path.join(primary_dir, m.path)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        copied += 1
        bytes_copied += m.length
    # COMMIT: install the manifest (the replica is now on rev.version)
    os.makedirs(os.path.join(replica_dir, _REV_DIR), exist_ok=True)
    final = _rev_path(replica_dir, rev.version)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"version": rev.version, "files": [asdict(m) for m in rev.files]},
            f,
        )
    os.replace(tmp, final)
    # ReplicaFileDeleter: drop local data files the new revision doesn't
    # reference (old parquet part files from replaced directories)
    live = {m.path for m in rev.files}
    deleted = 0
    for root, dirs, files in os.walk(replica_dir):
        dirs[:] = [d for d in dirs if d != _REV_DIR]
        for name in files:
            full = os.path.join(root, name)
            rel = os.path.relpath(full, replica_dir)
            if rel not in live:
                os.remove(full)
                deleted += 1
    return {
        "version": rev.version,
        "files_copied": copied,
        "bytes_copied": bytes_copied,
        "files_reused": reused,
        "files_deleted": deleted,
    }
