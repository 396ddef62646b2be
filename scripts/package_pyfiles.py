"""Build ``dist/lucene_spark.zip`` for ``spark-submit --py-files``.

The north-star deployment shape is ``spark-submit --py-files
lucene_spark.zip scripts/submit_index_build.py ...`` on a multi-executor
cluster: the zip ships the whole package to every executor's Python
worker, so the pandas/Arrow UDF closures (invert, block pack, doclen
count) unpickle against the same code the driver planned with.

Deterministic output: fixed file order, zeroed timestamps — the zip's
bytes depend only on the source tree, so cluster-side caches
(spark.files) dedupe across resubmits of the same build.

Usage: python scripts/package_pyfiles.py [out_zip]  (default dist/lucene_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> int:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg_root = os.path.join(REPO, "lucene_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return len(entries)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "lucene_spark.zip")
    n = build_zip(out)
    print(f"{out}: {n} files")
