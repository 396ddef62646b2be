"""spark-submit deployment shape (BASELINE.md rows 'Index-build
throughput' and 'Resumability'): package the library as a --py-files
zip, run the checkpointed build through a REAL ``spark-submit``
subprocess, verify the per-row sha256 invariant and that a rerun of the
same command resumes (skips every committed segment) instead of
rebuilding.

These tests run no Spark work in-process — the subprocess owns the only
active SparkSession (sandbox rule: one Spark workload at a time).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit")


def test_package_pyfiles_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package_pyfiles import build_zip
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "lucene_spark.zip")
    n = build_zip(out)
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert n == len(names) > 20
    assert "lucene_spark/index/build.py" in names
    assert "lucene_spark/search/searcher.py" in names
    assert all(name.startswith("lucene_spark/") for name in names)
    # deterministic: a second build produces identical bytes
    out2 = str(tmp_path / "again.zip")
    build_zip(out2)
    assert open(out, "rb").read() == open(out2, "rb").read()


@pytest.mark.skipif(SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_build_and_resume(tmp_path):
    import pandas as pd  # noqa: F401  (corpus generator returns pandas)

    sys.path.insert(0, REPO)
    try:
        from lucene_spark.testing.corpus import generate_corpus
    finally:
        sys.path.pop(0)

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(2):  # two files — a multi-partition input
        pdf = generate_corpus(200, seed=100 + i)
        pq.write_table(pa.Table.from_pandas(pdf), corpus_dir / f"part-{i}.parquet")

    zip_path = tmp_path / "lucene_spark.zip"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py"), str(zip_path)],
        check=True,
        capture_output=True,
    )
    index_dir = tmp_path / "index"

    def submit():
        cmd = [
            SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            os.path.join(REPO, "scripts", "submit_index_build.py"),
            "--input", str(corpus_dir),
            "--index-dir", str(index_dir),
            "--docs-per-segment", "200",
            "--query", "def AND return",
        ]
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # imports must come from the zip
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path)
        )
        assert out.returncode == 0, out.stderr[-4000:]
        line = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')]
        assert line, out.stdout[-2000:]
        return json.loads(line[-1])

    first = submit()
    assert first["n_segments"] == 2
    assert first["segments_built"] == 2 and first["segments_resumed"] == 0
    assert first["n_docs"] == 400
    assert first["sha256_mismatches"] == 0
    assert first["smoke"]["n_hits"] > 0

    second = submit()  # same command = resume: every segment skipped
    assert second["segments_resumed"] == 2 and second["segments_built"] == 0
    assert second["n_docs"] == 400
    assert second["sha256_mismatches"] == 0
    assert second["smoke"] == first["smoke"]
