"""End-to-end `spark-submit --py-files` evidence for the north rule.

The production deployment shape is `spark-submit --py-files
dist/engine.zip run_extract.py ...` on a multi-executor cluster
(BASELINE.json north_rule).  This test pins that exact invocation in a
subprocess — the engine importable ONLY from the zip (cwd moved so the
repo checkout can't shadow it), a fresh run producing every stage
output, and the checkpoint-resume rerun processing zero buckets.
Reference parity: mistralocr_app.py:523-541 resumes from pickle
checkpoints; here resume is per-partition lineage rows (SURVEY §4.4).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_fresh_and_resume(tmp_path):
    sys.path.insert(0, REPO)
    try:
        from engine import fixtures
        from make_pyfiles import main as build_zip

        zip_path = build_zip()
        inp = str(tmp_path / "transcripts.parquet")
        fixtures.write_transcripts_parquet(inp, n_convs=24)
    finally:
        sys.path.pop(0)

    out = str(tmp_path / "out")
    cmd = [
        SPARK_SUBMIT,
        "--py-files",
        zip_path,
        os.path.join(REPO, "run_extract.py"),
        "--input",
        inp,
        "--output",
        out,
        "--snapshot-id",
        "snap-e2e",
        "--buckets",
        "4",
        "--cores",
        "4",
        "--spans",
    ]
    # run from tmp_path so `import engine` can only resolve via the zip
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CONF")
    }
    fresh = subprocess.run(
        cmd,
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert fresh.returncode == 0, fresh.stderr[-2000:]
    assert "done: 4 buckets processed" in fresh.stdout, fresh.stdout
    for sub in ("turns", "docs", "spans", "_lineage"):
        assert os.path.isdir(os.path.join(out, sub)), sub

    resume = subprocess.run(
        cmd,
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert resume.returncode == 0, resume.stderr[-2000:]
    assert "done: 0 buckets processed" in resume.stdout, resume.stdout
    # same turn totals both runs: resume re-reads completed partitions
    tot = [
        ln for ln in fresh.stdout.splitlines() if ln.startswith("done:")
    ][0].split("turns total")[0]
    tot2 = [
        ln for ln in resume.stdout.splitlines() if ln.startswith("done:")
    ][0].split("turns total")[0]
    assert tot.split(",")[1].strip() == tot2.split(",")[1].strip()
