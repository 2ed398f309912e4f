"""Checkpoint/resume test (SURVEY.md §5.5): kill the job mid-run, rerun,
assert (a) final output identical to an uninterrupted run and (b) committed
partitions were NOT recomputed (journal records untouched)."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "featuregen.py")


def _run(outdir, *extra):
    cmd = [sys.executable, JOB, "--input", "/root/testdata/sf0.001",
           "--output", outdir, "--partitions", "8", "--chunk-size", "4",
           "--parallelism", "8", *extra]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=420)


def _read_output(spark, outdir):
    df = spark.read.parquet(os.path.join(outdir, "data")).toPandas()
    return df.sort_values(sorted(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.slow
def test_resume_without_recompute(spark, tmp_path):
    clean = str(tmp_path / "clean")
    faulty = str(tmp_path / "faulty")

    r = _run(clean)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SUMMARY" in r.stdout

    r1 = _run(faulty, "--kill-after-chunks", "1")
    assert r1.returncode == 42, r1.stdout + r1.stderr
    journal = os.path.join(faulty, "_journal")
    committed_after_kill = sorted(os.listdir(journal))
    assert len(committed_after_kill) == 4  # one chunk of 4 pids
    mtimes = {f: os.path.getmtime(os.path.join(journal, f)) for f in committed_after_kill}

    r2 = _run(faulty)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "pending=4 committed=4" in r2.stdout
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(journal, f)) == m, f"{f} recomputed"

    a = _read_output(spark, clean)
    b = _read_output(spark, faulty)
    pd.testing.assert_frame_equal(a, b)

    # journal carries lineage + throughput metrics per partition
    with open(os.path.join(journal, committed_after_kill[0])) as fh:
        rec = json.load(fh)
    assert rec["lineage"]["params"]["partitions"] == 8
    assert "rows_per_s" in rec["metrics"] and "rows_out" in rec["metrics"]
