"""North-rule packaging evidence: the extraction job must run via
``spark-submit --py-files`` (zip packaging, no repo on the executors'
sys.path) and be checkpoint-resumable from its lineage table."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(args, env=None):
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", os.path.join(REPO, "dist", "pdf_extract_spark.zip"),
        os.path.join(REPO, "jobs", "extract_job.py"),
    ] + args
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=300, cwd=REPO, env=env
    )


@pytest.mark.slow
def test_spark_submit_pyfiles_and_resume(tmp_path):
    import duckdb

    from tests.conftest import ensure_pyfiles_zip

    ensure_pyfiles_zip()
    out = str(tmp_path / "job_out")

    r1 = _submit(["--input", "synthetic:48", "--output", out,
                  "--run-id", "t1", "--num-partitions", "4"])
    assert "run=t1 docs=48" in r1.stdout, r1.stdout[-500:] + r1.stderr[-2000:]

    # resume on a GROWN input: only the 16 new docs are extracted
    r2 = _submit(["--input", "synthetic:64", "--output", out,
                  "--run-id", "t2", "--num-partitions", "4", "--resume"])
    assert "run=t2 docs=16" in r2.stdout, r2.stdout[-500:] + r2.stderr[-2000:]

    lin = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM '{out}/lineage/*.parquet'"
    ).fetchone()
    assert lin == (64, 64)
    spans_docs = duckdb.sql(
        "SELECT count(DISTINCT doc_id) FROM read_parquet("
        f"'{out}/documents_spans/**/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    assert spans_docs == 64
    # per-partition run metrics exist for both runs
    rm = duckdb.sql(
        f"SELECT count(DISTINCT run_id) FROM '{out}/run_metrics/*.parquet'"
    ).fetchone()[0]
    assert rm == 2
