import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extract_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def ensure_pyfiles_zip() -> str:
    """Build (or rebuild) dist/pdf_extract_spark.zip when any package
    source is newer than the zip — a stale zip silently tests old code.
    Returns the zip path.  Shared by every spark-submit test."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(repo, "dist", "pdf_extract_spark.zip")
    newest_src = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(os.path.join(repo, "pdf_extract_spark"))
        for f in files if f.endswith(".py")
    )
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest_src:
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "package_pyfiles.py")],
            check=True, timeout=120,
        )
    return zip_path
