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


@pytest.mark.slow
def test_spark_submit_media_job(tmp_path):
    """jobs/media_job.py end-to-end over the synthetic oracled corpus:
    hashes + fingerprints + both near-dup pair sets + metrics, via
    --py-files packaging."""
    from tests.conftest import ensure_pyfiles_zip

    zip_path = ensure_pyfiles_zip()
    out = str(tmp_path / "media_out")
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "media_job.py"),
        "--input", "synthetic", "--output", out, "--run-id", "t1",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    # expected counts derive from the corpus source so fixture additions
    # (e.g. new fuzz payloads) can't silently go missing from the job
    from pdf_extract_spark.sources.media_corpus import (
        audio_plant_rows,
        dhash_plant_rows,
        synthetic_media_rows,
    )

    corpus = synthetic_media_rows() + dhash_plant_rows() + audio_plant_rows()
    n_img = sum(1 for r in corpus if r[1] == "image")
    n_aud = sum(1 for r in corpus if r[1] == "audio")
    m = dict(con.execute(
        f"SELECT stage, n_rows FROM '{out}/metrics/*.parquet'"
    ).fetchall())
    assert m["image_hashes"] == n_img and m["audio_fps"] == n_aud
    stubs = dict(con.execute(
        f"SELECT stage, n_stub FROM '{out}/metrics/*.parquet'"
    ).fetchall())
    # the 4 hand-written VP8L fuzz payloads joined the stub tier in r6
    assert stubs["image_hashes"] == 13 and stubs["audio_fps"] == 3
    # the planted near-dups surface in the written pair sets
    img = con.execute(
        f"SELECT count(*) FROM '{out}/image_pairs/*.parquet' "
        "WHERE media_a = 'png-gray-11x7' AND media_b LIKE 'png-gray-11x7-nd%'"
    ).fetchone()[0]
    aud = con.execute(
        f"SELECT count(*) FROM '{out}/audio_pairs/*.parquet' "
        "WHERE media_b LIKE 'wav-steps-mono-nd%'"
    ).fetchone()[0]
    assert img == 3 and aud >= 3


@pytest.mark.slow
def test_spark_submit_warc_input_mode(tmp_path):
    """extract_job --input warc:synthetic: crawl containers through the
    SAME documents_spans/lineage/metrics contract; resume is a no-op
    second run."""
    from tests.conftest import ensure_pyfiles_zip

    ensure_pyfiles_zip()
    out = str(tmp_path / "warc_out")
    r = _submit(["--input", "warc:synthetic", "--output", out,
                 "--run-id", "w1"])
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    # 12 html responses in warc-full + 7 in the truncated copy + the
    # truncated archive's error row (empty spans, like failed PDFs) + 4
    # skipped-record audit rows (warcinfo x2 archives, request, non-HTML
    # response — record-level accounting, zero spans, zero failures)
    n = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM '{out}/documents_spans/**/*.parquet'"
    ).fetchone()[0]
    assert n == 24
    # 19 extracted + 1 failed (truncated tail) + 4 skipped (non-HTML /
    # request / warcinfo records surface in lineage but are neither ok
    # nor retryable failures)
    ln = dict(con.execute(
        f"SELECT status, count(*) FROM '{out}/lineage/*.parquet' GROUP BY 1"
    ).fetchall())
    assert ln == {"ok": 19, "failed": 1, "skipped": 4}
    df = con.execute(
        f"SELECT sum(decode_failures) FROM '{out}/metrics/*.parquet'"
    ).fetchone()[0]
    assert df == 1
    # skipped rows carry no decode failure and no spans
    sk = con.execute(
        f"SELECT count(*) FROM '{out}/metrics/*.parquet' "
        "WHERE doc_id LIKE '%#skip%' AND spans = 0 AND decode_failures = 0"
    ).fetchone()[0]
    assert sk == 4
    # resume: ok docs are NOT redone; skipped records are deterministic
    # and NOT re-emitted; the failed row is retried (the PDF path's
    # failure-retry semantic) and fails again
    r2 = _submit(["--input", "warc:synthetic", "--output", out,
                  "--run-id", "w2", "--resume"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    ln2 = dict(con.execute(
        f"SELECT status, count(*) FROM '{out}/lineage/*.parquet' GROUP BY 1"
    ).fetchall())
    assert ln2 == {"ok": 19, "failed": 2, "skipped": 4}


@pytest.mark.slow
def test_spark_submit_web_job(tmp_path):
    """jobs/web_job.py end-to-end over the fixture HTML corpus: blocks +
    content + link graph + both fixed-point scores + metrics, via
    --py-files packaging; block rows and edge rows must equal the
    oracled registry entries' counts."""
    from tests.conftest import ensure_pyfiles_zip

    zip_path = ensure_pyfiles_zip()
    out = str(tmp_path / "web_out")
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "web_job.py"),
        "--input", "fixture", "--output", out, "--run-id", "t1",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    m = dict(con.execute(
        f"SELECT stage, n_rows FROM '{out}/metrics/*.parquet'"
    ).fetchall())
    # 24 pages -> every page has at least one block; scores cover every
    # graph node; content exists only for pages with content blocks
    assert m["blocks"] >= 24 and m["content"] >= 1
    assert m["edges"] >= 1 and m["pagerank"] == m["hits"]
    # host-level rank covers every host with a cross-host edge; mass
    # conserves up to floor losses
    assert m["hostrank"] >= 2
    htot, hn = con.execute(
        f"SELECT sum(rank_e12), count(*) FROM '{out}/hostrank/*.parquet'"
    ).fetchone()
    assert 0 <= 10**12 - htot < 400 * hn
    # content stage: block_ord order is preserved in the joined text
    row = con.execute(
        f"SELECT content_text, n_content_blocks FROM '{out}/content/*.parquet' "
        "ORDER BY n_content_blocks DESC LIMIT 1"
    ).fetchone()
    assert row[1] >= 2 and "\n" in row[0]
    # pagerank mass conservation (fixed-point BIGINT: floor losses only)
    tot, n = con.execute(
        f"SELECT sum(rank_e12), count(*) FROM '{out}/pagerank/*.parquet'"
    ).fetchone()
    assert 0 <= 10**12 - tot < 400 * n
    # crawl gate: frontier rows = robots-allowed graph nodes (n_extra),
    # every wave respects the per-host cap of 2
    assert m["frontier"] >= 1
    over = con.execute(
        f"SELECT count(*) FROM (SELECT host, wave, count(*) c "
        f"FROM '{out}/frontier/*.parquet' GROUP BY host, wave) WHERE c > 2"
    ).fetchone()[0]
    assert over == 0
    # language ID covers every content page and predicts a known code
    assert m["langid"] == m["content"]
    langs = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT lang_pred FROM '{out}/langid/*.parquet'"
        ).fetchall()
    }
    assert langs <= {"de", "en", "es", "fr", "zh", "und"}
    # caption mining over the html_main interleaved spans: the fixture
    # corpus carries media spans, so pairs must exist and every caption
    # respects the >=1-word gate
    caps = con.execute(
        f"SELECT count(*), min(caption_words) FROM '{out}/captions/*.parquet'"
    ).fetchone()
    assert caps[0] >= 1 and caps[1] >= 1


@pytest.mark.slow
def test_spark_submit_wet_input_mode(tmp_path):
    """extract_job --input wet:synthetic: WET (conversion-record) text
    archives through the same contract — 20 conversion records land as
    one-text-span docs, the warcinfo record as a skipped audit row."""
    from tests.conftest import ensure_pyfiles_zip

    ensure_pyfiles_zip()
    out = str(tmp_path / "wet_out")
    r = _submit(["--input", "wet:synthetic", "--output", out,
                 "--run-id", "wet1"])
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    ln = dict(con.execute(
        f"SELECT status, count(*) FROM '{out}/lineage/*.parquet' GROUP BY 1"
    ).fetchall())
    assert ln == {"ok": 20, "skipped": 1}
    # every ok doc carries exactly one text span with the body verbatim
    row = con.execute(
        f"SELECT min(len(spans)), max(len(spans)) "
        f"FROM '{out}/documents_spans/**/*.parquet' "
        "WHERE doc_id NOT LIKE '%#skip%'"
    ).fetchone()
    assert row == (1, 1)
    one = con.execute(
        f"SELECT spans[1].text FROM '{out}/documents_spans/**/*.parquet' "
        "WHERE doc_id = 'wet-synthetic#3'"
    ).fetchone()[0]
    assert one.startswith("synthetic wet document 2 body text")


@pytest.mark.slow
def test_spark_submit_tokenize_job(tmp_path):
    """jobs/tokenize_job.py end-to-end (bpe mode) over sf0.001
    documents: vocab + counts + pack + shards via --py-files; the pack
    chunk layout must satisfy the seq_len invariant and the shard split
    must be balanced and total-preserving."""
    from tests.conftest import ensure_pyfiles_zip

    ensure_pyfiles_zip()
    out = str(tmp_path / "tok_out")
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", os.path.join(REPO, "dist", "pdf_extract_spark.zip"),
        os.path.join(REPO, "jobs", "tokenize_job.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out, "--run-id", "tok1",
        "--tokenizer", "bpe", "--num-merges", "8",
        "--seq-len", "256", "--n-shards", "4",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                       cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    nv = con.execute(f"SELECT count(*) FROM '{out}/vocab/*.parquet'").fetchone()[0]
    assert 1 <= nv <= 8
    nd = con.execute(
        f"SELECT count(*) FROM '{out}/counts/*.parquet'"
    ).fetchone()[0]
    assert nd == 500
    # every full chunk sums to exactly seq_len tokens
    bad = con.execute(
        f"""SELECT count(*) FROM (
              SELECT chunk_id, sum(n_toks) s FROM '{out}/pack/*.parquet'
              GROUP BY chunk_id
            ) WHERE s > 256 OR (s < 256 AND chunk_id <
              (SELECT max(chunk_id) FROM '{out}/pack/*.parquet'))"""
    ).fetchone()[0]
    assert bad == 0
    shards = con.execute(
        f"SELECT shard, count(*) FROM '{out}/shards/*.parquet' GROUP BY 1"
    ).fetchall()
    assert len(shards) == 4 and sum(n for _, n in shards) == 500
    assert max(n for _, n in shards) - min(n for _, n in shards) <= 1


@pytest.mark.slow
def test_spark_submit_stream_job(tmp_path):
    """jobs/stream_job.py --mode extract via spark-submit --py-files:
    drains the landing dir with availableNow; the lineage/metrics
    contract matches the batch extract_job's; a second run on the same
    checkpoint reprocesses nothing."""
    from tests.conftest import ensure_pyfiles_zip

    ensure_pyfiles_zip()
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "stream_out")

    # stage the fixture corpus as the landing directory (driver-side
    # write through a tiny local session-free path: reuse extract_job's
    # synthetic mode is batch-only, so write with a helper session)
    import subprocess

    stage = subprocess.run(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r);\n"
            "from pyspark.sql import SparkSession\n"
            "from pdf_extract_spark.sources.raw_docs import fixture_corpus_df\n"
            "spark = (SparkSession.builder.master('local[2]')"
            ".config('spark.ui.enabled','false').getOrCreate())\n"
            "fixture_corpus_df(spark, replicas=1).write.mode('overwrite')"
            ".parquet(%r)\n"
            "spark.stop()\n"
        ) % (REPO, src)],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert stage.returncode == 0, stage.stderr[-2000:]

    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", os.path.join(REPO, "dist", "pdf_extract_spark.zip"),
        os.path.join(REPO, "jobs", "stream_job.py"),
        "--mode", "extract", "--input", src, "--output", out,
        "--num-partitions", "4", "--timeout-sec", "240",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]

    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM '{out}/lineage/**/*.parquet'"
    ).fetchone()[0]
    assert n >= 29  # one per fixture family
    ok = con.execute(
        f"SELECT count(*) FROM '{out}/lineage/**/*.parquet' "
        "WHERE status='ok'"
    ).fetchone()[0]
    assert ok == n
    # re-run on the same checkpoint: no new input -> no duplicate rows
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                        cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-3000:]
    n2 = con.execute(
        f"SELECT count(*) FROM '{out}/lineage/**/*.parquet'"
    ).fetchone()[0]
    assert n2 == n
