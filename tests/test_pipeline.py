"""End-to-end corpus-construction pipeline tests (pdf_extract_spark/pipeline.py):
stage semantics on a crafted corpus, funnel monotonicity on real testdata,
and the spark-submit job wrapper."""

import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from pdf_extract_spark.pipeline import (
    corpus_pipeline,
    exact_dedup_stage,
    funnel_report,
    near_dedup_stage,
    quality_stage,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOOD = ("the quick brown fox likes to jump over lazy dogs and it does that "
        "with great patience because they have nothing better to do today "
        "while the sun shines over the quiet meadow near town")


def _corpus(spark):
    rows = [
        (1, GOOD, "en", "src0"),
        (2, GOOD, "en", "src0"),                      # exact dup of 1
        (3, GOOD + " with one extra trailing clause", "en", "src1"),  # near dup
        (4, "short text", "en", "src1"),              # fails quality
        (5, GOOD.replace("quick", "slow").replace("meadow", "field"),
         "en", "src2"),                               # near dup of 1 (lsh)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_quality_stage_drops_bad_docs(spark):
    out = quality_stage(_corpus(spark)).select("doc_id").collect()
    ids = {r["doc_id"] for r in out}
    assert 4 not in ids and 1 in ids


def test_exact_dedup_keeps_min_doc_id(spark):
    out = exact_dedup_stage(_corpus(spark))
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 2 not in ids        # canonical survives, mirror dies
    assert {3, 4, 5} <= ids                 # non-dups untouched
    assert out.columns == ["doc_id", "text", "lang", "source"]  # helper col dropped


def test_near_dedup_keeps_cluster_canonical(spark):
    docs = _corpus(spark).filter(F.col("doc_id") != 2)
    out = near_dedup_stage(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids                          # cluster canonical
    assert 4 in ids                          # singleton survives
    assert len(ids) < 4                      # at least one near-dup collapsed


def test_corpus_pipeline_funnel_monotone(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # min_stopwords=1: the synthetic corpus' register has only 'the' from
    # the Gopher stopword list, so the default of 2 empties the funnel
    stages = corpus_pipeline(docs, min_stopwords=1, checkpoint_dir=None)
    funnel = funnel_report(stages)
    names = [n for n, _ in funnel]
    assert names == ["ingested", "quality", "exact_dedup", "near_dedup",
                     "decontaminated", "final"]
    counts = [c for _, c in funnel]
    assert counts[0] == 500
    # every stage only removes docs (decontamination also drops the eval slice)
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] > 0
    # schema is preserved end-to-end
    assert stages["final"].columns == docs.columns


@pytest.mark.slow
def test_corpus_job_spark_submit(tmp_path):
    import duckdb

    from tests.conftest import ensure_pyfiles_zip

    zip_path = ensure_pyfiles_zip()
    out = str(tmp_path / "corpus_out")
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "corpus_job.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out, "--run-id", "c1", "--quota-cap", "40",
        "--min-stopwords", "1",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300, cwd=REPO)
    assert "final:" in r.stdout, r.stdout[-500:] + r.stderr[-2000:]

    funnel = dict(
        duckdb.sql(
            f"SELECT stage, n_docs FROM '{out}/funnel/*.parquet'"
        ).fetchall()
    )
    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{out}/corpus/*.parquet'"
    ).fetchone()[0]
    assert funnel["ingested"] == 500
    assert funnel["final"] == n_corpus > 0
    # quota cap binds: no source exceeds 40 docs in the output
    max_per_src = duckdb.sql(
        f"SELECT max(n) FROM (SELECT count(*) AS n FROM '{out}/corpus/*.parquet' "
        "GROUP BY source)"
    ).fetchone()[0]
    assert max_per_src <= 40


def test_corpus_pipeline_redact_pii(spark):
    """redact_pii=True rewrites the final stage's text in place (same doc
    set, PII replaced) via a narrow column expression — no join."""
    from pdf_extract_spark.pipeline import corpus_pipeline, release_stages

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = base.withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" contact me at leak@example.com")),
    )
    stages = corpus_pipeline(docs, min_stopwords=1, redact_pii=True)
    final = stages["final"]
    rows = final.limit(50).collect()
    assert rows, "pipeline dropped everything"
    assert all("<EMAIL>" in r["text"] for r in rows)
    assert all("leak@example.com" not in r["text"] for r in rows)
    # same survivors as the unredacted run
    stages2 = corpus_pipeline(docs, min_stopwords=1)
    a = sorted(r["doc_id"] for r in final.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in stages2["final"].select("doc_id").collect())
    assert a == b
    release_stages(stages)
    release_stages(stages2)


def test_corpus_pipeline_semantic_stage(spark):
    """With an embeddings frame the SemDeDup stage appears between
    near_dedup and decontaminated, equals near minus the pruned ids, and
    docs without an embedding row are never dropped by it."""
    from pdf_extract_spark.operators.semdedup import semantic_dedup
    from pdf_extract_spark.pipeline import release_stages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # hold back embeddings for half the ids: those docs carry no semantic
    # evidence and must pass the stage untouched
    emb_half = emb.filter(F.col("vec_id") < 250)

    stages = corpus_pipeline(docs, min_stopwords=1, embeddings=emb_half)
    names = [n for n, _ in funnel_report(stages)]
    assert names == ["ingested", "quality", "exact_dedup", "near_dedup",
                     "semantic_dedup", "decontaminated", "final"]

    near_ids = {r["doc_id"] for r in stages["near_dedup"].select("doc_id").collect()}
    sem_ids = {r["doc_id"] for r in stages["semantic_dedup"].select("doc_id").collect()}
    dropped = {
        r["vec_id"]
        for r in semantic_dedup(emb_half).filter(~F.col("keep")).collect()
    }
    assert sem_ids == near_ids - dropped
    assert sem_ids < near_ids, "stage should prune something on this corpus"
    # no-embedding docs all survived
    assert {i for i in near_ids if i >= 250} <= sem_ids
    release_stages(stages)


def test_pipeline_temperature_mix_stage(spark):
    """mix_budget engages temperature mixing as the final mix stage:
    the final count lands near the budget and every kept doc passed the
    upstream funnel."""
    from pdf_extract_spark.pipeline import corpus_pipeline, release_stages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stages = corpus_pipeline(docs, min_stopwords=1, mix_budget=100)
    final = stages["final"]
    clean_ids = {r.doc_id for r in stages["decontaminated"].select("doc_id").collect()}
    rows = final.select("doc_id").collect()
    assert {r.doc_id for r in rows} <= clean_ids
    assert 50 <= len(rows) <= 150  # concentration around the budget
    release_stages(stages)


def test_pipeline_fuzzy_and_token_quota_stages(spark):
    """The optional fuzzy-decontamination and token-budget stages: the
    funnel gains a fuzzy_decontaminated stage that can only shrink the
    spine, and the token quota caps every source's kept-token prefix
    (each source's total kept tokens < cap + its largest doc)."""
    from pdf_extract_spark.functions.text import token_count
    from pdf_extract_spark.pipeline import (
        corpus_pipeline,
        funnel_report,
        release_stages,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stages = corpus_pipeline(
        docs, min_stopwords=1, fuzzy_decontaminate=True, token_quota=1500
    )
    try:
        funnel = dict(funnel_report(stages))
        assert "fuzzy_decontaminated" in funnel
        assert funnel["fuzzy_decontaminated"] <= funnel["decontaminated"]
        final = stages["final"].select(
            "source", token_count(F.col("text")).alias("n_tok")
        )
        per_src = {
            r["source"]: r["total"]
            for r in final.groupBy("source")
            .agg(F.sum("n_tok").alias("total"))
            .collect()
        }
        max_doc = final.agg(F.max("n_tok")).collect()[0][0]
        for src, total in per_src.items():
            assert total < 1500 + max_doc, (src, total)
        assert funnel["final"] < funnel["fuzzy_decontaminated"]
    finally:
        release_stages(stages)
