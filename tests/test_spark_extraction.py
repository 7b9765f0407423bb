"""Spark-side extraction pipeline tests: distributed correctness, resume,
lineage/metrics, sink layout."""

from pyspark.sql import functions as F

from pdf_extract_spark.operators.extraction import (
    extract_documents,
    lineage_rows,
    metrics_rows,
    resume_filter,
    run_metrics,
)
from pdf_extract_spark.sources.raw_docs import (
    fixture_corpus_df,
    golden_spans_df,
    read_spans,
    write_spans,
)


def test_extract_matches_goldens(spark):
    raw = fixture_corpus_df(spark, replicas=3)
    out = extract_documents(raw, num_partitions=8).cache()
    assert out.filter(F.col("error").isNotNull()).count() == 0

    # span-sequence equality (kind, text, media_ref, order) vs goldens.
    # goldens derive from expected text, so media spans are excluded.
    got = out.select(
        "doc_id",
        F.expr("filter(spans, s -> s.kind != 'media')").alias("spans"),
    )
    golden = golden_spans_df(spark, replicas=3)
    joined = got.alias("g").join(golden.alias("x"), "doc_id", "inner")
    n = golden.count()
    assert joined.count() == n
    mismatched = joined.filter(F.col("g.spans") != F.col("x.spans"))
    rows = mismatched.limit(3).collect()
    assert not rows, f"span mismatch e.g. {rows[0]['doc_id'] if rows else ''}"


def test_extract_reducer_text_parity(spark):
    """spans -> text via SQL (no Python) equals the fixture expected text."""
    from pdf_extract_spark.fixtures import corpus

    raw = fixture_corpus_df(spark, replicas=1)
    out = extract_documents(raw, num_partitions=4)
    texts = {
        r["doc_id"]: r["txt"]
        for r in out.select(
            "doc_id",
            F.array_join(
                F.expr("transform(filter(spans, s -> s.kind != 'media'), s -> s.text)"),
                "\n",
            ).alias("txt"),
        ).collect()
    }
    for doc_id, _pdf, expected in corpus(1):
        assert texts[doc_id] == expected, doc_id


def test_giant_path_and_union(spark):
    raw = fixture_corpus_df(spark, replicas=1)
    # force some docs down the giant path with a tiny threshold
    out = extract_documents(raw, num_partitions=4, giant_threshold=900)
    assert out.count() == raw.count()
    assert out.filter(F.col("error").isNotNull()).count() == 0


def test_resume_anti_join(spark):
    raw = fixture_corpus_df(spark, replicas=1)
    out = extract_documents(raw, num_partitions=4)
    lin = lineage_rows(out, run_id="r1").cache()
    assert lin.filter(F.col("status") != "ok").count() == 0
    # resume with half the lineage: only the other half remains
    half = lin.limit(8)
    remaining = resume_filter(raw, half)
    assert remaining.count() == raw.count() - 8
    # full lineage -> nothing left
    assert resume_filter(raw, lin).count() == 0


def test_metrics(spark):
    raw = fixture_corpus_df(spark, replicas=2)
    out = extract_documents(raw, num_partitions=4).cache()
    m = metrics_rows(out)
    assert m.filter(F.col("pages") < 1).count() == 0
    agg = run_metrics(out, "r1").agg(
        F.sum("docs").alias("docs"), F.sum("decode_failures").alias("df")
    ).collect()[0]
    assert agg["docs"] == raw.count()
    assert agg["df"] == 0


def test_corrupt_doc_is_metric_not_failure(spark):
    rows = [("bad-1", b"%PDF-1.4 garbage", 16, "junk"), ("bad-2", b"", 0, "junk")]
    raw = spark.createDataFrame(rows, "doc_id string, content binary, byte_len long, source string")
    out = extract_documents(raw, num_partitions=2).cache()
    assert out.count() == 2
    assert out.filter(F.col("decode_failures") == 1).count() == 2


def test_spans_sink_bucketed(spark, tmp_path):
    raw = fixture_corpus_df(spark, replicas=1)
    out = extract_documents(raw, num_partitions=4).select("doc_id", "spans")
    path = str(tmp_path / "documents_spans")
    write_spans(out, path, buckets=8, mode="overwrite")
    back = read_spans(spark, path)
    assert back.count() == raw.count()
    assert set(back.columns) == {"doc_id", "spans"}
    # bucket pruning layout exists
    import os

    assert any(d.startswith("bucket=") for d in os.listdir(path))


def test_paged_extraction_matches_by_pages(spark):
    """Page-exploded operator == per-doc by-pages API output."""
    from pdf_extract_spark.extract import extract_spans_by_pages
    from pdf_extract_spark.fixtures import corpus
    from pdf_extract_spark.operators.extraction import (
        extract_documents_paged,
        reassemble_doc_spans,
    )

    raw = fixture_corpus_df(spark, replicas=1)
    paged = extract_documents_paged(raw, pages_per_task=1, num_partitions=4).cache()
    got = {
        (r["doc_id"], r["page_num"]): [tuple(s) for s in r["spans"]]
        for r in paged.collect()
    }
    for doc_id, pdf, _exp in corpus(1):
        pages = extract_spans_by_pages(pdf)
        assert len([k for k in got if k[0] == doc_id]) == len(pages)
        for i, spans in enumerate(pages, start=1):
            expect = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
            assert got[(doc_id, i)] == expect, (doc_id, i)
    # reassembly: one row per doc, spans in page order
    whole = reassemble_doc_spans(paged)
    assert whole.count() == raw.count()


def test_extract_metadata(spark):
    from pdf_extract_spark.operators.extraction import extract_metadata

    raw = fixture_corpus_df(spark, replicas=1)
    m = {r["doc_id"]: r for r in extract_metadata(raw, num_partitions=4).collect()}
    assert m["multipage-000000"]["page_count"] == 2
    assert m["simple_tj-000000"]["version"].startswith("1.")
    assert all(r["error"] is None for r in m.values())
