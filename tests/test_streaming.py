"""Structured Streaming ingest test: file-source stream -> extraction ->
foreachBatch sinks with checkpoint."""

import time

from pyspark.sql import functions as F

from pdf_extract_spark.sources.raw_docs import fixture_corpus_df
from pdf_extract_spark.streaming.pipeline import (
    read_raw_docs_stream,
    start_extraction_stream,
)


def test_streaming_extraction_availablenow(spark, tmp_path):
    src = str(tmp_path / "incoming")
    spans = str(tmp_path / "spans")
    lineage = str(tmp_path / "lineage")
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    raw = fixture_corpus_df(spark, replicas=1)
    n = raw.count()
    raw.write.mode("overwrite").parquet(src)

    stream = read_raw_docs_stream(spark, src, max_files_per_trigger=2)
    q = start_extraction_stream(
        stream, spans, lineage, metrics, ckpt, num_partitions=4, available_now=True
    )
    q.awaitTermination(240)
    assert not q.isActive or q.awaitTermination(60)

    got = spark.read.parquet(spans)
    assert got.select("doc_id").distinct().count() == n
    lin = spark.read.parquet(lineage)
    assert lin.filter(F.col("status") == "ok").count() == n
    met = spark.read.parquet(metrics)
    assert met.count() == n

    # restart on the same checkpoint: no new data -> no duplicate output
    stream2 = read_raw_docs_stream(spark, src)
    q2 = start_extraction_stream(
        stream2, spans, lineage, metrics, ckpt, num_partitions=4, available_now=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(spans).select("doc_id").distinct().count() == n
    assert spark.read.parquet(lineage).count() == n
