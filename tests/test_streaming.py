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


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same batch_id (the
    post-failure replay) must not duplicate spans/lineage/metrics rows."""
    from pdf_extract_spark.streaming.pipeline import make_batch_processor

    spans = str(tmp_path / "spans")
    lineage = str(tmp_path / "lineage")
    metrics = str(tmp_path / "metrics")
    raw = fixture_corpus_df(spark, replicas=1)
    n = raw.count()

    process = make_batch_processor(spans, lineage, metrics, num_partitions=4)
    process(raw, 7)
    process(raw, 7)  # simulated replay after mid-batch failure

    assert spark.read.parquet(spans).count() == n
    assert spark.read.parquet(lineage).count() == n
    assert spark.read.parquet(metrics).count() == n
    # a DIFFERENT batch id appends (no cross-batch clobbering)
    process(raw.limit(3), 8)
    assert spark.read.parquet(lineage).count() == n + 3


def test_streaming_windowed_event_counts(spark, tmp_path):
    """Watermarked tumbling-window agg over a streamed events table; result
    must match the batch date_trunc rollup."""
    from pyspark.sql import functions as F

    from pdf_extract_spark.streaming.pipeline import windowed_event_counts

    src = str(tmp_path / "events_in")
    out = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "events_ckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(240)

    got = spark.read.parquet(out)
    batch = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    # append mode emits only windows older than the watermark; every
    # emitted window must match the batch rollup exactly
    assert got.count() > 0
    matched = got.alias("g").join(
        batch.alias("b"), ["hour", "event_type"]
    ).filter(F.col("g.n") != F.col("b.n"))
    assert matched.count() == 0
