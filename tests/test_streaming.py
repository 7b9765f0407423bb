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


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by the
    stream must equal the batch sessionization result minus each user's
    final (still-open) session."""
    from pyspark.sql import functions as F

    from pdf_extract_spark.queries import events_sessionize
    from pdf_extract_spark.streaming.sessionize import sessionize_stream

    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # several time-ordered files -> several triggers -> the watermark
    # advances between batches and timeout-closing is exercised too
    events.orderBy("ts").coalesce(1).withColumn(
        "part", F.ntile(4).over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("ts"))
    ).write.partitionBy("part").mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(240)

    got = (
        spark.read.parquet(out)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("session_value", 2).alias("session_value"),
        )
    )
    batch = events_sessionize(spark, "/root/testdata/sf0.001")
    # drop each user's final session (still open in the stream's state)
    w_last = (
        batch.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    )
    closed_batch = (
        batch.join(w_last, "user_id")
        .filter(F.col("session_id") != F.col("last_sid"))
        .select("user_id", F.col("n_events").cast("long").alias("n_events"), "session_value")
    )
    all_batch = batch.select(
        "user_id", F.col("n_events").cast("long").alias("n_events"), "session_value"
    )
    # (a) every emitted session is a true batch session (multiset-wise):
    # data-closed ones AND the watermark-timeout-closed final sessions of
    # users who went quiet before stream end
    assert got.exceptAll(all_batch).count() == 0
    # (b) every data-closed (non-final) session was emitted
    assert closed_batch.exceptAll(got).count() == 0
    # (c) the stream emitted at least the data-closed sessions; extras are
    # timeout-closed finals
    assert got.count() >= closed_batch.count()
    assert got.count() > 0
