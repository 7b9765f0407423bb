"""Streaming ingest job — the Structured Streaming spark-submit entry:
a landing directory of raw-document parquet in, the SAME
documents_spans / lineage / metrics contract out, continuously.

Modes (--mode):
  extract   readStream over --input -> Arrow-batched extraction ->
            idempotent foreachBatch sinks (run_id-partitioned dynamic
            overwrite: a replayed batch_id rewrites its own partition)
            under --output, checkpointed at --output/ckpt
  captions  interleaved span stream (doc_id, pos, kind, text,
            media_ref, ts) -> stateful caption alignment
            (streaming/captions.py: per-doc buffers closed by
            event-time timeout) -> --output/captions

--available-now (default) drains everything currently in the source
and stops — the batch-shaped invocation a scheduler uses; drop it for
a continuously-running query (micro-batches as files land).

Usage (local sandbox):
    python tools/package_pyfiles.py
    spark-submit --master local[8] \
        --py-files dist/pdf_extract_spark.zip \
        jobs/stream_job.py --mode extract \
        --input /data/incoming --output /tmp/stream_out
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["extract", "captions"],
                   default="extract")
    p.add_argument("--input", required=True,
                   help="landing dir of parquet files (raw docs for "
                        "extract mode; spans for captions mode)")
    p.add_argument("--output", required=True)
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--gap-seconds", type=int, default=300,
                   help="captions mode: quiet-doc close gap")
    p.add_argument("--watermark", default="10 minutes")
    p.add_argument("--available-now", action="store_true", default=True)
    p.add_argument("--continuous", dest="available_now",
                   action="store_false",
                   help="keep the query running instead of drain-and-stop")
    p.add_argument("--timeout-sec", type=int, default=600,
                   help="awaitTermination bound for available-now runs")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "pdf_extract_spark.stream"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.mode == "extract":
        from pdf_extract_spark.streaming.pipeline import (
            read_raw_docs_stream,
            start_extraction_stream,
        )

        stream = read_raw_docs_stream(
            spark, args.input,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        q = start_extraction_stream(
            stream,
            f"{args.output}/documents_spans",
            f"{args.output}/lineage",
            f"{args.output}/metrics",
            f"{args.output}/ckpt",
            num_partitions=args.num_partitions,
            available_now=args.available_now,
        )
    else:
        from pdf_extract_spark.streaming.captions import caption_stream

        stream = spark.readStream.schema(
            "doc_id string, pos long, kind string, text string, "
            "media_ref string, ts timestamp"
        ).parquet(args.input)
        writer = (
            caption_stream(
                stream,
                gap_seconds=args.gap_seconds,
                watermark=args.watermark,
            )
            .writeStream.format("parquet")
            .option("path", f"{args.output}/captions")
            .option("checkpointLocation", f"{args.output}/ckpt")
        )
        # trigger(availableNow=False) raises in pyspark — only set the
        # trigger for the drain-and-stop mode (same guard as
        # streaming/pipeline.py's extract path)
        if args.available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()

    if args.available_now:
        done = q.awaitTermination(args.timeout_sec)
        if not done:
            # a partial drain must NOT report success: stop the query
            # and exit nonzero so a scheduler retries
            q.stop()
            spark.stop()
            raise SystemExit(
                f"[stream_job] TIMEOUT after {args.timeout_sec}s with the "
                f"drain incomplete (mode={args.mode})"
            )
        print(f"[stream_job] drained mode={args.mode} -> {args.output}")
        spark.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main(sys.argv[1:])
