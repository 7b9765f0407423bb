"""Streaming crawl frontier: discovered URLs arrive as a stream (link
extraction, sitemap pings, recrawl feeds), get deduplicated online with
bounded state, robots-gated, and appended to the fetch-schedule sink.

Two-stage shape, mirroring the repo's other streaming operators:

  * **In-stream dedup** — ``dropDuplicatesWithinWatermark(["url"])``
    drops re-discovered URLs whose event times fall within the watermark
    delay (the common case: the same URL found on many pages of one
    crawl round arrives within minutes).  State evicts with the
    watermark, so a long-running discovery stream holds bounded state —
    the same two-tier design as streaming dedup: the online pass removes
    the near-in-time bulk, the periodic batch ``doc_url_dedup`` remains
    the total guarantee.
  * **Per-micro-batch robots gate** — ``foreachBatch`` applies the SAME
    batch ``robots_decisions`` (operators/robots.py) the offline path
    uses, so stream-time and batch-time agree on what "fetchable" means.
    foreachBatch is the right level because the decision is a join +
    struct-max aggregation: on a static micro-batch frame it is the
    plain batch plan; as a stream-level aggregation it would need
    watermark-delayed append output for no benefit.

Idempotence contract (same as streaming/pipeline.py): foreachBatch is
at-least-once — a batch REPLAYS with the same batch_id after a mid-batch
failure — so the sink partitions by run_id=stream-{batch_id} with
DYNAMIC partition overwrite: a replay overwrites exactly its own rows.

100-TB shape: the dedup state shards by url across executors and
evicts; the robots table joins per batch on host exactly as the batch
operator does (AQE picks broadcast when the parsed-robots frame fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.robots import robots_decisions
from .dedup import _require_ltz_event_time


def dedup_url_stream(
    urls_stream: DataFrame,
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """(url, ts, ...) stream -> the same rows minus in-window
    re-discoveries (first arrival per url wins)."""
    _require_ltz_event_time(urls_stream, ts_col)
    return urls_stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["url"]
    )


def make_frontier_batch_processor(
    parsed_robots: DataFrame,
    agent: str,
    frontier_path: str,
):
    """The foreachBatch body, exposed so tests can replay a batch_id:
    gate the micro-batch through batch robots_decisions and append the
    decisions (allowed and not — the blocked rows are the audit trail)
    partitioned by run_id for idempotent replay."""

    def process_batch(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        run_id = f"stream-{batch_id}"
        decided = robots_decisions(
            parsed_robots, batch_df.select("url"), agent
        ).withColumn("run_id", F.lit(run_id))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            decided.write.mode("overwrite").partitionBy("run_id").parquet(
                frontier_path
            )
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )

    return process_batch


def start_frontier_stream(
    urls_stream: DataFrame,
    parsed_robots: DataFrame,
    agent: str,
    frontier_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    delay: str = "30 minutes",
    available_now: bool = False,
):
    """Wire dedup + robots gate into a running query writing the
    decision table under ``frontier_path``."""
    deduped = dedup_url_stream(urls_stream, ts_col=ts_col, delay=delay)
    writer = (
        deduped.writeStream.foreachBatch(
            make_frontier_batch_processor(parsed_robots, agent, frontier_path)
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
