"""Politeness-aware crawl scheduling: assign every frontier URL a fetch
WAVE such that no wave contains more than ``per_host_cap`` URLs of the
same host — the standard way a distributed fetcher bounds per-host
request rate (each wave is dispatched as one round; a host is hit at
most ``per_host_cap`` times per round regardless of how many of its
URLs are queued).

Semantics (deterministic, engine-portable):

    rank(u)  = 1-based position of u within its host, ordered by
               (md5(url), url) — md5 randomizes the within-host order so
               a host's waves sample its URL space instead of walking it
               lexicographically, and stays bit-identical everywhere
    wave(u)  = (rank - 1) div per_host_cap     (0-based fetch round)
    slot(u)  = (rank - 1) mod per_host_cap     (position inside the round)

100-TB shape: a web frontier's host distribution is extremely skewed
(one host can hold 10^9 URLs), so a plain per-host row_number window
would hand a mega-host's whole rank to ONE task.  This uses the grouped
two-phase distributed prefix rank (same pattern as functions/lm.py's
per-source perplexity rank and the source_quota_cap fix):
range-partition by (host, md5, url) -> rank locally within (physical
partition, host) -- fully parallel even inside one host -- then an
exclusive per-host prefix over the (partition x host) COUNT frame (tiny:
P rows per host, not the frontier) broadcast back.  No corpus-sized
window partition anywhere; the localCheckpoint pins the sampled range
boundaries so the local-rank and count branches read one materialized
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch_waves(
    frontier: DataFrame,
    per_host_cap: int = 4,
    url_col: str = "url",
    host_col: str = "host",
    num_parts: int | None = None,
) -> DataFrame:
    """(url, host) -> (url, host, host_rank, wave, slot)."""
    spark = frontier.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # rank over an internal NEVER-NULL host key (null flag + coalesced
    # string): window PARTITION BY groups NULL hosts together, but the
    # null-unsafe equi-join back would silently DROP them — same guard
    # as functions/lm.py's per-source rank
    hk = F.struct(
        F.col(host_col).isNull().alias("n"),
        F.coalesce(F.col(host_col).cast("string"), F.lit("")).alias("k"),
    )
    d = (
        frontier.select(
            F.col(url_col).alias("url"), F.col(host_col).alias("host")
        )
        .withColumn("__hk", hk)
        .withColumn("ord", F.md5(F.encode(F.col("url"), "utf-8")))
        .repartitionByRange(parts, "__hk", "ord", "url")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("pid", "__hk").orderBy("ord", "url")
    local = d.withColumn("local_rn", F.row_number().over(w_local))
    counts = d.groupBy("pid", "__hk").agg(F.count(F.lit(1)).alias("pcnt"))
    w_off = (
        Window.partitionBy("__hk")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "poffset", F.coalesce(F.sum("pcnt").over(w_off), F.lit(0)).cast("long")
    )
    ranked = local.join(
        F.broadcast(offsets.select("pid", "__hk", "poffset")), ["pid", "__hk"]
    ).withColumn("host_rank", (F.col("local_rn") + F.col("poffset")).cast("long"))
    return ranked.select(
        "url",
        "host",
        "host_rank",
        F.expr(f"(host_rank - 1) div {int(per_host_cap)}").alias("wave"),
        ((F.col("host_rank") - 1) % per_host_cap).cast("long").alias("slot"),
    )


def fetch_schedule(
    parsed_robots: DataFrame,
    frontier: DataFrame,
    agent: str,
    per_host_cap: int = 4,
    default_delay_s: float = 1.0,
) -> DataFrame:
    """The full politeness schedule: robots-allowed frontier URLs fanned
    into fetch waves, each wave timed by the host's effective
    Crawl-delay — (url, host, host_rank, wave, slot, crawl_delay,
    fetch_offset_s) where ``fetch_offset_s = wave * crawl_delay`` is the
    earliest dispatch time relative to the host's first fetch.

    Composes the WHAT gate (robots_decisions), the WHEN fan-out
    (fetch_waves), and the HOW-FAST directive (effective_crawl_delay,
    defaulting to ``default_delay_s`` for hosts that declare none).  The
    delay table is one row per delay-declaring host — joined after the
    wave assignment so the equi-join is on the already-ranked frame and
    AQE broadcasts it whenever it fits.
    """
    from .robots import effective_crawl_delay, robots_decisions

    allowed = (
        robots_decisions(parsed_robots, frontier, agent)
        .where(F.col("allowed"))
        .select("url", "host")
    )
    waves = fetch_waves(allowed, per_host_cap=per_host_cap)
    delays = effective_crawl_delay(parsed_robots, agent)
    return (
        waves.join(delays, "host", "left")
        .withColumn(
            "crawl_delay",
            F.coalesce("crawl_delay", F.lit(float(default_delay_s))),
        )
        .withColumn(
            "fetch_offset_s", F.col("wave") * F.col("crawl_delay")
        )
        .select(
            "url", "host", "host_rank", "wave", "slot",
            "crawl_delay", "fetch_offset_s",
        )
    )


def wave_profile(waves: DataFrame) -> DataFrame:
    """Fetch-round load profile: per wave, how many URLs ship and how
    many hosts participate — the dispatcher's capacity-planning view.
    One map-side-combined groupBy on the tiny wave key."""
    return waves.groupBy("wave").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.max("slot").cast("long").alias("max_slot"),
    )
