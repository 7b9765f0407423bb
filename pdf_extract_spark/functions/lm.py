"""Count-based n-gram language-model perplexity scoring (CCNet-style).

After the rule filters (Gopher, repetition) the standard web-corpus
quality signal is perplexity under a small LM trained on a trusted
slice — the CCNet recipe (Wenzek et al., 2019).  This module is the
count-based bigram variant, entirely in DataFrame ops:

  train:  bigram counts + context (bigram-prefix) counts over the
          reference slice — two groupBy shuffles, map-side combined;
          vocabulary size stays a one-row frame cross-joined with a
          broadcast hint, never collected to the driver
  score:  explode every doc into bigrams, equi-join the two count
          tables, add-one smoothing over the reference vocabulary,
          quantize per-bigram bits to an int (floor(x*1000), the house
          rule for cross-engine value-hash stability), then ONE per-doc
          aggregation

Scale notes (100 TB): the doc-bigram ⋈ LM-bigram join hash-partitions
on (w1, w2) — fine-grained keys; residual hot-token skew ("of the") is
AQE skew-join territory, not a single-reducer design flaw.  The context
count table is vocabulary-sized (10^6-10^8 rows for web text) and is
deliberately left to AQE's broadcast threshold rather than forced: at
real vocab sizes a forced driver-side broadcast is the OOM, not the
win.  Docs with fewer than two tokens have no bigram evidence and are
excluded from the output (documented contract; a caller keeps them with
a left join on the input spine).

Quantization contract: bits are per-transition
``floor(-log2((c_bg + 1) / (c_ctx + V)) * 1000)`` summed as BIGINTs, so
the only float op is one log2 per distinct join row — sums are exact
integer arithmetic and hash identically across engines regardless of
summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ltoks(col: Column) -> Column:
    """Lowercased whitespace token array (same split as functions.text)."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def _bigram_frame(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair.  Docs with a
    single token produce no rows (slice length 0 explodes to nothing)."""
    return (
        docs.select("doc_id", _ltoks(F.col(text_col)).alias("ts"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                    " (w, i) -> struct(w AS w1, element_at(ts, i + 2) AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )


def lm_perplexity(
    docs: DataFrame, ref_filter: Column, text_col: str = "text"
) -> DataFrame:
    """Score every doc's mean bigram surprisal under an add-one-smoothed
    bigram LM trained on ``docs.filter(ref_filter)``.

    Returns (doc_id, n_bigrams, sum_bits_x1000, avg_bits_x1000); higher
    avg bits = less reference-like = the CCNet "tail" a pipeline drops
    or down-samples.
    """
    ref_bg = _bigram_frame(docs.filter(ref_filter), text_col)
    # checkpointed: bigram-vocabulary-sized (never corpus-sized), and it
    # feeds both the bigram join and the context counts below — without
    # the cut the reference-slice bigram explode ran once per consumer
    bg_counts = (
        ref_bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bg"))
        .localCheckpoint(eager=True)
    )
    # context counts DERIVE from the bigram counts (c_ctx(w1) = Σ_w2
    # c_bg(w1, w2) — every bigram occurrence is one context occurrence):
    # same values, one reference-slice pass saved
    ctx_counts = bg_counts.groupBy("w1").agg(
        F.sum("c_bg").cast("long").alias("c_ctx")
    )
    vocab = (
        docs.filter(ref_filter)
        .select(F.explode(_ltoks(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    scored = (
        _bigram_frame(docs, text_col)
        .join(bg_counts, ["w1", "w2"], "left")
        .join(ctx_counts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "bits_x1000",
            F.floor(
                -F.log2(
                    (F.coalesce(F.col("c_bg"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.col("v"))
                )
                * 1000
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("bits_x1000").cast("long").alias("sum_bits_x1000"),
        )
        .withColumn("avg_bits_x1000", F.expr("sum_bits_x1000 DIV n_bigrams"))
    )


def ppl_buckets(
    docs: DataFrame,
    ref_filter: Column,
    text_col: str = "text",
    key_col: str = "source",
    num_parts: int | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al., 2019): rank every
    doc within its source by LM surprisal and cut the ranking into
    exact thirds — 'head' is the most reference-like slice a pipeline
    keeps outright, 'tail' the slice it drops or down-samples.

    Returns (doc_id, source, avg_bits_x1000, ppl_rank, bucket) for every
    doc with bigram evidence (docs with <2 tokens inherit
    lm_perplexity's documented exclusion).  Bucket boundaries are
    rank-based, not value-threshold-based — ``(3*(rank-1)) DIV count``
    over the (avg_bits, doc_id) total order — so the split is exact
    integer arithmetic, engine-portable, and always a true 1/3 cut even
    when surprisal values tie.

    Scale shape — the per-source ranking is the same skewed-stratum
    hazard as source_quota_cap (one source can be >50% of a web
    corpus), and unlike the quota it needs EVERY doc's rank, so the
    bounded two-phase trick doesn't apply.  Instead this is the grouped
    form of pack.py's distributed prefix sum: range-partition by
    (source, avg_bits, doc_id); rank locally within (physical
    partition, source) — fully parallel; per-(partition, source) counts
    (a P x n_sources frame, not the corpus) get an exclusive per-source
    prefix over pid plus per-source totals; broadcast both back and
    add.  No corpus-sized window partition anywhere; the checkpoint
    pins the sampled range boundaries so both branches read one
    materialized partitioning (same rationale documented in pack.py)."""
    spark = docs.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ppl = lm_perplexity(docs, ref_filter, text_col).select(
        "doc_id", "avg_bits_x1000"
    )
    # rank over an internal NEVER-NULL grouping key: window PARTITION BY
    # treats NULL sources as one group (matching the SQL oracle), but a
    # null-unsafe equi-join on the raw key would silently drop them — the
    # joins below therefore run on __gk (null flag + coalesced string,
    # collision-free by construction) and the raw key rides along
    gk = F.struct(
        F.col(key_col).isNull().alias("n"),
        F.coalesce(F.col(key_col).cast("string"), F.lit("")).alias("k"),
    )
    d = (
        docs.select("doc_id", key_col)
        .join(ppl, "doc_id")
        .withColumn("__gk", gk)
        .repartitionByRange(parts, "__gk", "avg_bits_x1000", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("pid", "__gk").orderBy("avg_bits_x1000", "doc_id")
    local = d.withColumn("local_rn", F.row_number().over(w_local))
    counts = d.groupBy("pid", "__gk").agg(F.count(F.lit(1)).alias("pcnt"))
    w_off = (
        Window.partitionBy("__gk")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "poffset", F.coalesce(F.sum("pcnt").over(w_off), F.lit(0)).cast("long")
    )
    totals = counts.groupBy("__gk").agg(F.sum("pcnt").cast("long").alias("scnt"))
    return (
        local.join(
            F.broadcast(offsets.select("pid", "__gk", "poffset")), ["pid", "__gk"]
        )
        .join(F.broadcast(totals), "__gk")
        .withColumn("ppl_rank", (F.col("local_rn") + F.col("poffset")).cast("long"))
        .withColumn(
            "bucket",
            F.when(F.expr("(3 * (ppl_rank - 1)) DIV scnt") == 0, "head")
            .when(F.expr("(3 * (ppl_rank - 1)) DIV scnt") == 1, "middle")
            .otherwise("tail"),
        )
        .select("doc_id", key_col, "avg_bits_x1000", "ppl_rank", "bucket")
    )


def _trigram_frame(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2, w3) — one row per adjacent token triple."""
    return (
        docs.select("doc_id", _ltoks(F.col(text_col)).alias("ts"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(ts, 1, greatest(size(ts) - 2, 0)),"
                    " (w, i) -> struct(w AS w1, element_at(ts, i + 2) AS w2,"
                    " element_at(ts, i + 3) AS w3))"
                )
            ).alias("tg"),
        )
        .select("doc_id", "tg.w1", "tg.w2", "tg.w3")
    )


def lm_trigram_perplexity(
    docs: DataFrame, ref_filter: Column, text_col: str = "text"
) -> DataFrame:
    """Trigram extension of lm_perplexity: mean trigram surprisal under
    an add-one-smoothed trigram LM trained on the reference slice,
    context = the (w1, w2) bigram.  Returns (doc_id, n_trigrams,
    sum_bits_x1000, avg_bits_x1000); docs with <3 tokens are excluded
    (the documented <2-token contract, one order higher).

    Same scale shape as the bigram module: the doc-trigram ⋈ LM-trigram
    join hash-partitions on (w1, w2, w3) — finer keys than the bigram's,
    so hot-phrase skew is milder; the context table is bigram-sized and
    stays AQE-decided, never force-broadcast.  Same integer-quantization
    contract: floor(bits * 1000) at the leaf, BIGINT sums."""
    ref_tg = _trigram_frame(docs.filter(ref_filter), text_col)
    tg_counts = ref_tg.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c_tg"))
    ctx_counts = ref_tg.groupBy("w1", "w2").agg(F.count("*").alias("c_ctx"))
    vocab = (
        docs.filter(ref_filter)
        .select(F.explode(_ltoks(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    scored = (
        _trigram_frame(docs, text_col)
        .join(tg_counts, ["w1", "w2", "w3"], "left")
        .join(ctx_counts, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "bits_x1000",
            F.floor(
                -F.log2(
                    (F.coalesce(F.col("c_tg"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.col("v"))
                )
                * 1000
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.sum("bits_x1000").cast("long").alias("sum_bits_x1000"),
        )
        .withColumn("avg_bits_x1000", F.expr("sum_bits_x1000 DIV n_trigrams"))
    )
