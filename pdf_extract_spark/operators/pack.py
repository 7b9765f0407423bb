"""GPT-style sequence packing: concat-and-chunk shard map.

Pretraining consumes the corpus as one long token stream — documents
concatenated in a deterministic order with an EOS token after each,
sliced into fixed-length training chunks.  This operator emits the
*shard map* for that stream: for every (doc, chunk) overlap, the exact
token ranges a trainer needs to assemble packed batches without ever
materializing the concatenated stream itself.

The crux at scale is the global running token offset.  The naive
``sum(n_tok).over(Window.orderBy("doc_id"))`` funnels all 10^12 rows
through ONE window partition — the exact single-task collapse the
source-quota de-skew removed elsewhere.  Instead this is the classic
two-phase distributed prefix sum:

  1. range-repartition by doc_id into P ordered partitions; local
     cumulative sum per partition (window PARTITIONED BY the physical
     partition id — fully parallel);
  2. per-partition totals (P rows, one per partition) get their
     exclusive prefix sum on a single task — deliberate and bounded:
     the frame is P rows, not the corpus;
  3. broadcast-join the P offsets back and add.

Partition-id pin: step 1's frame is checkpointed (reliable
``checkpoint`` when a ``checkpoint_dir`` is given — the 1000-executor
setting, where a lost executor mid-job must not re-sample range
boundaries — else ``localCheckpoint``) so the local-cumsum branch and
the totals branch read the SAME materialized partitioning; without the
pin a recomputation could re-sample range boundaries and tear the
offset map.  The emitted map is partition-count invariant (tested):
offsets depend only on doc_id order, never on where the cuts fall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    num_parts: int | None = None,
    checkpoint_dir: str | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Shard map for the concatenated token stream chunked every
    ``seq_len`` tokens.

    Token accounting: ``token_count(text) + 1`` per doc (the +1 is the
    EOS separator), stream position is 0-based, docs ordered by doc_id.
    Pass ``count_col`` to pack by a PRECOMPUTED per-doc token count
    instead (e.g. bpe_segment's n_bpe_tokens — the tokenizer-aware
    packing a real pretraining run uses); the +1 EOS convention is
    applied identically.

    Returns one row per (chunk, doc) overlap:
      chunk_id   — stream_position DIV seq_len
      doc_id
      doc_off    — first token of this piece, as an offset into the doc
      chunk_off  — where the piece starts inside the chunk
      n_toks     — piece length; per chunk these sum to exactly seq_len
                   (except the final partial chunk)
    """
    spark = docs.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_tok = (
        F.col(count_col) if count_col is not None
        else token_count(F.col(text_col))
    )
    d = (
        docs.select(
            "doc_id",
            (n_tok + F.lit(1)).cast("long").alias("n_tok"),
        )
        .repartitionByRange(parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        d = d.checkpoint(eager=True)
    else:
        d = d.localCheckpoint(eager=True)

    w_local = Window.partitionBy("pid").orderBy("doc_id")
    local = d.withColumn("local_end", F.sum("n_tok").over(w_local))
    totals = d.groupBy("pid").agg(F.sum("n_tok").alias("ptotal"))
    # Exclusive prefix sum over P rows — the one single-task window, and
    # it sees exactly num_parts rows by construction.
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "poffset", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0)).cast("long")
    )
    seq = int(seq_len)
    return (
        local.join(F.broadcast(offsets.select("pid", "poffset")), "pid")
        .withColumn("tok_end", (F.col("local_end") + F.col("poffset")).cast("long"))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tok"))
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    F.expr(f"tok_start DIV {seq}"), F.expr(f"(tok_end - 1) DIV {seq}")
                )
            ),
        )
        .select(
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("doc_id"),
            (F.greatest(F.col("tok_start"), F.col("chunk_id") * seq) - F.col("tok_start"))
            .cast("long")
            .alias("doc_off"),
            (F.greatest(F.col("tok_start"), F.col("chunk_id") * seq)
             - F.col("chunk_id") * seq)
            .cast("long")
            .alias("chunk_off"),
            (F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * seq)
             - F.greatest(F.col("tok_start"), F.col("chunk_id") * seq))
            .cast("long")
            .alias("n_toks"),
        )
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> DataFrame:
    """Deterministic global corpus shuffle + balanced shard assignment —
    the step between corpus construction and the trainer's data loader:
    every doc gets a pseudorandom but reproducible position (md5 order,
    id tiebreak), and positions are cut into `n_shards` shards whose
    sizes differ by at most one.

    Returns (doc_id, shuffle_rank, shard, pos_in_shard), rank 0-based.
    shard = rank * n_shards DIV total; pos_in_shard = rank - shard_start
    where shard_start = (shard * total + n_shards - 1) DIV n_shards (the
    non-negative ceil form — negative integer division rounds
    differently in Spark and DuckDB, so it never appears) — all exact
    integer arithmetic, engine-portable, partition-count-invariant.

    Scale shape: the global rank is the same two-phase distributed
    prefix COUNT as pack_sequences (range-partition on the md5 key,
    local row_number per physical partition, single-task exclusive
    prefix over the P partition totals) — a naive
    row_number().over(Window.orderBy(md5)) would funnel the corpus
    through one task."""
    spark = docs.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    key = F.md5(F.col(id_col).cast("string"))
    d = (
        docs.select(F.col(id_col), key.alias("__k"))
        .repartitionByRange(parts, "__k", id_col)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("pid").orderBy("__k", id_col)
    local = d.withColumn("local_rn", F.row_number().over(w_local))
    totals = d.groupBy("pid").agg(F.count(F.lit(1)).alias("ptotal"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "poffset", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0)).cast("long")
    )
    grand = totals.agg(F.sum("ptotal").cast("long").alias("total"))
    n = int(n_shards)
    return (
        local.join(F.broadcast(offsets.select("pid", "poffset")), "pid")
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "shuffle_rank",
            (F.col("local_rn") + F.col("poffset") - 1).cast("long"),
        )
        .withColumn("shard", F.expr(f"(shuffle_rank * {n}) DIV total"))
        .withColumn(
            "pos_in_shard",
            F.expr(f"shuffle_rank - ((shard * total + {n - 1}) DIV {n})"),
        )
        .select(
            id_col,
            "shuffle_rank",
            F.col("shard").cast("long").alias("shard"),
            F.col("pos_in_shard").cast("long").alias("pos_in_shard"),
        )
    )
