"""The distributed extraction stage: raw_docs -> documents_spans + metrics.

Spark-first design (SURVEY.md §3 "Our lifecycle"):

    raw_docs --salt-repartition--> mapInPandas(extract_batch) --> spans+metrics
        \\--(byte_len > giant_threshold)--> one-doc-per-task path --/

  * The reference processes one document at a time, single-threaded
    (/root/reference/src/lib.rs:2374-2416); extraction is embarrassingly
    parallel per doc_id, so the whole reference pipeline lives inside an
    Arrow-batched ``mapInPandas`` — no per-row Python at the Spark API
    level (per BASELINE.json input_hint).
  * Skew: doc sizes span ~10^6x in web corpora.  Hash-salting spreads doc
    COUNT evenly but a partition can still draw several giant PDFs, so
    giant docs (> giant_threshold bytes) are split off and repartitioned
    one-per-task; both paths share the same extractor and are unioned.
    This is the explicit salting/repartition the north_rule requires — AQE
    cannot rebalance inside a UDF stage.
  * Resume: anti-join against the lineage table of completed doc_ids —
    table-driven checkpointing, no stateful operators needed.
  * Metrics (pages, spans, decode_failures) ride along as columns and are
    aggregated per partition with spark_partition_id() — map-side, no extra
    shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "pages int, n_spans int, decode_failures int, error string"
)

DEFAULT_GIANT_THRESHOLD = 32 * 1024 * 1024  # 32 MiB


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # imported inside the UDF so only the (picklable) module name ships
    from ..extract import extract_spans_from_mem

    for pdf_batch in batches:
        out = {
            "doc_id": [],
            "spans": [],
            "pages": [],
            "n_spans": [],
            "decode_failures": [],
            "error": [],
        }
        for doc_id, content in zip(pdf_batch["doc_id"], pdf_batch["content"]):
            r = extract_spans_from_mem(bytes(content) if content is not None else b"")
            out["doc_id"].append(doc_id)
            out["spans"].append(
                [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans]
            )
            out["pages"].append(r.pages)
            out["n_spans"].append(len(r.spans))
            out["decode_failures"].append(0 if r.error is None else 1)
            out["error"].append(r.error)
        yield pd.DataFrame(out)


def extract_documents(
    raw_docs: DataFrame,
    num_partitions: int | None = None,
    giant_threshold: int = DEFAULT_GIANT_THRESHOLD,
) -> DataFrame:
    """raw_docs(doc_id, content[, byte_len]) -> extraction result frame.

    Returns doc_id, spans, pages, n_spans, decode_failures, error.
    """
    spark = raw_docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    df = raw_docs
    if "byte_len" not in df.columns:
        df = df.withColumn("byte_len", F.length("content").cast("long"))

    normal = df.filter(F.col("byte_len") <= giant_threshold)
    giant = df.filter(F.col("byte_len") > giant_threshold)

    # Salted spread: xxhash64(doc_id) round-robins docs across tasks
    # regardless of input file clustering (adjacent giant docs in one input
    # split would otherwise land in one task).
    normal_out = (
        normal.repartition(num_partitions, F.xxhash64("doc_id"))
        .select("doc_id", "content")
        .mapInPandas(_extract_batches, EXTRACT_SCHEMA)
    )
    # Giant path: one doc per task (repartition by unique key at task
    # granularity) so a 1 GiB PDF never shares executor memory with others.
    giant_out = (
        giant.repartition(F.col("doc_id"))
        .select("doc_id", "content")
        .mapInPandas(_extract_batches, EXTRACT_SCHEMA)
    )
    return normal_out.unionByName(giant_out)


def resume_filter(raw_docs: DataFrame, lineage: DataFrame | None) -> DataFrame:
    """Drop docs already extracted OK in a previous run (checkpoint resume):
    left_anti join against lineage — Catalyst picks broadcast when the done
    set is small, sort-merge otherwise."""
    if lineage is None:
        return raw_docs
    done = lineage.filter(F.col("status") == "ok").select("doc_id").distinct()
    return raw_docs.join(done, "doc_id", "left_anti")


def lineage_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-document lineage (FIXTURES.md §1): run_id, partition_id, doc_id,
    status, finished_at.  partition_id captured map-side, no shuffle."""
    return extracted.select(
        F.lit(run_id).alias("run_id"),
        F.spark_partition_id().alias("partition_id"),
        F.col("doc_id"),
        F.when(F.col("error").isNull(), F.lit("ok")).otherwise(F.lit("failed")).alias("status"),
        F.current_timestamp().alias("finished_at"),
    )


def metrics_rows(extracted: DataFrame) -> DataFrame:
    """Per-document extraction metrics table."""
    return extracted.select(
        "doc_id",
        F.col("pages"),
        F.col("n_spans").alias("spans"),
        F.col("decode_failures"),
    )


def run_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition rollup for the run dashboard — one map-side agg."""
    return (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("docs"),
            F.sum("pages").alias("pages"),
            F.sum("n_spans").alias("spans"),
            F.sum("decode_failures").alias("decode_failures"),
        )
        .withColumn("run_id", F.lit(run_id))
    )
