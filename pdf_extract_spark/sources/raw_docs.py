"""Sources & sinks for the extraction pipeline.

Input table shape (FIXTURES.md §1):
    raw_docs(doc_id string, content binary, byte_len long, source string)

Ingest paths:
  * fixture corpus  -> deterministic in-memory corpus (tests/bench)
  * directory of PDFs -> spark.read.format("binaryFile") (cluster path)
  * existing parquet/iceberg table -> spark.read

Sink: documents_spans written as parquet partitioned by an Iceberg-style
``bucket(N, doc_id)`` column (hash-mod).  On a real cluster the same frame
goes to ``df.writeTo("catalog.db.documents_spans").append()`` — parquet is
the sandbox fallback (no Iceberg runtime jars here); the bucketing column
keeps the layout identical so the write distribution is cluster-ready.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCUMENTS_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)


def fixture_corpus_df(spark: SparkSession, replicas: int = 1) -> DataFrame:
    """Deterministic raw_docs DataFrame from the fixture corpus."""
    from ..fixtures import corpus

    rows = [
        (doc_id, pdf, len(pdf), doc_id.rsplit("-", 1)[0])
        for doc_id, pdf, _expected in corpus(replicas)
    ]
    return spark.createDataFrame(rows, RAW_DOCS_SCHEMA)


def golden_spans_df(spark: SparkSession, replicas: int = 1) -> DataFrame:
    """Golden documents_spans derived from fixture expected text (the
    fixture builder's own prediction — independent of the engine)."""
    from ..fixtures import corpus

    rows = []
    for doc_id, _pdf, expected in corpus(replicas):
        spans = []
        offset = 0
        for seg in expected.split("\n"):
            spans.append(
                ("text" if seg else "para", seg, "", offset)
            )
            offset += len(seg) + 1
        rows.append((doc_id, spans))
    return spark.createDataFrame(rows, DOCUMENTS_SPANS_SCHEMA)


def read_pdf_dir(spark: SparkSession, path: str) -> DataFrame:
    """Cluster ingest: a directory (or glob) of PDF files via the
    binaryFile source; pushdown-friendly (pathGlobFilter prunes listings)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.col("path").alias("doc_id"),
            F.col("content"),
            F.col("length").alias("byte_len"),
            F.lit("binaryFile").alias("source"),
        )
    )


def write_spans(df: DataFrame, path: str, buckets: int = 64, mode: str = "append") -> None:
    """documents_spans sink with Iceberg-style hash bucketing on doc_id.

    At cluster scale this becomes
        df.writeTo("cat.db.documents_spans").partitionedBy(bucket(N, "doc_id"))
    with write.distribution-mode=hash; parquet + explicit bucket column is
    the jar-free equivalent layout.
    """
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("int"))
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def read_spans(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")
