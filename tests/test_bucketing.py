"""Bucketed co-located join: pre-bucketing both sides of a recurring join
key eliminates the shuffle — the storage-level strategy the spans table
uses (bucket(doc_id)) so downstream golden-compare / enrichment joins are
exchange-free at 100 TB."""

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf; the default ./spark-warehouse under
    # the test cwd is fine — tables are dropped in the finally block
    # disable broadcast so the join strategy is decided by bucketing alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97).alias("x")
        )
        right = spark.range(0, 10000, 2).select(
            F.col("id").alias("doc_id"), (F.col("id") % 13).alias("y")
        )
        left.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("t_left")
        right.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("t_right")
        j = spark.table("t_left").join(spark.table("t_right"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert j.count() == 5000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_iceberg_gate_and_fallback(spark, tmp_path):
    """The native Iceberg sink is config-gated: without the runtime jars the
    gate is False and write_spans with an iceberg_table still lands the
    bucketed parquet layout; with jars (real cluster) the native writeTo
    path is exercised instead."""
    import pytest

    from pdf_extract_spark.sources.raw_docs import (
        fixture_corpus_df,
        iceberg_available,
        read_spans,
        write_spans,
        write_spans_iceberg,
    )
    from pdf_extract_spark.operators.extraction import extract_documents

    out = extract_documents(fixture_corpus_df(spark, replicas=1), num_partitions=4)
    df = out.select("doc_id", "spans")
    n = df.count()

    if not iceberg_available(spark):
        path = str(tmp_path / "spans_fallback")
        sink = write_spans(df, path, buckets=4, mode="overwrite",
                           iceberg_table="cat.db.documents_spans")
        assert sink == "parquet"
        assert read_spans(spark, path).count() == n
        pytest.skip("iceberg runtime not on classpath: native writeTo untested here")

    # native path (runs only on clusters shipping the Iceberg runtime)
    sink = write_spans(df, str(tmp_path / "unused"), buckets=4, mode="overwrite",
                       iceberg_table="spark_catalog.default.test_spans_iceberg")
    assert sink == "iceberg"
    got = spark.table("spark_catalog.default.test_spans_iceberg")
    assert got.count() == n
    write_spans_iceberg(df, "spark_catalog.default.test_spans_iceberg", buckets=4)
    assert spark.table("spark_catalog.default.test_spans_iceberg").count() == 2 * n
