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
