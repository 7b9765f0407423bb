"""SQL surface: every operator family reachable through spark.sql over
registered views, with pushdown surviving the view boundary."""

from pyspark.sql import functions as F  # noqa: F401

from pdf_extract_spark.sql_surface import register

SF = "/root/testdata/sf0.001"


def test_register_and_query_views(spark):
    names = register(spark, SF)
    assert "documents" in names and "doc_quality_flags" in names
    # plain SQL over a base table
    n = spark.sql("SELECT count(*) AS n FROM documents").collect()[0]["n"]
    assert n == 500
    # SQL joining a derived operator view back to its base table
    # (the synthetic register carries only 'the' from the stopword
    # list, so full keep is corpus-dependent — assert a single rule)
    row = spark.sql(
        """SELECT count(*) AS kept
           FROM doc_quality_flags q JOIN documents d USING (doc_id)
           WHERE q.rule_word_count"""
    ).collect()[0]
    assert 0 < row["kept"] <= n
    # the interleaved spans view serves media spans per the synth rule
    media = spark.sql(
        "SELECT count(*) AS m FROM interleaved_spans WHERE kind = 'media'"
    ).collect()[0]["m"]
    stats = spark.sql(
        "SELECT sum(n_media) AS m FROM interleaved_stats"
    ).collect()[0]["m"]
    assert media == stats > 0
    # language view joins to stats
    langs = spark.sql(
        "SELECT count(DISTINCT lang_pred) AS l FROM doc_language"
    ).collect()[0]["l"]
    assert langs >= 1


def test_view_pushdown_reaches_scan(spark):
    """A filter written in SQL against a derived view must still reach
    the parquet scan — views are metadata-only, Catalyst sees through."""
    register(spark, SF)
    df = spark.sql("SELECT doc_id FROM doc_language WHERE doc_id = 42")
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in txt and "doc_id" in txt
