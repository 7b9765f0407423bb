"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship extraction pipeline on the deterministic fixture
                  corpus (sf0.001-scale), exploded to span rows.
queries()      -> every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame callables.
oracle_sql()   -> DuckDB-equivalent SQL for the SQL-expressible subset
                  (column names/types aligned; see pdf_extract_spark.queries
                  for the parity conventions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PDF bytes -> ordered (kind, text, media_ref, offset) span
    rows via the Arrow-batched extraction stage."""
    from pdf_extract_spark.queries import extract_pdf_spans

    return extract_pdf_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_extract_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_extract_spark.queries import ORACLES

    return dict(ORACLES)
