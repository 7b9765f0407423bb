"""SQL-facing surface: register the corpus tables and the derived
operator views so the whole engine is drivable from ``spark.sql``.

The engine is DataFrame-first (every operator is a composable function
returning a DataFrame), but an analyst-facing deployment wants plain
SQL over named relations.  ``register(spark, sf_dir)`` publishes:

  * every base table of the test schema (``region nation customer
    supplier part orders lineitem events documents embeddings``) as a
    temp view of the same name, and
  * lazily-evaluated derived views for the headline operator families
    (quality flags, language ID, exact-dup fingerprints, interleaved
    spans, interleave stats, BM25-ready token stats) — each is just the
    operator's DataFrame registered under a stable name, so Catalyst
    still sees the full plan (predicate pushdown through the view, no
    materialization).

Views are metadata-only: registration costs no Spark job; each query
against a view optimizes end-to-end (the same physical plans the
registry queries are plan-gated on).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + derived operator views; returns the list
    of view names published (for discovery / tests)."""
    from .functions.langid import identify_language
    from .functions.text import document_stats, gopher_quality_flags
    from .operators.dedup import dedup_exact
    from .operators.interleave import interleave_stats, synth_interleaved

    names: list[str] = []
    for t in BASE_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        names.append(t)

    docs = spark.table("documents")
    derived = {
        "doc_quality_flags": gopher_quality_flags(docs),
        "doc_language": identify_language(docs),
        "doc_stats_v": document_stats(docs),
        "doc_fingerprints": dedup_exact(docs),
        "interleaved_spans": synth_interleaved(docs),
        "interleaved_stats": interleave_stats(synth_interleaved(docs)),
    }
    for name, df in derived.items():
        df.createOrReplaceTempView(name)
        names.append(name)
    return names
