"""Ranked retrieval over the document corpus: BM25 scoring and the
postings/inverted-index statistics it is built from.

The training-data use case is corpus curation: given a handful of probe
terms (a benchmark's keywords, a topic seed list), rank the corpus and
pull the top documents for inspection, decontamination review, or
targeted sampling.  The same postings frame doubles as the corpus's
inverted-index statistics table.

Scale design (100 TB corpus, query of q terms, q ~ 10s):
  * Per-document token arrays never leave their partition — document
    length (dl) is `size(split(...))`, computed narrow at the scan.
  * Only QUERY-MATCHING tokens are exploded: the higher-order `filter`
    prunes each token array to the probe terms BEFORE the explode, so
    the wide stage shuffles O(matching tokens), not O(corpus tokens).
  * Per-term document frequencies aggregate to <= q rows and join back
    broadcast; corpus-level scalars (N, avgdl) are a one-row broadcast
    cross join.
  * One (doc_id, term) shuffle for tf + one (doc_id) shuffle for the
    final score sum, both map-side combined.  Top-k is a global
    TakeOrdered, no full sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _matched_term_freqs(
    docs: DataFrame, query_terms: Sequence[str], text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, term, tf, dl) for query terms only.  Query terms are
    normalized the same way document tokens are (lowercased) so a
    mixed-case probe can never silently match nothing."""
    qlit = F.array(*[F.lit(t.lower()) for t in query_terms])
    base = docs.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))
    return (
        base.select(
            id_col,
            "dl",
            F.explode(
                F.filter("toks", lambda t: F.array_contains(qlit, t))
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by Okapi BM25 score for a bag of query terms.

    Uses the non-negative idf variant ln(1 + (N - df + 0.5)/(df + 0.5))
    so a term present in over half the corpus cannot push scores
    negative.  Scores are rounded to 4 decimals and ties broken by
    doc_id, making the top-k deterministic and cross-engine stable.
    """
    matched = _matched_term_freqs(docs, query_terms, text_col, id_col)
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokens(F.lower(F.col(text_col))))).alias("avgdl"),
    )
    dfreq = matched.groupBy("term").agg(
        F.countDistinct(id_col).alias("dfreq")
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        matched.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn("term_score", idf * tf_part)
        .groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def inverted_index_stats(
    docs: DataFrame,
    *,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term postings statistics (document frequency, collection
    frequency, max within-doc tf) — the corpus-wide index summary a
    retrieval layer is provisioned from.

    One explode + one (term, doc) combine + one (term) combine; both
    aggregations are map-side partial, so the shuffle carries term
    partials, never raw postings."""
    per_doc = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("doc_freq"),
            F.sum("tf").cast("long").alias("coll_freq"),
            F.max("tf").cast("long").alias("max_tf"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )


def rrf_fuse(
    ranked: dict[str, DataFrame],
    *,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    score(d) = sum over systems of 1/(c + rank_s(d)), with a document
    absent from a system contributing 0.  The hybrid-retrieval
    primitive: fuse a lexical (BM25) and a semantic (embedding cosine)
    ranking without score calibration — only ranks cross the boundary,
    so the two systems' score scales never have to be reconciled.

    Determinism: each contribution is one exact IEEE division by a
    small integer and the fold order over systems is the fixed order of
    `ranked`, so the fused double is bit-identical across engines; ties
    break on id.

    Scale shape: each input is already a top-k list (bounded rows), so
    the N-way full-outer join is a few-kilobyte exchange regardless of
    corpus size — the expensive work happened inside the upstream
    retrieval plans.  No windows, no collects."""
    items = list(ranked.items())
    if not items:
        raise ValueError("rrf_fuse needs at least one ranked input")
    fused = None
    for name, df in items:
        side = df.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias(f"rank_{name}"),
        )
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    score = None
    for name, _ in items:
        term = F.coalesce(
            1.0 / (F.lit(float(c)) + F.col(f"rank_{name}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.select(
            id_col,
            # absent-from-system ranks surface as 0, not NULL: the fused
            # frame stays non-nullable BIGINT (a nullable rank would ride
            # pandas' int->float64 coercion and corrupt driver hashing)
            *[
                F.coalesce(F.col(f"rank_{name}"), F.lit(0))
                .cast("long")
                .alias(f"rank_{name}")
                for name, _ in items
            ],
            F.round(score, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
