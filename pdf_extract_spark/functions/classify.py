"""Multinomial Naive Bayes document classifier (corpus curation).

The production pattern (fastText-style source/quality classifiers in
DCLM, RefinedWeb, FineWeb) is: label a slice of the corpus by
provenance (trusted wiki/books vs raw crawl), train a cheap linear text
classifier, score everything, keep/resample by score.  This module is
the count-based member of that family — multinomial NB with add-one
smoothing — chosen deliberately over iterative gradient models because
its train AND score paths are exact integer arithmetic plus one
quantized log per (token, class):

  train: per-class token counts (one explode + one groupBy), class
         totals, union vocabulary — three shuffles, map-side combined
  score: explode docs to tokens, join the per-class weight table,
         sum integer-quantized log-likelihood bits per doc

Per-(token, class) weight: ``floor(log2((c_wc + 1)/(n_c + V)) * 1000)``
summed as BIGINTs — the same quantization contract as functions/lm.py,
so the cross-engine value hash is exact regardless of summation order,
and there is no iterative float state to drift between engines.

Scale notes (100 TB): the doc-token ⋈ weight join hash-partitions on
the token — fine-grained keys, hot stopwords are AQE skew-join
territory; the weight table is vocabulary-sized and left to AQE's
broadcast threshold.  Scalars (V, class totals, priors) ride a one-row
cross-joined frame with a broadcast hint — nothing is collected to the
driver.  Out-of-vocabulary tokens contribute the smoothing floor
``floor(log2(1/(n_c + V)) * 1000)`` via coalesce, so unseen text is
scored, not dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _ltoks


def nb_score(
    docs: DataFrame, pos_label: Column, text_col: str = "text"
) -> DataFrame:
    """Train a two-class multinomial NB on ``docs`` labeled by the
    boolean column expression ``pos_label``, then score every doc.

    Returns (doc_id, n_tokens, score_pos_x1000, score_neg_x1000,
    margin_x1000, pred_pos): scores are the quantized log-joint
    ``floor(log2 P(class))*1000 + Σ floor(log2 P(token|class))*1000``;
    ``margin_x1000 > 0`` ⇔ ``pred_pos`` — the keep/resample signal.

    In production the labels come from provenance on a labeled frame;
    train-on/score-on the same frame here keeps the operator a single
    deterministic query (a caller trains on a slice by passing the
    labeled frame and scoring a second one via the same helper chain).
    """
    labeled = docs.select(
        "doc_id",
        pos_label.cast("boolean").alias("y"),
        _ltoks(F.col(text_col)).alias("ts"),
    )
    toks = labeled.select("doc_id", "y", F.explode("ts").alias("t"))

    # per-class token counts -> one row per vocab token with both columns
    counts = (
        toks.groupBy("t")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c_neg"),
        )
    )
    # scalars as a one-row broadcast frame: class token totals, vocab
    # size, class doc counts (priors) — never collected
    scalars = (
        toks.agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("n_neg"),
            F.countDistinct("t").alias("v"),
        )
        .crossJoin(
            labeled.agg(
                F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("d_pos"),
                F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("d_neg"),
            )
        )
    )

    def bits(c: Column, n: Column, v: Column) -> Column:
        return F.floor(
            F.log2((c + 1).cast("double") / (n + v)) * 1000
        ).cast("long")

    weighted = (
        toks.join(counts, "t", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            bits(F.coalesce(F.col("c_pos"), F.lit(0)), F.col("n_pos"), F.col("v"))
            .alias("b_pos"),
            bits(F.coalesce(F.col("c_neg"), F.lit(0)), F.col("n_neg"), F.col("v"))
            .alias("b_neg"),
        )
    )
    prior = lambda d, dp, dn: F.floor(  # noqa: E731
        F.log2(d.cast("double") / (dp + dn)) * 1000
    ).cast("long")
    return (
        weighted.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("b_pos").cast("long").alias("s_pos"),
            F.sum("b_neg").cast("long").alias("s_neg"),
        )
        .crossJoin(F.broadcast(scalars.select("d_pos", "d_neg")))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("s_pos") + prior(F.col("d_pos"), F.col("d_pos"), F.col("d_neg")))
            .alias("score_pos_x1000"),
            (F.col("s_neg") + prior(F.col("d_neg"), F.col("d_pos"), F.col("d_neg")))
            .alias("score_neg_x1000"),
        )
        .withColumn(
            "margin_x1000", F.col("score_pos_x1000") - F.col("score_neg_x1000")
        )
        .withColumn("pred_pos", F.col("margin_x1000") > 0)
    )
