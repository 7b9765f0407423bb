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
broadcast threshold.  Scalars ride two independent one-row broadcast
frames (token totals + V for the weights; doc-count priors for the
final select) — nothing is collected to the driver, and neither frame's
aggregate is recomputed for the other.  When scoring a frame other than
the training slice (``score_docs``), out-of-vocabulary tokens
contribute the smoothing floor ``floor(log2(1/(n_c + V)) * 1000)`` via
coalesce, so unseen text is scored, not dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _ltoks


def nb_score(
    docs: DataFrame,
    pos_label: Column,
    text_col: str = "text",
    score_docs: DataFrame | None = None,
) -> DataFrame:
    """Train a two-class multinomial NB on ``docs`` labeled by the
    boolean column expression ``pos_label``, then score ``score_docs``
    (default: the training frame itself — the single-query form the
    oracle checks).  Passing ``score_docs`` is the production DCLM
    pattern: train on a provenance-labeled slice, score the whole
    corpus; tokens unseen in training contribute the smoothing floor
    ``floor(log2(1/(n_c + V)) * 1000)``.

    Returns (doc_id, n_tokens, score_pos_x1000, score_neg_x1000,
    margin_x1000, pred_pos): scores are the quantized log-joint
    ``floor(log2 P(class))*1000 + Σ floor(log2 P(token|class))*1000``;
    ``margin_x1000 > 0`` ⇔ ``pred_pos`` — the keep/resample signal.
    Scored docs with zero tokens produce no row (no token evidence —
    callers left-join the input spine, same contract as lm_perplexity).

    ``pos_label`` must split the training frame into two non-empty
    classes; a label matching zero or all docs raises at run time (an
    in-plan assert on the one-row priors frame — no extra driver job)
    instead of silently emitting NULL scores from log2(0)."""
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
    # scalars as TWO independent one-row broadcast frames — never
    # collected.  Keeping the token totals and the doc-count priors
    # separate matters: Catalyst prunes columns, not join inputs, so a
    # single cross-joined frame would re-run the full corpus explode +
    # aggregate a second time just to read d_pos/d_neg at the end.
    tok_scalars = toks.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("n_neg"),
        F.countDistinct("t").alias("v"),
    )
    doc_scalars = labeled.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("d_neg"),
    )
    # degenerate-label guard, evaluated when the one-row frame builds:
    # assert_true returns NULL on success, raises with the message on a
    # zero-count class — the d_pos passthrough keeps it un-prunable
    guard = F.assert_true(
        (F.col("d_pos") > 0) & (F.col("d_neg") > 0),
        F.lit(
            "nb_score: pos_label must split the training frame into two "
            "non-empty classes (one class has zero docs)"
        ),
    )
    doc_scalars = doc_scalars.select(
        F.when(guard.isNull(), F.col("d_pos")).alias("d_pos"), "d_neg"
    )

    def bits(c: Column, n: Column, v: Column) -> Column:
        return F.floor(
            F.log2((c + 1).cast("double") / (n + v)) * 1000
        ).cast("long")

    if score_docs is None:
        stoks = toks.select("doc_id", "t")
    else:
        stoks = score_docs.select(
            "doc_id", _ltoks(F.col(text_col)).alias("ts")
        ).select("doc_id", F.explode("ts").alias("t"))

    weighted = (
        stoks.join(counts, "t", "left")
        .crossJoin(F.broadcast(tok_scalars))
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
        .crossJoin(F.broadcast(doc_scalars))
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
