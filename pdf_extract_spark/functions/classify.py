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

from pyspark.sql import Column, DataFrame, Window
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

    # per-class token counts -> one row per vocab token with both columns.
    # Checkpointed because it feeds BOTH the weight join and the
    # token-total scalars below: the frame is vocabulary-sized (narrow,
    # safe at any corpus scale) and without the cut the corpus-scale
    # explode + groupBy ran once per consumer.
    counts = (
        toks.groupBy("t")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c_neg"),
        )
        # eager: the weight join and the scalar agg below could otherwise
        # race to materialize it from two concurrent broadcast stages,
        # each re-running the corpus explode
        .localCheckpoint(eager=True)
    )
    # scalars as TWO independent one-row broadcast frames — never
    # collected.  Token totals and V now DERIVE from the vocab-sized
    # `counts` frame (n_class = Σ c_class, V = row count) instead of
    # re-exploding the corpus: same values, one corpus pass saved.
    # Keeping them separate from the doc-count priors still matters:
    # Catalyst prunes columns, not join inputs.
    tok_scalars = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
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


def nb_topk_filter(
    docs: DataFrame,
    pos_label: Column,
    pct: int,
    text_col: str = "text",
    num_parts: int | None = None,
    score_docs: DataFrame | None = None,
) -> DataFrame:
    """Keep the top ``pct`` percent of scored docs by classifier margin —
    the DCLM/FineWeb-Edu resampling step (train a cheap classifier, keep
    the best-scoring slice of the corpus).

    Selection is EXACT and deterministic: the ceil(n*pct/100) docs that
    rank first by (margin_x1000 DESC, doc_id ASC).  Returns the kept
    docs' full score rows (same schema as `nb_score`).

    Scale shape — exact global top-k where k is corpus-proportional, so
    neither a global sort nor a driver collect is acceptable:
      1. histogram of the integer-quantized margins (one map-side-
         combined shuffle; distinct margins << docs);
      2. descending cumulative count over the histogram via the same
         two-phase prefix sum as operators/pack.py (range partition,
         local window per physical partition, single-task window only
         over the P partition totals) -> every margin value knows its
         cumulative rank range [cum_start, cum_end);
      3. margins with cum_end <= k keep ALL their docs (semi-join on the
         margin key);
      4. the ONE boundary margin (cum_start < k < cum_end) needs its
         smallest-doc_id quota — resolved with a second two-phase prefix
         COUNT over just that margin's docs, so even a degenerate corpus
         where every doc ties on one margin never funnels through a
         single window task."""
    spark = docs.sparkSession
    parts = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # materialize the scored frame once: it feeds the histogram, the
    # full-margin semi-join, AND the boundary quota pass — without the
    # checkpoint the explode + weight-join + agg of nb_score runs three
    # times.  The frame is narrow (doc_id + five longs), so at 100 TB
    # this is a tiny fraction of one nb_score recompute.
    scored = nb_score(docs, pos_label, text_col, score_docs).localCheckpoint(
        eager=False
    )

    hist = scored.groupBy("margin_x1000").agg(F.count(F.lit(1)).alias("cnt"))
    h = (
        hist.repartitionByRange(parts, F.col("margin_x1000").desc())
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("pid").orderBy(F.col("margin_x1000").desc())
    local = h.withColumn("local_end", F.sum("cnt").over(w_local))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        h.groupBy("pid")
        .agg(F.sum("cnt").alias("ptotal"))
        .withColumn(
            "poffset", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0)).cast("long")
        )
    )
    # k derives from the checkpointed range-partitioned histogram `h`
    # (same rows as `hist`): aggregating `hist` directly re-ran the
    # corpus-scale margin groupBy a second time
    k_frame = h.agg(
        F.ceil(F.sum("cnt") * F.lit(int(pct)) / F.lit(100.0))
        .cast("long")
        .alias("k")
    )
    cum = (
        local.join(F.broadcast(offsets.select("pid", "poffset")), "pid")
        .withColumn("cum_end", (F.col("local_end") + F.col("poffset")).cast("long"))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt"))
        .crossJoin(F.broadcast(k_frame))
    )

    full_margins = cum.filter(F.col("cum_end") <= F.col("k")).select("margin_x1000")
    kept_full = scored.join(full_margins, "margin_x1000", "left_semi")

    boundary = cum.filter(
        (F.col("cum_start") < F.col("k")) & (F.col("k") < F.col("cum_end"))
    ).select("margin_x1000", (F.col("k") - F.col("cum_start")).alias("quota"))
    bdocs = (
        scored.join(F.broadcast(boundary), "margin_x1000")
        .repartitionByRange(parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wb_local = Window.partitionBy("pid").orderBy("doc_id")
    b_local = bdocs.withColumn("local_rn", F.count(F.lit(1)).over(wb_local))
    b_offsets = (
        bdocs.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("ptotal"))
        .withColumn(
            "poffset", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0)).cast("long")
        )
    )
    kept_boundary = (
        b_local.join(F.broadcast(b_offsets.select("pid", "poffset")), "pid")
        .filter(F.col("local_rn") + F.col("poffset") <= F.col("quota"))
        .drop("pid", "local_rn", "quota")
    )
    out_cols = scored.columns
    return kept_full.select(out_cols).unionByName(kept_boundary.select(out_cols))
