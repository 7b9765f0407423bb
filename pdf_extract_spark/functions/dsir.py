"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
"Data Selection for Language Models via Importance Resampling").

The production pattern for steering a 100 TB crawl toward a target
distribution: featurize every document as a bag of HASHED word n-grams
(the hashing trick bounds the model at `buckets` integers no matter the
corpus size), fit two smoothed bucket unigram distributions — target
slice vs raw slice — and give each raw document the importance
log-weight  log p_target(x) / p_raw(x) = Σ_grams [log p_t(b) − log
p_r(b)], then sample the kept subset with Gumbel-top-k, which draws
without replacement proportionally to the importance weights.

Exactness contract (same as functions/classify.py / functions/lm.py):
every log is integer-quantized at the leaf — ``floor(log2((c+1)/(n+B))
* 1000)`` per (bucket, side) — and everything after is BIGINT
arithmetic, so the cross-engine value hash is exact regardless of
summation order.  The Gumbel keys are derived from md5(doc_id), not a
PRNG: u = (first 13 md5 hex digits + 0.5) / 2^52 ∈ (0,1), key =
floor(-ln(-ln(u)) * 1000) — deterministic, partition-invariant, and
recomputable by any md5-capable engine (the DuckDB oracle re-derives
them from scratch).

Scale shape (100 TB): the gram stream is the codegen index-explode of
functions/text.py (no interpreted HOF lambdas); the two histograms are
one groupBy over at most `buckets` keys (map-side combined, uniformly
hash-spread — no skew by construction); the per-doc weight pass joins
the gram stream against the bucket-weight table, which is ≤ `buckets`
rows and BROADCAST — so the whole weight computation is one explode
shuffle plus one map-side join, and nothing is collected to the driver.
Selection is a global top-k (TakeOrdered: per-partition heaps, merge of
k-item lists) — scale-safe for the k ≤ ~10^5 regime selection jobs use;
percentile-threshold selection for larger k can reuse the histogram
two-phase of nb_topk_filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _gram_stream


def _bucket(g: Column, buckets: int) -> Column:
    """md5-hash a gram string into [0, buckets) — engine-portable."""
    return (F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            % F.lit(buckets))


def _bits(c: Column, n: Column, buckets: int) -> Column:
    """Quantized add-one-smoothed log2 probability in millibits."""
    return F.floor(
        F.log2((c + 1).cast("double") / (n + F.lit(buckets))) * 1000
    ).cast("long")


def _hashed_grams(docs: DataFrame, text_col: str, buckets: int,
                  id_cols: tuple[str, ...]) -> DataFrame:
    """(*id_cols, b): the hashed unigram+bigram feature stream
    (duplicates included — DSIR features are bags, not sets).  Label
    columns ride ALONG the gram stream via id_cols instead of being
    joined back on doc_id — the label is known before the explode, so a
    full-stream shuffle join would be pure waste."""
    uni = _gram_stream(docs, text_col, 1, id_cols)
    bi = _gram_stream(docs, text_col, 2, id_cols)
    return uni.unionAll(bi).select(
        *id_cols, _bucket(F.col("g"), buckets).alias("b")
    )


def dsir_weights(docs: DataFrame, target_pred: Column, text_col: str = "text",
                 buckets: int = 4096) -> DataFrame:
    """Importance log-weights for every document, fitted from the split
    ``target_pred`` induces on the same frame (the self-contained form
    the oracle checks; production calls pass a frame where the target
    slice is the curated corpus riding along with the crawl).

    Returns (doc_id, n_feats, weight_x1000): weight_x1000 =
    Σ_grams [bits_target(b) − bits_raw(b)] in millibits (log2×1000).
    Docs with zero tokens still produce a row (n_feats counts grams of
    the one-empty-token stream — identical in both engines)."""
    labeled = docs.select("doc_id", target_pred.cast("boolean").alias("y"),
                          text_col)
    feats = _hashed_grams(labeled, text_col, buckets, ("doc_id", "y"))
    # checkpointed: the histogram is <= `buckets` rows at any corpus
    # scale and feeds both the weight table and the totals below —
    # without the cut the corpus-scale gram explode ran once per
    # consumer (same fix as functions/classify.py's counts frame)
    hist = feats.groupBy("b").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("c_t"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("long").alias("c_r"),
    ).localCheckpoint(eager=True)
    # side totals DERIVE from the histogram (Σ over buckets of each
    # side's counts) — same values, one corpus pass saved
    totals = hist.agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_r").cast("long").alias("n_r"),
    )
    bucket_w = (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (_bits(F.col("c_t"), F.col("n_t"), buckets)
             - _bits(F.col("c_r"), F.col("n_r"), buckets)).alias("w_x1000"),
        )
    )
    # unseen buckets get the smoothing-floor difference via the totals
    floor_w = (
        F.broadcast(totals)
        .select(
            (_bits(F.lit(0), F.col("n_t"), buckets)
             - _bits(F.lit(0), F.col("n_r"), buckets)).alias("w0_x1000")
        )
    )
    return (
        feats
        .join(F.broadcast(bucket_w), "b", "left")
        .crossJoin(F.broadcast(floor_w))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum(F.coalesce(F.col("w_x1000"), F.col("w0_x1000")))
            .cast("long").alias("weight_x1000"),
        )
    )


def _gumbel_x1000(doc_id: Column) -> Column:
    """Deterministic md5-seeded Gumbel(0,1) key in milli-units."""
    u = (
        (F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 13), 16, 10)
         .cast("double") + 0.5)
        / F.lit(float(1 << 52))
    )
    return F.floor(-F.log(-F.log(u)) * 1000).cast("long")


def dsir_resample(docs: DataFrame, target_pred: Column, k: int,
                  text_col: str = "text", buckets: int = 4096) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the k raw (non-target)
    docs with the largest  ln w + Gumbel  keys — a without-replacement
    sample proportional to the importance weights.  The weight is in
    log2 millibits, so it is rescaled to millinats (× ln 2, floored —
    exact double ops both engines) before adding the Gumbel term.

    Returns (doc_id, weight_x1000, key_x1000), the selected docs."""
    w = dsir_weights(docs, target_pred, text_col, buckets)
    raw = docs.filter(~target_pred.cast("boolean")).select("doc_id")
    keyed = (
        raw.join(w, "doc_id")
        .select(
            "doc_id",
            "weight_x1000",
            (F.floor(F.col("weight_x1000") * F.lit(0.6931471805599453))
             .cast("long")
             + _gumbel_x1000(F.col("doc_id"))).alias("key_x1000"),
        )
    )
    return (
        keyed.orderBy(F.col("key_x1000").desc(), F.col("doc_id").asc())
        .limit(k)
    )
