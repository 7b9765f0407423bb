"""Interleaved-span linearization: turn the north-rule spans table
(doc_id, kind, text, media_ref, offset-ordered) into one training
sequence per document — text spans verbatim, structural spans as
sentinel tokens, media spans as typed placeholder tokens that a
multimodal trainer later swaps for patch embeddings.

This is the last hop of the extraction pipeline: everything upstream
(PDF interpreter, HTML main-content, media decode) lands in the unified
spans schema; this operator emits the model-facing text stream.

Scale shape: ONE shuffle — groupBy(doc) with collect_list of small
(pos, token) structs, sorted in-plan per doc (`array_sort` on the
struct's leading pos field — no window, no secondary sort machinery).
Span counts per doc are bounded (a doc's own spans), so the grouped
rows stay small regardless of corpus size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# structural kinds rendered as sentinel tokens rather than their text
SENTINELS = {"para": "<p>", "heading": "<h>"}


def span_token(kind=None, text=None, media_ref=None):
    """The per-span token expression: media -> '<media:ref>', structural
    kinds -> sentinel, everything else -> the span text.  Defaults are
    resolved lazily so the module imports without an active session."""
    kind = F.col("kind") if kind is None else kind
    text = F.col("text") if text is None else text
    media_ref = F.col("media_ref") if media_ref is None else media_ref
    out = text
    for k, tok in sorted(SENTINELS.items()):
        out = F.when(kind == k, F.lit(tok)).otherwise(out)
    return F.when(
        kind == "media", F.concat(F.lit("<media:"), media_ref, F.lit(">"))
    ).otherwise(out)


def linearize_spans(
    spans: DataFrame,
    group_cols: Sequence[str] = ("source_format", "doc_id"),
    order_col: str = "pos",
) -> DataFrame:
    """One row per document: the space-joined training sequence plus the
    span/media counts a shard manifest records.

    Ordering: primary key `order_col`; on equal positions the struct
    sort falls through to the rendered token (binary string compare) —
    deterministic, and mirrored by the oracle's secondary ORDER BY."""
    tok = span_token()
    return (
        spans.select(
            *group_cols,
            F.struct(F.col(order_col).alias("pos"), tok.alias("tok")).alias("__s"),
            (F.col("kind") == "media").cast("long").alias("__m"),
        )
        .groupBy(*group_cols)
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("__s")), lambda s: s["tok"]),
                " ",
            ).alias("train_text"),
            F.count("*").alias("n_spans"),
            F.sum("__m").alias("n_media"),
        )
    )
