"""Interleaved text+media alignment operators.

The north-rule data model is a single spans table interleaving text and
media rows per document (reference: jrmuizel/pdf-extract emits the same
interleaved stream via `Output::begin_word`/image callbacks,
src/lib.rs:2195-2230).  Beyond extraction itself, a multimodal training
pipeline needs ALIGNMENT ops over that stream: which text describes
which image (caption mining for CLIP-style pair corpora, cf. the
LAION/OBELICS interleaved-corpus recipes), how media-dense each doc is
(curation signal), and how to cost media when packing interleaved
sequences for a multimodal LM (a fixed per-image patch-token budget, as
in Flamingo/LLaVA-style training).

Scale notes common to the family: every window below is partitioned by
``doc_id`` (and caption groups by ``(doc_id, media_idx)``), so the
widest partition is one document's span list — bounded by document
length, never by corpus size.  The aggregates are plain map-side
combinable groupBys.  No Python UDFs anywhere: the whole family is
whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic synthetic interleave rule: after word position p with
# p % EVERY == PHASE, inject one media span.  Pure arithmetic (no
# hashing) so any engine reproduces the table bit-for-bit.
EVERY = 11
PHASE = 7


def synth_interleaved(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> deterministic interleaved spans
    (doc_id, pos, kind, text, media_ref): one 'text' span per
    whitespace word, plus a 'media' span injected after every word
    whose 0-based index p satisfies p % 11 == 7, with
    media_ref = 'img-<doc_id>-<p DIV 11>'.

    This synthesizes the input_hint's interleaved table shape from the
    plain documents relation at any scale — the small-scale stand-in
    for a crawl's real interleaved stream, and the shared fixture for
    the alignment family's exact oracles.

    Scale shape: one explode plus one per-doc row_number window; the
    union re-rank never leaves the document partition."""
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(text_col), r"\s+")).alias("p", "w")
    ).filter(F.col("w") != "")  # empty/whitespace-only docs emit NO spans
                                # (split of '' yields [''], same guard as
                                # functions/bpe.py:word_histogram)
    text_rows = words.select(
        "doc_id",
        (F.col("p") * 2).alias("ord"),
        F.lit("text").alias("kind"),
        F.col("w").alias("text"),
        F.lit("").alias("media_ref"),
    )
    media_rows = words.filter(F.col("p") % EVERY == PHASE).select(
        "doc_id",
        (F.col("p") * 2 + 1).alias("ord"),
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        F.concat(
            F.lit("img-"),
            F.col("doc_id").cast("string"),
            F.lit("-"),
            (F.col("p") / EVERY).cast("long").cast("string"),
        ).alias("media_ref"),
    )
    w = Window.partitionBy("doc_id").orderBy("ord")
    return (
        text_rows.unionByName(media_rows)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "pos", "kind", "text", "media_ref")
    )


def media_captions(
    spans: DataFrame, max_words: int = 6, min_words: int = 1
) -> DataFrame:
    """Mine (media, caption) pairs from an interleaved spans table: the
    caption of media span m is the concatenation of up to ``max_words``
    non-media spans FOLLOWING m and preceding the next media span —
    the adjacency heuristic caption-pair corpora use when no explicit
    alt-text exists.  Pairs with fewer than ``min_words`` caption spans
    are kept with caption '' only if min_words == 0, else dropped.

    Input needs (doc_id, pos, kind, text, media_ref); any non-'media'
    kind (text/para/heading) is caption material.

    Scale shape: a running per-doc media counter assigns every span to
    its owning media group in ONE window pass; ranking inside a group
    is bounded by the inter-media text run; the caption concat is an
    order-free groupBy over (doc_id, media_idx) using array_sort, so
    it is deterministic under any shuffle order."""
    is_media = (F.col("kind") == "media").cast("long")
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = spans.withColumn("media_idx", F.sum(is_media).over(w_run))
    media = g.filter(F.col("kind") == "media").select(
        "doc_id",
        F.col("media_idx").alias("g"),
        "media_ref",
        F.col("pos").alias("media_pos"),
    )
    w_rank = Window.partitionBy("doc_id", "media_idx").orderBy("pos")
    cand = (
        g.filter((F.col("kind") != "media") & (F.col("media_idx") >= 1))
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= max_words)
    )
    caps = cand.groupBy("doc_id", F.col("media_idx").alias("g")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("caption"),
        F.count("*").cast("long").alias("caption_words"),
    )
    out = media.join(caps, ["doc_id", "g"], "left").select(
        "doc_id",
        "media_ref",
        F.col("media_pos").cast("long").alias("media_pos"),
        F.coalesce("caption", F.lit("")).alias("caption"),
        F.coalesce("caption_words", F.lit(0)).cast("long").alias("caption_words"),
    )
    return out.filter(F.col("caption_words") >= min_words)


def interleave_stats(spans: DataFrame) -> DataFrame:
    """Per-document interleaving profile over a spans table: span and
    media counts, media density (per 100 spans, x100 integer so the
    cross-engine hash is exact), and the position of the first media
    span (-1 when the doc has none) — the curation signals a
    multimodal mixture builder filters and stratifies on.

    One map-side-combinable aggregate; no windows at all."""
    is_media = (F.col("kind") == "media").cast("long")
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(is_media).cast("long").alias("n_media"),
        F.min(F.when(F.col("kind") == "media", F.col("pos")))
        .cast("long")
        .alias("first_media_pos"),
    ).select(
        "doc_id",
        "n_spans",
        "n_media",
        F.coalesce("first_media_pos", F.lit(-1)).cast("long").alias(
            "first_media_pos"
        ),
        # floor() explicitly: DuckDB's double->BIGINT cast rounds
        # half-even while Spark's truncates — floor first keeps the
        # cross-engine hash exact
        F.floor(F.col("n_media") * 10000 / F.col("n_spans"))
        .cast("long")
        .alias("media_per_100_x100"),
    )


def pack_interleaved(
    spans: DataFrame,
    seq_len: int,
    patch_tokens: int = 64,
    num_parts: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multimodal sequence packing: cost each document as (whitespace
    tokens of its text spans) + (media spans x ``patch_tokens``) and
    cut the concatenated stream into ``seq_len`` chunks — the fixed
    per-image patch budget a vision-language trainer reserves when
    packing interleaved documents.

    Reuses pack_sequences' two-phase distributed prefix sum verbatim
    (operators/pack.py): the only new work is one per-doc cost
    aggregate, itself map-side combinable."""
    from ..functions.text import token_count
    from .pack import pack_sequences

    cost = spans.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("kind") == "media", F.lit(patch_tokens)).otherwise(
                token_count(F.col("text"))
            )
        )
        .cast("long")
        .alias("mm_tokens")
    )
    return pack_sequences(
        cost,
        seq_len,
        count_col="mm_tokens",
        num_parts=num_parts,
        checkpoint_dir=checkpoint_dir,
    )
