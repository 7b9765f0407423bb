"""Interleave alignment family: cross-operator invariants over random
corpora (the oracle rows pin exact values; these pin the ALGEBRA — the
operators must agree with each other on any input)."""

import random

from pyspark.sql import functions as F

from pdf_extract_spark.operators.interleave import (
    EVERY,
    PHASE,
    interleave_stats,
    media_captions,
    pack_interleaved,
    synth_interleaved,
)


def _random_docs(spark, seed, n_docs=40):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n_words = rng.randint(0, 40)
        rows.append(
            (i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(n_words)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_generator_caption_stats_agree(spark):
    docs = _random_docs(spark, 11)
    spans = synth_interleaved(docs)
    stats = {r["doc_id"]: r for r in interleave_stats(spans).collect()}
    caps = media_captions(spans, max_words=6, min_words=0).collect()
    # one caption row per media span, per doc
    per_doc = {}
    for r in caps:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    for d, st in stats.items():
        assert per_doc.get(d, 0) == st["n_media"], d
        # generator rule: media after word index p where p % EVERY == PHASE
        n_words = st["n_spans"] - st["n_media"]
        expected_media = max(0, (n_words - 1 - PHASE) // EVERY + 1) if n_words > PHASE else 0
        assert st["n_media"] == expected_media, (d, n_words)
    # captions contain only words from the owning doc and <= 6 of them
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in caps:
        words = r["caption"].split() if r["caption"] else []
        assert len(words) == r["caption_words"] <= 6
        vocab = set(texts[r["doc_id"]].split())
        assert all(w in vocab for w in words), r


def test_pack_interleaved_chunk_algebra(spark):
    docs = _random_docs(spark, 23)
    spans = synth_interleaved(docs)
    manifest = pack_interleaved(spans, 64, 16).collect()
    # every chunk except the last sums to exactly seq_len
    sums = {}
    for r in manifest:
        sums[r["chunk_id"]] = sums.get(r["chunk_id"], 0) + r["n_toks"]
    last = max(sums)
    for cid, s in sums.items():
        assert s == 64 or (cid == last and s <= 64), (cid, s)
    # total packed tokens == sum of per-doc costs (+1 EOS each)
    stats = interleave_stats(spans).collect()
    total = sum(
        (st["n_spans"] - st["n_media"]) + 16 * st["n_media"] + 1
        for st in stats
    )
    assert sum(sums.values()) == total
