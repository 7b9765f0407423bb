"""Unigram-LM tokenizer trainer: spec properties + distributed-shape
invariants (the cross-engine value parity is covered by the oracle rows
`unigram_vocab` / `doc_unigram_tokens` against the independent golden)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.functions.unigram import (
    unigram_segment,
    unigram_train,
    viterbi_pieces,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_viterbi_coverage_and_exactness():
    # every char present as a single -> any word segments; the
    # high-count piece wins over the char-by-char path
    counts = {"a": 5, "b": 5, "n": 5, "an": 40, "ban": 100}
    denom = sum(counts.values()) + len(counts)
    assert viterbi_pieces("banana", counts, denom, 4)[0] == "ban"
    # unseen word still segments through singles
    assert viterbi_pieces("nab", {"a": 1, "b": 1, "n": 1}, 6, 4) == [
        "n",
        "a",
        "b",
    ]


def test_viterbi_tie_breaks_deterministic():
    # two equal-probability splits -> fewer pieces, then lexicographic
    counts = {"x": 3, "y": 3, "xy": 3, "yx": 3}
    denom = sum(counts.values()) + len(counts)
    out = viterbi_pieces("xyyx", counts, denom, 4)
    assert out == viterbi_pieces("xyyx", dict(counts), denom, 4)
    assert len(out) == 2  # piece pairs beat four singles


def test_train_keeps_all_singles_and_caps_vocab(spark):
    docs = _docs(
        spark,
        [(i, "the cat sat on the mat the cat") for i in range(6)]
        + [(6, "zq")],  # rare chars must still be retained as singles
    )
    vdf, pieces = unigram_train(docs, vocab_size=12, rounds=1)
    ps = {p for p, _ in pieces}
    for ch in "thecasonmzq":
        assert ch in ps, ch
    assert len(pieces) <= 12 + 0 or all(
        len(p) == 1 for p, _ in pieces[12:]
    )  # cap binds multis only; singles never dropped
    ranks = [r["rank"] for r in vdf.orderBy("rank").collect()]
    assert ranks == list(range(len(pieces)))


def test_segment_counts_match_local_viterbi(spark):
    docs = _docs(spark, [(1, "aab aab bb"), (2, ""), (3, "aab")])
    _, pieces = unigram_train(docs, vocab_size=8, rounds=1)
    out = {
        r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
        for r in unigram_segment(docs, pieces).collect()
    }
    assert out[2] == (0, 0)  # empty doc -> zero rows, kept via left join
    assert out[1][0] == 3 and out[3][0] == 1
    # doc 1 contains doc 3's word twice -> token counts are consistent
    counts = dict(pieces)
    denom = sum(counts.values()) + len(counts)
    n_aab = len(viterbi_pieces("aab", counts, denom, 4))
    n_bb = len(viterbi_pieces("bb", counts, denom, 4))
    assert out[1][1] == 2 * n_aab + n_bb
    assert out[3][1] == n_aab


def test_train_partition_invariant(spark):
    rows = [(i, f"alpha beta gamma delta w{i % 7}") for i in range(40)]
    a = unigram_train(_docs(spark, rows).repartition(2), vocab_size=24, rounds=2)[1]
    b = unigram_train(_docs(spark, rows).repartition(13), vocab_size=24, rounds=2)[1]
    assert a == b


def test_unigram_empty_and_hostile_inputs(spark):
    from pdf_extract_spark.functions.unigram import (
        unigram_segment,
        unigram_train,
    )

    # empty corpus: trains an empty vocab without raising
    empty = spark.createDataFrame([], "doc_id long, text string")
    vdf, pieces = unigram_train(empty, vocab_size=8, rounds=1)
    assert pieces == [] and vdf.count() == 0
    # a 100-char word segments in bounded pieces; whitespace-only and
    # empty docs count zero
    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "   "), (3, "")], "doc_id long, text string"
    )
    _, pieces = unigram_train(docs, vocab_size=8, rounds=1)
    out = {r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
           for r in unigram_segment(docs, pieces).collect()}
    assert out[2] == (0, 0) and out[3] == (0, 0)
    assert out[1][0] == 1 and 25 <= out[1][1] <= 100  # <=4 chars/piece


def test_viterbi_long_word_guard_bounded_and_blockwise():
    """A 100 KB blob 'word' must segment in bounded time via the
    independent-block rule, and the blocks must compose exactly."""
    import time

    from pdf_extract_spark.functions.unigram import (
        MAX_VITERBI_WORD,
        viterbi_pieces,
    )

    counts = {"a": 10, "b": 10, "ab": 50}
    denom = sum(counts.values()) + len(counts)
    blob = "ab" * 50_000  # 100k chars
    t0 = time.perf_counter()
    out = viterbi_pieces(blob, counts, denom, 4)
    assert time.perf_counter() - t0 < 5.0
    assert out == ["ab"] * 50_000
    # block boundary composition: result == concat of per-block results
    w = "ab" * ((MAX_VITERBI_WORD // 2) + 3)
    got = viterbi_pieces(w, counts, denom, 4)
    a = viterbi_pieces(w[:MAX_VITERBI_WORD], counts, denom, 4)
    b = viterbi_pieces(w[MAX_VITERBI_WORD:], counts, denom, 4)
    assert got == a + b


def test_driver_vs_distributed_parity(spark, monkeypatch):
    """The guarded driver path (r7) must match the distributed loop
    bit-for-bit: same seed list, same trained pieces, same per-doc
    segment counts."""
    import pdf_extract_spark.functions.unigram as ug

    rows = [(f"d{i}", "viterbi piece table unigram spark train loop "
                      * (1 + i % 4)) for i in range(25)] + [("de", "")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    vdf_a, p_a = ug.unigram_train(docs, vocab_size=48, rounds=2)
    seg_a = {r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
             for r in ug.unigram_segment(docs, p_a).collect()}
    monkeypatch.setattr(ug, "_DRIVER_VOCAB_MAX", 0)
    vdf_b, p_b = ug.unigram_train(docs, vocab_size=48, rounds=2)
    seg_b = {r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
             for r in ug.unigram_segment(docs, p_b).collect()}
    assert p_a == p_b
    assert sorted(map(tuple, vdf_a.collect())) == sorted(map(tuple, vdf_b.collect()))
    assert seg_a == seg_b
