"""BPE tokenizer training/segmentation (functions/bpe.py).

The distributed trainer is additionally oracled end-to-end against the
independent pure-Python golden (tools/gen_golden_bpe.py) via the
`bpe_merges` / `doc_bpe_tokens` driver rows; these tests pin the
algorithmic contract on hand-computable corpora plus the golden parity
at sf0.001.
"""

import duckdb
import pytest

from pdf_extract_spark.functions.bpe import bpe_segment, bpe_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_sennrich_example(spark):
    # the classic low/lower/newest/widest corpus: first merges must be
    # (e,s), (es,t), then the (count DESC, left ASC) tie-break picks
    # (l,o) over (o,w) at 7 and (e,w) over (n,e)/(w,est) at 6
    docs = _docs(
        spark,
        [("d1", "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest")],
    )
    mdf, merges = bpe_train(docs, 6)
    got = [(r["left"], r["right"], r["pair_count"]) for r in mdf.collect()]
    assert got == [
        ("e", "s", 9), ("es", "t", 9), ("l", "o", 7),
        ("lo", "w", 7), ("e", "w", 6), ("ew", "est", 6),
    ]
    assert [(m[0], m[1]) for m in merges] == [(g[0], g[1]) for g in got]


def test_left_greedy_overlap(spark):
    # 'aaa' under merge (a,a) segments left-greedily to ['aa','a'] —
    # the merged symbol is the concatenated string, never re-matched
    docs = _docs(spark, [("d", "aaa aaa aaa")])
    mdf, merges = bpe_train(docs, 1)
    assert [(m[0], m[1]) for m in merges] == [("a", "a")]
    # pair count: 2 overlapping (a,a) per word x 3 words
    assert mdf.collect()[0]["pair_count"] == 6
    seg = bpe_segment(docs, merges).collect()
    assert seg[0]["n_bpe_tokens"] == 2 * 3  # ['aa','a'] per word


def test_early_stop_and_empty(spark):
    # all-unique pairs (every count 1 < min 2) -> zero merges; empty
    # text docs survive segmentation with zero counts
    docs = _docs(spark, [("d1", "ab cd"), ("d2", "")])
    mdf, merges = bpe_train(docs, 5)
    assert merges == [] and mdf.count() == 0
    seg = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    assert seg["d1"]["n_words"] == 2 and seg["d1"]["n_bpe_tokens"] == 4
    assert seg["d2"]["n_words"] == 0 and seg["d2"]["n_bpe_tokens"] == 0


def test_partition_invariance(spark):
    # merge sequence must not depend on where partition cuts fall
    rows = [(f"d{i}", "spark shuffle spark sort shuffle merge " * (1 + i % 3))
            for i in range(40)]
    docs = _docs(spark, rows)
    _, m1 = bpe_train(docs.repartition(1), 8)
    _, m37 = bpe_train(docs.repartition(37), 8)
    assert m1 == m37


def test_golden_parity_sf0001(spark):
    """Engine vs the independent pure-Python golden at sf0.001 — full
    merge table AND per-doc token counts."""
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    fp = con.execute(
        "SELECT md5(string_agg(doc_id || '|' || text, '' ORDER BY doc_id)) "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    gm = con.execute(
        "SELECT rank, \"left\", \"right\", pair_count FROM "
        "'dist/golden_bpe_merges.parquet' WHERE corpus_fp = ? ORDER BY rank",
        [fp],
    ).fetchall()
    if not gm:
        pytest.skip("golden not generated for this corpus")
    mdf, merges = bpe_train(docs, 12)
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in mdf.orderBy("rank").collect()]
    assert got == gm
    gt = dict(
        con.execute(
            "SELECT doc_id, n_bpe_tokens FROM 'dist/golden_bpe_tokens.parquet' "
            "WHERE corpus_fp = ?",
            [fp],
        ).fetchall()
    )
    eng = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_segment(docs, merges).collect()}
    assert eng == gt


def test_pack_bpe_composition(spark):
    """Tokenizer-aware packing: chunks of the BPE token stream sum to
    exactly seq_len (except the final one) and cover every token."""
    from pdf_extract_spark.functions.bpe import bpe_segment, bpe_train
    from pdf_extract_spark.operators.pack import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _, merges = bpe_train(docs, 6)
    counts = bpe_segment(docs, merges)
    total = counts.groupBy().sum("n_bpe_tokens").collect()[0][0] + counts.count()
    out = pack_sequences(counts, 128, count_col="n_bpe_tokens").collect()
    by_chunk = {}
    for r in out:
        by_chunk.setdefault(r["chunk_id"], 0)
        by_chunk[r["chunk_id"]] += r["n_toks"]
    last = max(by_chunk)
    assert all(v == 128 for c, v in by_chunk.items() if c != last)
    assert sum(by_chunk.values()) == total


def test_driver_vs_distributed_parity(spark, monkeypatch):
    """The guarded driver-path trainer/segmenter (r7 optimization) must be
    bit-identical to the distributed incremental loop: same merge table,
    same per-doc piece counts."""
    import pdf_extract_spark.functions.bpe as bpe

    rows = [
        (f"d{i}", "spark shuffle spark sort shuffle merge bpe bpe zz zaa "
                  * (1 + i % 3))
        for i in range(30)
    ] + [("de", ""), ("da", "aaa baab aba")]
    docs = _docs(spark, rows)
    _, m_driver = bpe.bpe_train(docs, 8)
    seg_driver = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_segment(docs, m_driver).collect()
    }
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_MAX", 0)
    monkeypatch.setattr(bpe, "_DRIVER_SEGMENT_OPS_MAX", 0)
    _, m_dist = bpe.bpe_train(docs, 8)
    seg_dist = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_segment(docs, m_dist).collect()
    }
    assert m_driver == m_dist
    assert seg_driver == seg_dist


def test_distributed_golden_parity_sf0001(spark, monkeypatch):
    """The distributed loop (driver path disabled) still matches the
    independent golden — guards the fallback the 100-TB shape relies on."""
    import pdf_extract_spark.functions.bpe as bpe

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    fp = con.execute(
        "SELECT md5(string_agg(doc_id || '|' || text, '' ORDER BY doc_id)) "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    gm = con.execute(
        "SELECT rank, \"left\", \"right\", pair_count FROM "
        "'dist/golden_bpe_merges.parquet' WHERE corpus_fp = ? ORDER BY rank",
        [fp],
    ).fetchall()
    if not gm:
        pytest.skip("golden not generated for this corpus")
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_MAX", 0)
    mdf, _ = bpe.bpe_train(docs, 12)
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in mdf.orderBy("rank").collect()]
    assert got == gm
