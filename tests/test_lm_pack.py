"""LM perplexity scoring (functions/lm.py) and sequence packing
(operators/pack.py): value semantics, scale-shape gates, and the
partition-invariance contract the two-phase prefix sum promises."""

import math
import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# lm_perplexity
# ---------------------------------------------------------------------------


def _expected_bits(c_bg: int, c_ctx: int, v: int) -> int:
    return math.floor(-math.log2((c_bg + 1) / (c_ctx + v)) * 1000)


def test_lm_perplexity_hand_computed(spark):
    """Tiny corpus with a hand-computable bigram LM: reference slice is
    'a b a b' (bigrams ab, ba, ab; vocab {a, b}); scored docs include an
    in-domain one and an all-OOV one, which must score strictly worse."""
    from pdf_extract_spark.functions.lm import lm_perplexity

    rows = [
        (1, "a b a b", "ref"),
        (2, "a b", "other"),
        (3, "x y", "other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r.asDict()
        for r in lm_perplexity(docs, F.col("source") == "ref").collect()
    }
    v = 2  # vocab of the ref slice
    # ref doc 1: bigrams ab(c=2,ctx a=2), ba(c=1,ctx b=1), ab
    ab = _expected_bits(2, 2, v)
    ba = _expected_bits(1, 1, v)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_bits_x1000"] == 2 * ab + ba
    assert out[2]["n_bigrams"] == 1 and out[2]["sum_bits_x1000"] == ab
    # fully OOV: c_bg=0, c_ctx=0 -> bits = -log2(1/2)*1000 = 1000
    assert out[3]["sum_bits_x1000"] == _expected_bits(0, 0, v) == 1000
    assert out[3]["avg_bits_x1000"] > out[2]["avg_bits_x1000"]


def test_lm_perplexity_short_docs_excluded(spark):
    """Docs with <2 tokens carry no bigram evidence and are excluded —
    the documented contract (callers left-join the input spine)."""
    from pdf_extract_spark.functions.lm import lm_perplexity

    docs = spark.createDataFrame(
        [(1, "one", "ref"), (2, "two tokens here", "ref")],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"] for r in lm_perplexity(docs, F.lit(True)).collect()}
    assert got == {2}


def test_lm_perplexity_no_python_udf(spark):
    """The whole train+score pipeline must stay JVM-side: built-in
    explode/join/agg only, no Python evaluation in the plan."""
    from pdf_extract_spark.functions.lm import lm_perplexity

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(lm_perplexity(docs, F.col("source") == "src0"))
    assert "Python" not in txt, txt[:2000]


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_partition_invariant(spark):
    """The shard map depends only on doc_id order, never on where the
    range-partition cuts fall: different partition counts (and input
    layouts) must emit identical rows."""
    from pdf_extract_spark.operators.pack import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs, 128, num_parts=3).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(17, "doc_id"), 128, num_parts=11
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_pack_invariants(spark):
    """Stream-accounting invariants: every chunk except the last holds
    exactly seq_len tokens; each doc's pieces cover token_count+1 tokens
    contiguously from doc_off 0."""
    from pdf_extract_spark.functions.text import token_count
    from pdf_extract_spark.operators.pack import pack_sequences

    seq = 128
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = pack_sequences(docs, seq).collect()
    by_chunk: dict[int, int] = {}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + r["n_toks"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    last = max(by_chunk)
    assert set(by_chunk) == set(range(last + 1))  # no chunk gaps
    for k, tot in by_chunk.items():
        assert tot == seq or (k == last and 0 < tot <= seq), (k, tot)
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", (token_count(F.col("text")) + 1).alias("n")
        ).collect()
    }
    for doc_id, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["doc_off"])
        assert pieces[0]["doc_off"] == 0
        covered = 0
        for p in pieces:
            assert p["doc_off"] == covered  # contiguous, no overlap
            covered += p["n_toks"]
        assert covered == ntok[doc_id]


def test_pack_prefix_sum_is_two_phase(spark):
    """Scale gate: the corpus-sized window must partition by the physical
    partition id (parallel local cumsum); the only unpartitioned window
    may run over the P-row totals frame.  A naive global
    sum().over(orderBy) plan has ONE unpartitioned window over the scan
    and would fail the partition-spec assertion."""
    from pdf_extract_spark.operators.pack import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(pack_sequences(docs, 128, num_parts=4))
    wins = re.findall(r"Window \[[^\n]*", txt)
    assert len(wins) == 2, txt[:2000]
    partitioned = [w for w in wins if "pid" in w.split("windowspecdefinition")[-1]]
    # the corpus cumsum window carries pid in its partition spec
    assert any("local_end" in w and "pid" in w for w in wins), wins
    assert partitioned, wins


# ---------------------------------------------------------------------------
# ppl_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


def test_ppl_buckets_thirds_and_order(spark):
    """Buckets must cut each source's (avg_bits, doc_id) ranking into
    exact integer thirds: with 6 scored docs in one source, ranks 1-2 =
    head, 3-4 = middle, 5-6 = tail, and every head doc scores <= every
    tail doc."""
    from pdf_extract_spark.functions.lm import ppl_buckets

    rows = [("r", "a b a b a b", "src0")] + [
        (f"d{i}", " ".join(["a b"] * (i + 1)) + " zz" * i, "srcX")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {
        r["doc_id"]: r
        for r in ppl_buckets(docs, F.col("source") == "src0").collect()
    }
    got = [(out[f"d{i}"]["ppl_rank"], out[f"d{i}"]["bucket"]) for i in range(6)]
    by_rank = sorted(got)
    assert [b for _, b in by_rank] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ], got
    heads = [out[k]["avg_bits_x1000"] for k in out if out[k]["bucket"] == "head"
             and out[k]["doc_id"].startswith("d")]
    tails = [out[k]["avg_bits_x1000"] for k in out if out[k]["bucket"] == "tail"]
    assert max(heads) <= min(tails)


def test_ppl_buckets_partition_invariant(spark):
    """Rank and bucket assignment must not depend on partition cuts."""
    from pdf_extract_spark.functions.lm import ppl_buckets

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ref = F.col("source") == "src0"
    a = {(r["doc_id"], r["ppl_rank"], r["bucket"])
         for r in ppl_buckets(docs.repartition(1), ref, num_parts=3).collect()}
    b = {(r["doc_id"], r["ppl_rank"], r["bucket"])
         for r in ppl_buckets(docs.repartition(17), ref, num_parts=11).collect()}
    assert a == b


def test_ppl_buckets_rank_is_grouped_two_phase(spark):
    """Scale gate (the source_quota lesson): no corpus-sized window may
    partition by source alone — every corpus-sized window must carry the
    physical partition id; unpartitioned-or-source-only windows may only
    run over the (P x n_sources)-row counts frame."""
    from pdf_extract_spark.functions.lm import ppl_buckets

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(ppl_buckets(docs, F.col("source") == "src0", num_parts=4))
    wins = re.findall(r"Window \[[^\n]*", txt)
    corpus_wins = [w for w in wins if "local_rn" in w]
    assert corpus_wins and all("pid" in w for w in corpus_wins), wins


# ---------------------------------------------------------------------------
# blocklist_flags (C4 badwords filter)
# ---------------------------------------------------------------------------


def test_blocklist_boundaries_phrases_case(spark):
    from pdf_extract_spark.functions.text import blocklist_flags

    docs = spark.createDataFrame(
        [
            ("d1", "a SLOW query"),            # case-insensitive word hit
            ("d2", "slower queries"),          # substring must NOT match
            ("d3", "the broken pipeline smokes a broken pipeline"),  # phrase x2
            ("d4", "broken. pipeline"),        # interrupted phrase: no hit
            ("d5", "clean text"),
            ("d6", "slow, slow and slow"),     # punctuation-adjacent words
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: (r["n_blocked"], r["keep"])
           for r in blocklist_flags(docs, ["slow", "broken pipeline"]).collect()}
    assert got == {
        "d1": (1, False), "d2": (0, True), "d3": (2, False),
        "d4": (0, True), "d5": (0, True), "d6": (3, False),
    }


def test_blocklist_is_scan_side_jvm_only(spark):
    from pdf_extract_spark.functions.text import blocklist_flags

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = blocklist_flags(docs, ["slow"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_ppl_buckets_null_source_kept(spark):
    """Docs with a NULL source form their own bucket group (window
    semantics) instead of being dropped by null-unsafe joins — the
    review-found divergence vs the SQL oracle."""
    from pdf_extract_spark.functions.lm import ppl_buckets

    rows = [("r", "a b a b", "src0"), ("x1", "a b c", None),
            ("x2", "a b c d", None), ("x3", "q z q z", None)]
    docs = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = ppl_buckets(docs, F.col("source") == "src0").collect()
    nulls = [r for r in out if r["source"] is None]
    assert {r["doc_id"] for r in nulls} == {"x1", "x2", "x3"}
    assert sorted(r["ppl_rank"] for r in nulls) == [1, 2, 3]
    assert {r["bucket"] for r in nulls} == {"head", "middle", "tail"}


def test_blocklist_punctuation_edges_and_empty(spark):
    from pdf_extract_spark.functions.text import blocklist_flags

    docs = spark.createDataFrame(
        [("d1", "we use c++ here"), ("d2", "clean"), ("d3", "data_leak now")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["n_blocked"]
           for r in blocklist_flags(docs, ["c++", "data_leak"]).collect()}
    assert got == {"d1": 1, "d2": 0, "d3": 1}
    # empty list (and empty-string terms) block nothing
    empty = {r["doc_id"]: (r["n_blocked"], r["keep"])
             for r in blocklist_flags(docs, []).collect()}
    assert all(v == (0, True) for v in empty.values())
    empty2 = {r["doc_id"]: r["keep"]
              for r in blocklist_flags(docs, [""]).collect()}
    assert all(empty2.values())


# ---------------------------------------------------------------------------
# shuffle_shards (deterministic global shuffle + balanced sharding)
# ---------------------------------------------------------------------------


def test_shuffle_shards_invariants(spark):
    from pdf_extract_spark.operators.pack import shuffle_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = shuffle_shards(docs, 7, num_parts=5).collect()
    n = len(out)
    ranks = sorted(r["shuffle_rank"] for r in out)
    assert ranks == list(range(n))            # a permutation, 0-based
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert set(sizes) == set(range(7))
    assert max(sizes.values()) - min(sizes.values()) <= 1   # balanced
    # pos_in_shard is 0..size-1 within each shard, ordered by rank
    by_shard = {}
    for r in sorted(out, key=lambda r: r["shuffle_rank"]):
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for s, poss in by_shard.items():
        assert poss == list(range(len(poss)))


def test_shuffle_shards_partition_invariant(spark):
    from pdf_extract_spark.operators.pack import shuffle_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {(r["doc_id"], r["shuffle_rank"], r["shard"], r["pos_in_shard"])
         for r in shuffle_shards(docs.repartition(1), 16, num_parts=3).collect()}
    b = {(r["doc_id"], r["shuffle_rank"], r["shard"], r["pos_in_shard"])
         for r in shuffle_shards(docs.repartition(23), 16, num_parts=11).collect()}
    assert a == b


def test_shuffle_shards_rank_is_two_phase(spark):
    from pdf_extract_spark.operators.pack import shuffle_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(shuffle_shards(docs, 8, num_parts=4))
    wins = re.findall(r"Window \[[^\n]*", txt)
    corpus_wins = [w for w in wins if "local_rn" in w]
    assert corpus_wins and all("pid" in w for w in corpus_wins), wins


def test_quantile_sketch_accuracy_and_bounds(spark):
    """Sketch estimates are within one bucket width of the exact
    quantile, and cum counts satisfy the rank definition."""
    from pdf_extract_spark.operators.sketch import histogram_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r["q_x100"]: r
           for r in histogram_quantiles(ev, "value", [5000, 9900]).collect()}
    import math

    vals = sorted(r["value"] for r in ev.select("value").collect())
    n = len(vals)
    width = (vals[-1] - vals[0]) / 1024
    for q in (5000, 9900):
        exact = vals[math.ceil(q / 10000 * n) - 1]
        est = got[q]["est_x1000"] / 1000.0
        assert abs(est - exact) <= width + 1e-9, (q, est, exact, width)
        assert got[q]["cum_count"] * 10000 >= q * n


def test_lm_trigram_hand_computed(spark):
    """Reference 'a b c a b c': trigrams abc(2 via overlap? no — a b c,
    b c a, c a b, a b c = abc x2, bca, cab), contexts ab x2, bc, ca;
    vocab {a,b,c}.  An in-domain doc scores P(c|ab)=(2+1)/(2+3)=3/5."""
    import math

    from pdf_extract_spark.functions.lm import lm_trigram_perplexity

    docs = spark.createDataFrame(
        [("r", "a b c a b c", "src0"), ("d", "a b c", "srcX"),
         ("s", "z z", "srcX")],
        "doc_id string, text string, source string",
    )
    out = {r["doc_id"]: r for r in
           lm_trigram_perplexity(docs, F.col("source") == "src0").collect()}
    exp = math.floor(-math.log2(3 / 5) * 1000)
    assert out["d"]["n_trigrams"] == 1
    assert out["d"]["sum_bits_x1000"] == exp
    assert "s" not in out  # <3 tokens excluded
    # the reference doc itself scores its own 4 trigrams
    assert out["r"]["n_trigrams"] == 4


def test_quantile_sketch_excludes_nulls(spark):
    """NULL values are excluded (approx_percentile semantics) — they
    must not be filed as maximum-value observations (review repro:
    {1,2,3,NULL,NULL} reported median 3.0)."""
    from pdf_extract_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (None,)], "value double"
    )
    got = {r["q_x100"]: r for r in
           histogram_quantiles(df, "value", [5000]).collect()}
    assert abs(got[5000]["est_x1000"] / 1000.0 - 2.0) <= (3.0 - 1.0) / 1024 + 1e-9


def test_blocklist_whitespace_terms_ignored(spark):
    """A whitespace-only term must be dropped, not compiled into a '[ ]'
    alternation branch that blocks every document containing a space;
    surrounding whitespace on a real term is trimmed."""
    from pdf_extract_spark.functions.text import blocklist_flags

    docs = spark.createDataFrame(
        [("a", "plain harmless words"), ("b", "the banned word")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["keep"]
           for r in blocklist_flags(docs, [" ", "\t", "  banned  "]).collect()}
    assert got == {"a": True, "b": False}
