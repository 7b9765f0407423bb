"""Multinomial NB classifier (functions/classify.py): hand-computed
value semantics on a tiny corpus and the JVM-only plan gate."""

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bits(c: int, n: int, v: int) -> int:
    """Spec math for one (token, class) weight — never the code under
    test: floor(log2((c+1)/(n+v)) * 1000)."""
    return math.floor(math.log2((c + 1) / (n + v)) * 1000)


def _prior(d: int, d_pos: int, d_neg: int) -> int:
    return math.floor(math.log2(d / (d_pos + d_neg)) * 1000)


def test_nb_score_hand_computed(spark):
    """3-doc corpus, every weight recomputed from the smoothing formula:
    pos slice = {good good nice}, neg = {bad ugly} + {good bad}."""
    from pdf_extract_spark.functions.classify import nb_score

    rows = [
        (1, "good good nice", "src0"),
        (2, "bad ugly", "crawl"),
        (3, "good bad", "crawl"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r.asDict()
        for r in nb_score(docs, F.col("source") == "src0").collect()
    }
    n_pos, n_neg, v, d_pos, d_neg = 3, 4, 4, 1, 2
    w = {  # (token): (bits_pos, bits_neg) from per-class counts
        "good": (_bits(2, n_pos, v), _bits(1, n_neg, v)),
        "nice": (_bits(1, n_pos, v), _bits(0, n_neg, v)),
        "bad": (_bits(0, n_pos, v), _bits(2, n_neg, v)),
        "ugly": (_bits(0, n_pos, v), _bits(1, n_neg, v)),
    }
    pp, pn = _prior(d_pos, d_pos, d_neg), _prior(d_neg, d_pos, d_neg)
    expect = {
        1: ["good", "good", "nice"],
        2: ["bad", "ugly"],
        3: ["good", "bad"],
    }
    for doc_id, toks in expect.items():
        s_pos = sum(w[t][0] for t in toks) + pp
        s_neg = sum(w[t][1] for t in toks) + pn
        got = out[doc_id]
        assert got["n_tokens"] == len(toks)
        assert got["score_pos_x1000"] == s_pos, (doc_id, got)
        assert got["score_neg_x1000"] == s_neg, (doc_id, got)
        assert got["margin_x1000"] == s_pos - s_neg
        assert got["pred_pos"] == (s_pos > s_neg)
    # the trusted doc classifies pos, the pure-crawl doc neg
    assert out[1]["pred_pos"] and not out[2]["pred_pos"]


def test_nb_score_external_frame_oov(spark):
    """DCLM pattern: train on the labeled slice, score a separate frame.
    Out-of-vocabulary tokens must contribute the smoothing floor
    bits(0) = floor(log2(1/(n_c+V))*1000), not drop the doc."""
    from pdf_extract_spark.functions.classify import nb_score

    train = spark.createDataFrame(
        [
            (1, "good good nice", "src0"),
            (2, "bad ugly", "crawl"),
            (3, "good bad", "crawl"),
        ],
        "doc_id long, text string, source string",
    )
    score = spark.createDataFrame(
        [(10, "good zork", "x")], "doc_id long, text string, source string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in nb_score(
            train, F.col("source") == "src0", score_docs=score
        ).collect()
    }
    n_pos, n_neg, v, d_pos, d_neg = 3, 4, 4, 1, 2
    s_pos = _bits(2, n_pos, v) + _bits(0, n_pos, v) + _prior(d_pos, d_pos, d_neg)
    s_neg = _bits(1, n_neg, v) + _bits(0, n_neg, v) + _prior(d_neg, d_pos, d_neg)
    assert set(out) == {10}
    assert out[10]["n_tokens"] == 2
    assert out[10]["score_pos_x1000"] == s_pos
    assert out[10]["score_neg_x1000"] == s_neg


def test_nb_score_degenerate_label_raises(spark):
    """A pos_label matching zero (or all) docs must raise loudly, never
    emit NULL scores from log2(0)."""
    import pytest
    from pdf_extract_spark.functions.classify import nb_score

    docs = spark.createDataFrame(
        [(1, "a b", "s"), (2, "c d", "s")],
        "doc_id long, text string, source string",
    )
    for label in (F.lit(False), F.lit(True)):
        with pytest.raises(Exception, match="non-empty classes"):
            nb_score(docs, label).collect()


def test_nb_score_no_python_udf(spark):
    """Train + score must stay JVM-side: explode/join/agg built-ins only."""
    from pdf_extract_spark.functions.classify import nb_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(nb_score(docs, F.col("source") == "src0"))
    assert "Python" not in txt, txt[:2000]


def test_nb_topk_exact_selection(spark):
    """nb_topk_filter must return exactly the ceil(n*pct/100) docs that
    rank first by (margin DESC, doc_id ASC) — verified against a local
    sort of the full score table."""
    from pdf_extract_spark.functions.classify import nb_score, nb_topk_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lab = F.col("source").isin("src0", "src1", "src2")
    scored = nb_score(docs, lab).collect()
    expect = {
        r["doc_id"]
        for r in sorted(scored, key=lambda r: (-r["margin_x1000"], r["doc_id"]))[
            : -(-len(scored) * 10 // 100)
        ]
    }
    got = {r["doc_id"] for r in nb_topk_filter(docs, lab, pct=10).collect()}
    assert got == expect and len(got) == -(-len(scored) * 10 // 100)


def test_nb_topk_all_ties_boundary(spark):
    """Degenerate corpus where every doc lands on ONE margin value: the
    boundary path must hand back exactly the k smallest doc_ids, and the
    histogram/boundary windows must all be partitioned by the physical
    partition id (no corpus-wide single-task window)."""
    import re
    from pdf_extract_spark.functions.classify import nb_topk_filter

    docs = spark.createDataFrame(
        [(i, "same text every time", "src0" if i % 2 else "crawl")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = nb_topk_filter(docs, F.col("source") == "src0", pct=40)
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 2, 3}
    txt = out._jdf.queryExecution().executedPlan().toString()
    wins = re.findall(r"Window \[[^\n]*", txt)
    for w in wins:
        spec = w.split("windowspecdefinition")[-1]
        # unpartitioned windows may only run over the P-row pid-totals
        assert "pid" in spec, w


def test_nb_score_partition_invariant(spark):
    """Integer-quantized weights sum identically regardless of layout."""
    from pdf_extract_spark.functions.classify import nb_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lab = F.col("source").isin("src0", "src1", "src2")
    a = sorted(map(tuple, nb_score(docs, lab).collect()))
    b = sorted(map(tuple, nb_score(docs.repartition(13, "doc_id"), lab).collect()))
    assert a == b and len(a) > 0
