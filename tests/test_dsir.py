"""DSIR importance weights / Gumbel-top-k resampling (functions/dsir.py):
hand-computed expectations from an independent pure-Python reimplementation
of the hashed-feature + quantized-weight math, plus partition invariance."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _py_dsir(rows, buckets=4096):
    """Independent scalar reimplementation: rows = [(doc_id, y, text)] ->
    {doc_id: (n_feats, weight_x1000)}."""
    def grams(text):
        ts = text.strip().lower().split()
        if text.strip() == "":
            ts = [""]
        gs = list(ts)
        gs += [" ".join(ts[i:i + 2]) for i in range(len(ts) - 1)]
        return gs

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    feats = {d: [bucket(g) for g in grams(t)] for d, _, t in rows}
    c_t, c_r = {}, {}
    n_t = n_r = 0
    for d, y, _ in rows:
        for b in feats[d]:
            if y:
                c_t[b] = c_t.get(b, 0) + 1
                n_t += 1
            else:
                c_r[b] = c_r.get(b, 0) + 1
                n_r += 1

    def bits(c, n):
        return math.floor(math.log2((c + 1) / (n + buckets)) * 1000)

    out = {}
    for d, y, _ in rows:
        w = sum(bits(c_t.get(b, 0), n_t) - bits(c_r.get(b, 0), n_r)
                for b in feats[d])
        out[d] = (len(feats[d]), w)
    return out


ROWS = [
    (1, True, "the quick brown fox jumps over the lazy dog"),
    (2, True, "the quick brown fox"),
    (3, False, "lorem ipsum dolor sit amet consectetur"),
    (4, False, "the quick brown dog sleeps"),
    (5, False, "completely unrelated crawl noise tokens here"),
    (6, False, ""),
]


def _df(spark):
    return spark.createDataFrame(
        [(d, "src0" if y else "crawl", t) for d, y, t in ROWS],
        "doc_id long, source string, text string",
    )


def test_dsir_weights_match_independent_reimpl(spark):
    from pdf_extract_spark.functions.dsir import dsir_weights

    got = {
        r["doc_id"]: (r["n_feats"], r["weight_x1000"])
        for r in dsir_weights(_df(spark), F.col("source") == "src0").collect()
    }
    assert got == _py_dsir(ROWS)


def test_dsir_target_docs_score_higher():
    """The target docs' vocabulary overlap must push doc 4 (shares 'the
    quick brown' with the target) above doc 5 (no overlap)."""
    w = _py_dsir(ROWS)
    per_feat = {d: w[d][1] / w[d][0] for d in (4, 5)}
    assert per_feat[4] > per_feat[5]


def test_dsir_resample_selects_top_gumbel_keys(spark):
    from pdf_extract_spark.functions.dsir import dsir_resample

    sel = dsir_resample(_df(spark), F.col("source") == "src0", 2).collect()
    assert len(sel) == 2
    assert all(not r["doc_id"] in (1, 2) for r in sel)  # raw docs only
    # keys must equal the independent formula
    w = _py_dsir(ROWS)
    keys = {}
    for d in (3, 4, 5, 6):
        u = (int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16) + 0.5) / 2**52
        keys[d] = (math.floor(w[d][1] * 0.6931471805599453)
                   + math.floor(-math.log(-math.log(u)) * 1000))
    want = sorted(keys, key=lambda d: (-keys[d], d))[:2]
    assert sorted(r["doc_id"] for r in sel) == sorted(want)
    for r in sel:
        assert r["key_x1000"] == keys[r["doc_id"]]


def test_dsir_weights_partition_invariant(spark):
    from pdf_extract_spark.functions.dsir import dsir_weights

    df = _df(spark)
    a = sorted(map(tuple, dsir_weights(df, F.col("source") == "src0").collect()))
    b = sorted(map(tuple,
                   dsir_weights(df.repartition(7), F.col("source") == "src0")
                   .collect()))
    assert a == b


def test_dsir_bucket_weight_table_is_broadcast(spark):
    """The per-bucket weight table (<= `buckets` rows) must reach the
    gram stream as a broadcast join, never a shuffle."""
    from pdf_extract_spark.functions.dsir import dsir_weights

    plan = (dsir_weights(_df(spark), F.col("source") == "src0")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
