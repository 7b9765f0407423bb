"""Tests for dedup / similarity / text-analysis / multimodal operators."""

import math

from pyspark.sql import functions as F

from pdf_extract_spark.functions.text import document_stats
from pdf_extract_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from pdf_extract_spark.operators.multimodal import extract_media_features
from pdf_extract_spark.operators.similarity import brute_force_topk, lsh_topk


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different content with other words here"),
        (5, "El rapido zorro marron salta sobre el perro y la que de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark):
    out = dedup_exact(_docs(spark)).collect()
    groups = {r["fp"]: r for r in out}
    assert len(groups) == 4  # 1&2 collapse
    dup = [r for r in out if r["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["canonical_doc_id"] == 1


def test_dedup_exact_normalizes_whitespace_and_case(spark):
    rows = [(1, "Hello  World"), (2, "hello world"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df).collect()
    assert len(out) == 2


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(_docs(spark)).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup likely shares a band
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard(spark):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard_x1000"]
        for r in ngram_jaccard_pairs(_docs(spark), threshold_x1000=100).collect()
    }
    assert out[(1, 2)] == 1000  # identical
    assert 100 <= out[(1, 3)] < 1000  # near dup
    assert (1, 4) not in out


def test_simhash_distance_orders_similarity(spark):
    from pdf_extract_spark.operators.dedup import simhash

    out = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(out[1], out[2]) == 0  # identical docs
    assert ham(out[1], out[3]) < ham(out[1], out[4])  # near-dup closer


def test_simhash_near_pairs(spark):
    # banding (4x16-bit) guarantees recall only for <=3 differing bits:
    # exact dups always pair; far docs never do
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(_docs(spark), max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs and (1, 5) not in pairs


def _emb(spark, n=40, dim=8):
    import random

    rnd = random.Random(42)
    rows = []
    for i in range(n):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(dim)]))
    # vec 100: exact copy of vec 0 -> must be rank-1 neighbor of 0
    rows.append((100, list(rows[0][1])))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact_copy_is_rank1(spark):
    out = brute_force_topk(_emb(spark), query_ids=[0], k=3).collect()
    assert out[0]["rank"] == 1 and out[0]["nbr_id"] == 100
    assert len(out) == 3


def test_brute_force_matches_python_reference(spark):
    emb = _emb(spark)
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    q = rows[0]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    expected = sorted(
        ((cos(q, v), k) for k, v in rows.items() if k != 0),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    got = brute_force_topk(emb, query_ids=[0], k=5).orderBy("rank").collect()
    assert [r["nbr_id"] for r in got] == [k for _, k in expected]


def test_lsh_topk_subset_of_brute_force_universe(spark):
    emb = _emb(spark)
    got = lsh_topk(emb, query_ids=[0], k=3, n_planes=2).collect()
    # identical vector always lands in the same bucket -> present at rank 1
    assert got and got[0]["nbr_id"] == 100 and got[0]["rank"] == 1


def test_document_stats_shapes(spark):
    out = {r["doc_id"]: r for r in document_stats(_docs(spark)).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[1]["lang_pred"] == "en"
    assert out[5]["lang_pred"] == "es"
    assert out[4]["lang_pred"] == "und" or out[4]["lang_pred"] in ("en",)
    assert out[1]["fingerprint"] == out[2]["fingerprint"]


def test_media_features_deterministic(spark):
    rows = [("m1", "image", b"\x01\x02\x03"), ("m2", "image", b"\x01\x02\x03"), ("m3", "image", b"other")]
    media = spark.createDataFrame(rows, "media_id string, media_kind string, payload binary")
    out = {r["media_id"]: r for r in extract_media_features(media, num_partitions=2).collect()}
    assert out["m1"]["sha256"] == out["m2"]["sha256"]
    assert out["m1"]["width"] == out["m2"]["width"]
    assert out["m1"]["sha256"] != out["m3"]["sha256"]
    assert out["m1"]["byte_len"] == 3
