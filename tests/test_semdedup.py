"""SemDeDup (operators/semdedup.py): hand-computed prune decisions on a
tiny constructed corpus, layout invariance, and the one-shuffle scale
gate."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_semdedup_hand_computed(spark):
    """Five 2D vectors, two near-twin pairs.  The pinned first-k Lloyd
    init seeds BOTH centroids inside the +x group (ids 0 and 1), so the
    converged cells are {0,1} and {2,3,4} — each cell keeps its
    least-central member first and cuts the >=0.95-cosine twin."""
    from pdf_extract_spark.operators.semdedup import semantic_dedup

    rows = [
        (0, [1.0, 0.05]),        # twin of 1 (cos ~ 0.99875)
        (1, [1.0, 0.0]),
        (2, [0.80, 0.60]),       # 37 deg off +x: cos to 3/4 < 0.95
        (3, [0.0, 1.0]),         # twin of 4 (cos ~ 0.99875)
        (4, [0.05, 1.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_dedup(emb, eps=0.05, n_centroids=2).collect()
    }
    assert len(out) == 5
    cell_a = {i for i in out if out[i]["cell"] == out[0]["cell"]}
    assert cell_a == {0, 1}
    assert len({out[i]["cell"] for i in (2, 3, 4)}) == 1
    keeps = {i: out[i]["keep"] for i in range(5)}
    # 2 has no >=0.95 neighbour, 3's only earlier-ordered peer is 2
    assert keeps[2] is True and keeps[3] is True
    # exactly one of each twin pair survives — the first-ordered one
    assert sorted([keeps[0], keeps[1]]) == [False, True]
    first_a = min((out[i]["cent_sim_x1m"], i) for i in (0, 1))[1]
    assert keeps[first_a] is True
    assert keeps[4] is False  # earlier-ordered 3 is its twin
    # cos(0,1) = 1/sqrt(1.0025): the dropped twin records that prefix
    assert out[0 if first_a == 1 else 1]["max_prefix_x1m"] == math.floor(
        1.0 / math.sqrt(1.0 + 0.05**2) * 1e6
    )
    # first-ordered member of each cell carries the sentinel prefix
    for cell_ids in ((0, 1), (2, 3, 4)):
        sentinel = [i for i in cell_ids if out[i]["max_prefix_x1m"] == -2_000_000]
        assert len(sentinel) == 1
        assert min((out[i]["cent_sim_x1m"], i) for i in cell_ids)[1] == sentinel[0]


def test_semdedup_dropped_have_close_prefix(spark):
    """Contract invariant on real data: keep=false iff the recorded
    prefix max reaches the quantized threshold."""
    from pdf_extract_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = semantic_dedup(emb, eps=0.7, n_centroids=16).collect()
    assert len(rows) == emb.count()
    thr = 1.0 - 0.7
    dropped = [r for r in rows if not r["keep"]]
    assert dropped, "synthetic corpus should contain semantic near-dups"
    for r in rows:
        close = r["max_prefix_x1m"] >= math.floor(thr * 1e6)
        # quantization only matters within 1e-6 of the threshold; the
        # synthetic corpus has no cosine that close to 0.3
        assert r["keep"] != close, r


def test_semdedup_partition_invariant(spark):
    """Cell membership, ordering, and prune decisions must not depend on
    the input layout."""
    from pdf_extract_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(map(tuple, semantic_dedup(emb).collect()))
    b = sorted(
        map(tuple, semantic_dedup(emb.repartition(13, "vec_id")).collect())
    )
    assert a == b and len(a) > 0


def test_semdedup_single_shuffle(spark):
    """Scale gate: exactly ONE hash exchange (on cell, feeding the
    grouped-map prune); the assign pass must stay narrow."""
    from pdf_extract_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    txt = plan_of(semantic_dedup(emb))
    n_exchange = txt.count("Exchange hashpartitioning")
    assert n_exchange == 1, txt[:3000]
    assert "hashpartitioning(cell" in txt, txt[:3000]
