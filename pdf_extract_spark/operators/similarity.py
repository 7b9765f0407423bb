"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline.  Broadcast the (small) query
    set against the full corpus; dot products via zip_with/aggregate HOFs
    (JVM-side, codegen) in double precision.
  * LSH-bucketed ANN — signed-random-projection signatures computed from a
    deterministic md5-seeded hyperplane family (no RNG state to ship),
    candidates restricted to matching buckets, exact re-rank inside.  The
    scale path: bucket join instead of cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x full scan; one shuffle for
    the per-query top-k window.  At 100 TB the scan is the cost — the
    query side stays broadcast as long as |queries| is small."""
    vecs = emb.select(
        F.col(id_col).alias("nbr_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    queries = vecs.filter(F.col("nbr_id").isin(query_ids)).select(
        F.col("nbr_id").alias("query_id"), F.col("v").alias("q")
    )
    scored = (
        vecs.crossJoin(F.broadcast(queries))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            cosine_similarity_col(F.col("q"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("long").alias("rank"))
    )


def all_pairs_cosine(
    emb: DataFrame,
    min_cos: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Exact all-pairs cosine near-dup: block x broadcast matrix multiply.

    One side of the O(n^2) comparison is broadcast as a dense numpy matrix;
    each task multiplies its row block against it (BLAS), emitting pairs
    with cos >= min_cos and id_a < id_b.  A row-pair equi/theta join with
    per-pair HOF folds is ~100x slower (measured: hang at 2k vectors vs
    seconds here).  Exact all-pairs is only sane while the matrix fits in
    executor memory (guarded); beyond that, candidate generation belongs to
    LSH (lsh_topk / minhash) and this kernel re-ranks candidates.
    """
    import numpy as np

    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).collect()
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"{len(rows)} vectors exceed the exact all-pairs broadcast guard; "
            "use lsh_topk/minhash candidates + re-rank"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def block_pairs(batches):
        import pandas as pd

        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            if len(pdf):
                block = np.array(list(pdf[vec_col]), dtype=np.float64)
                bids = pdf[id_col].to_numpy(dtype=np.int64)
                bn = np.sqrt((block * block).sum(axis=1))
                sims = (block @ b_mat.T) / np.outer(bn, b_norms)
                for i in range(len(bids)):
                    mask = (sims[i] >= min_cos) & (b_ids > bids[i])
                    for j in np.nonzero(mask)[0]:
                        out_a.append(int(bids[i]))
                        out_b.append(int(b_ids[j]))
                        out_c.append(int(np.floor(sims[i, j] * 1000)))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_x1000": out_c})

    return emb.select(id_col, vec_col).mapInPandas(
        block_pairs, "id_a long, id_b long, cos_x1000 long"
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, i) derives
    from md5(p:i) mapped to [-1, 1).  Stateless — identical on every
    executor and every engine, no RNG to seed."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int.from_bytes(hashlib.md5(f"{p}:{i}".encode()).digest()[:8], "big")
            row.append(h / float(1 << 63) - 1.0)
        planes.append(row)
    return planes


def srp_bucket(vec_col, planes: list[list[float]]):
    """Signed-random-projection bucket id (bit per hyperplane)."""
    bucket = F.lit(0).cast("long")
    for bit, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share an SRP bucket with the query, exact
    cosine re-rank within.  Equi-join on bucket replaces the cross join —
    the piece that makes 10^12-vector corpora feasible.  Recall < 1.0 by
    construction (that's the trade)."""
    first = emb.select(vec_col).first()
    dim = len(first[0]) if first else 0
    planes = _hyperplanes(dim, n_planes)
    vecs = emb.select(
        F.col(id_col).alias("nbr_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    queries = vecs.filter(F.col("nbr_id").isin(query_ids)).select(
        F.col("nbr_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        vecs.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            cosine_similarity_col(F.col("q"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("long").alias("rank"))
    )
