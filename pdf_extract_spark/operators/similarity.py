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
    num_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine near-dup: DISTRIBUTED block-nested-loop
    matrix multiply — no driver-side collect of the vector table.

    Every vector is hashed into one of `num_blocks` blocks; each unordered
    block pair (i, j) becomes one task whose input is the rows of blocks i
    and j (each vector ships to exactly `num_blocks` tasks), and the task
    computes the dense i x j cosine matrix with BLAS, emitting pairs with
    cos >= min_cos and id_a < id_b exactly once.

    Scale shape: shuffle volume = num_blocks x corpus (tune num_blocks ~
    sqrt(cluster cores)); per-task memory = 2/num_blocks of the corpus.
    Exact all-pairs is inherently O(n^2) compute — beyond re-rank scale,
    candidate generation belongs to LSH (lsh_topk / minhash) and this
    kernel re-ranks candidate blocks.  A row-pair equi/theta join with
    per-pair HOF folds is ~100x slower (measured: hang at 2k vectors vs
    seconds here)."""
    import numpy as np
    import pandas as pd

    B = int(num_blocks)

    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(B)).cast("int").alias("blk"),
    )
    # replicate each row into every unordered block pair it belongs to:
    # for other-block o, pair key = (min(blk,o), max(blk,o)); o == blk is
    # the single within-block copy.
    rows = base.select(
        "vid",
        "v",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("o"),
    ).withColumn(
        "pk", (F.least("blk", "o") * B + F.greatest("blk", "o")).cast("int")
    ).drop("o")

    def pair_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_x1000": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cos_x1000": "int64"}
        )
        if not len(pdf):
            return empty
        pk = int(pdf["pk"].iloc[0])
        b_lo, b_hi = pk // B, pk % B
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        blks = pdf["blk"].to_numpy()
        mat = np.array(list(pdf["v"]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            if b_lo == b_hi:
                sims = (mat @ mat.T) / np.outer(norms, norms)
                mask = (sims >= min_cos) & (ids[None, :] > ids[:, None])
                ia, ja = np.nonzero(mask)
                id_a, id_b = ids[ia], ids[ja]
                cos = sims[ia, ja]
            else:
                lo = blks == b_lo
                hi = ~lo
                sims = (mat[lo] @ mat[hi].T) / np.outer(norms[lo], norms[hi])
                mask = sims >= min_cos
                ia, ja = np.nonzero(mask)
                xa, xb = ids[lo][ia], ids[hi][ja]
                id_a, id_b = np.minimum(xa, xb), np.maximum(xa, xb)
                cos = sims[ia, ja]
        return pd.DataFrame(
            {
                "id_a": id_a,
                "id_b": id_b,
                "cos_x1000": np.floor(cos * 1000).astype(np.int64),
            }
        )

    return rows.groupBy("pk").applyInPandas(
        pair_fn, "id_a long, id_b long, cos_x1000 long"
    )


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (t, p, i) derives
    from md5(t:p:i) mapped to [-1, 1).  Stateless — identical on every
    executor and every engine, no RNG to seed."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{table}:{p}:{i}".encode()).digest()[:8], "big"
            )
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


def _train_sample(
    emb: DataFrame,
    train_cap: int,
    id_col: str,
    vec_col: str,
):
    """The shared deterministic bounded training sample (xxhash64-pmod
    filter in id order, 512 MiB driver guard) behind every quantizer
    trainer — ONE definition so the coarse, PQ, and IVF-PQ paths can
    never drift, and callers that need both quantizers collect it
    once."""
    import numpy as np

    total = emb.count()
    frac_pct = max(1, min(100, int(100 * train_cap / max(total, 1))))
    sample = (
        emb.select(id_col, vec_col)
        .filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(100))
            < frac_pct
        )
        .orderBy(id_col)
        .limit(train_cap)
        .collect()
    )
    train = np.array([r[1] for r in sample], dtype=np.float64)
    if train.nbytes > 512 * 1024 * 1024:
        raise ValueError(
            f"quantizer train sample is {train.nbytes >> 20} MiB "
            f"({len(train)} x {train.shape[1]} f64): lower train_cap — "
            "the quantizer needs only a bounded sample (faiss-style)"
        )
    return train


def _coarse_lloyd(train, n_centroids: int):
    """First-k-init 10-iteration float64 Lloyd over the sample matrix
    (the coarse-quantizer kernel shared by train_centroids and
    ivfpq_topk)."""
    cent = train[:n_centroids].copy()
    for _ in range(10):
        # argmin ||v-c||^2 = argmin (|c|^2 - 2 v.c): (n,K) temporaries only,
        # never the (n,K,dim) broadcast form (~160 MB/iter at defaults)
        c2 = (cent * cent).sum(axis=1)
        assign = (c2[None, :] - 2.0 * (train @ cent.T)).argmin(axis=1)
        for c in range(n_centroids):
            members = train[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def train_centroids(
    emb: DataFrame,
    n_centroids: int,
    train_cap: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse-quantizer training shared by `ivf_topk` and
    `semantic_dedup` (operators/semdedup.py): bounded hash-sample of
    vectors in id order, first-k init, 10 numpy-float64 Lloyd iterations,
    zero RNG.  Returns the (n_centroids, dim) float64 centroid matrix —
    tiny by construction, meant to be broadcast by the caller.

    The xxhash64-pmod sample plus the 512 MiB guard make this the only
    corpus-sized driver allocation in either operator: faiss-style, the
    quantizer trains on a sample, never the corpus.  Sample collection
    and the Lloyd kernel live in _train_sample/_coarse_lloyd (shared
    with the PQ family)."""
    train = _train_sample(emb, train_cap, id_col, vec_col)
    if len(train) < n_centroids:
        raise ValueError(
            f"{len(train)} training vectors < {n_centroids} centroids"
        )
    return _coarse_lloyd(train, n_centroids)


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_cap: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the coarse-quantizer scale path.

    1. TRAIN: a deterministic hash-sample of vectors (bounded at
       `train_cap` rows — same shape as faiss, which trains its quantizer
       on a sample) is collected and k-means'd on the driver: numpy Lloyd
       iterations, init = first-k of the sample in id order, zero RNG.
       The centroid matrix is tiny (n_centroids x dim) and broadcast.
    2. ASSIGN: every vector gets cell = argmin ||v - c||, vectorized numpy
       inside mapInPandas — one narrow pass, no shuffle.
    3. SEARCH: each query probes its `n_probe` nearest cells; candidates
       are fetched by an equi-join on cell id (the piece that replaces the
       full scan) and re-ranked exactly; per-query top-k window.

    Recall is governed by n_probe/n_centroids (gated >= 0.8 in
    tests/test_operators.py on the synthetic table).  Unlike SRP-LSH the
    cells adapt to the data distribution, so clustered corpora get high
    recall at a small probe fraction."""
    import numpy as np

    spark = emb.sparkSession
    # -- 1. deterministic bounded sample -> driver-side Lloyd iterations
    cent = train_centroids(
        emb, n_centroids, train_cap, id_col=id_col, vec_col=vec_col
    )
    bc = spark.sparkContext.broadcast(cent)

    # -- 2. cell assignment, one narrow vectorized pass
    def assign_cells(batches):
        import pandas as pd

        C = bc.value
        c2 = (C * C).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"nbr_id": [], "v": [], "cell": []})
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            # argmin ||v-c||^2 = argmin (|c|^2 - 2 v.c); fixed-order
            # einsum SOP loop, not BLAS GEMM — per-row results must not
            # depend on how many rows share the Arrow batch (dgemm
            # kernel choice varies with M and can flip a near-tied
            # argmin between layouts / vs the full-matrix golden)
            cells = (
                c2[None, :] - 2.0 * np.einsum("ij,kj->ik", mat, C)
            ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "nbr_id": pdf[id_col],
                    "v": pdf[vec_col],
                    "cell": cells.astype("int32"),
                }
            )

    vec_type = emb.schema[vec_col].dataType.simpleString()
    id_type = emb.schema[id_col].dataType.simpleString()
    cells = emb.select(id_col, vec_col).mapInPandas(
        assign_cells, f"nbr_id {id_type}, v {vec_type}, cell int"
    )

    # -- 3. probe lists per query (driver computes n_probe cells per query
    # from the SAME broadcast centroids — no extra Spark job)
    queries = (
        cells.filter(F.col("nbr_id").isin(query_ids))
        .select(F.col("nbr_id").alias("query_id"), F.col("v").alias("q"))
    )
    # q's probe cells are computed JVM-free inside the join below by
    # exploding the top-n_probe cells, evaluated in a tiny pandas UDF pass
    def probe_cells(batches):
        import pandas as pd

        C = bc.value
        c2 = (C * C).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"query_id": [], "q": [], "cell": []})
                continue
            mat = np.array(list(pdf["q"]), dtype=np.float64)
            # same batch-shape-independent kernel as assign_cells
            # stable argsort: near-tied probe distances (possible when
            # a Lloyd cluster empties and keeps a stale centroid) must
            # order identically on every platform — same contract
            # ivfpq_topk defends
            order = (
                c2[None, :] - 2.0 * np.einsum("ij,kj->ik", mat, C)
            ).argsort(axis=1, kind="stable")[:, :n_probe]
            out = {"query_id": [], "q": [], "cell": []}
            for i in range(len(pdf)):
                for c in order[i]:
                    out["query_id"].append(pdf["query_id"].iloc[i])
                    out["q"].append(pdf["q"].iloc[i])
                    out["cell"].append(int(c))
            yield pd.DataFrame(out)

    probes = queries.mapInPandas(
        probe_cells, f"query_id {id_type}, q {vec_type}, cell int"
    )
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            cosine_similarity_col(
                F.transform(F.col("q"), lambda x: x.cast("double")),
                F.transform(F.col("v"), lambda x: x.cast("double")),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("long").alias("rank"))
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates share an SRP bucket with the query, exact
    cosine re-rank within.  Equi-join on bucket replaces the cross join —
    the piece that makes 10^12-vector corpora feasible.  Recall < 1.0 by
    construction (that's the trade; quantified in tests/test_operators.py).

    Recall amplification (single-table SRP recall collapses on weakly
    clustered embeddings — measured 0.07 on the near-isotropic synthetic
    table): `n_tables` independent plane families OR-ed together, plus
    `multiprobe` (Hamming-ball probing: the query also looks in every
    bucket differing by <= multiprobe bits).  Defaults (6 planes x 8
    tables x 1-bit probes) hold recall@5 >= 0.8 even on near-random
    vectors; on genuinely clustered corpora the same settings probe a far
    smaller candidate fraction.  Candidate volume scales as
    n_tables * (1 + n_planes * multiprobe) buckets per query — tune DOWN
    (fewer tables / no probes) when embeddings are well-clustered.

    Pass `dim` (the embedding dimensionality) to keep plan construction
    action-free; when omitted, a LIMIT-1 probe reads it from the data."""
    n_tables = 8
    multiprobe = 1
    if dim is None:
        first = emb.select(vec_col).first()
        dim = len(first[0]) if first else 0
    vecs = emb.select(
        F.col(id_col).alias("nbr_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.posexplode(
            F.array(
                *[
                    srp_bucket(F.col(vec_col), _hyperplanes(dim, n_planes, t))
                    for t in range(n_tables)
                ]
            )
        ).alias("tbl", "bucket"),
    )
    base_q = vecs.filter(F.col("nbr_id").isin(query_ids))
    # multiprobe: each query row also probes the buckets within `multiprobe`
    # Hamming bits of its own (query-side only — the broadcast side grows,
    # the corpus side never does)
    probe_offsets = [0]
    if multiprobe >= 1:
        probe_offsets += [1 << b for b in range(n_planes)]
    queries = base_q.select(
        F.col("nbr_id").alias("query_id"),
        F.col("v").alias("q"),
        "tbl",
        F.explode(
            F.array_distinct(
                F.array(*[
                    F.col("bucket").bitwiseXOR(F.lit(off)) for off in probe_offsets
                ])
            )
        ).alias("qbucket"),
    )
    candidates = (
        vecs.join(
            F.broadcast(queries),
            (vecs["tbl"] == queries["tbl"]) & (F.col("bucket") == F.col("qbucket")),
        )
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", "q", "v")
        .dropDuplicates(["query_id", "nbr_id"])
    )
    scored = candidates.select(
        "query_id",
        "nbr_id",
        cosine_similarity_col(F.col("q"), F.col("v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("long").alias("rank"))
    )


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    train_cap: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product-quantization codebook training (Jégou et al. 2011): the
    vector is split into `m` contiguous subspaces and each gets its own
    ksub-centroid quantizer — so an m x ksub table indexes ksub^m cells
    with m*ksub*dsub floats of codebook.  Same sample discipline as
    train_centroids (shared _train_sample: deterministic bounded
    id-ordered hash sample, 512 MiB guard, zero RNG).  Returns float64
    codebooks of shape (m, ksub, dsub)."""
    train = _train_sample(emb, train_cap, id_col, vec_col)
    if len(train) < ksub:
        raise ValueError(f"{len(train)} training vectors < ksub={ksub}")
    return _pq_lloyd(train, m, ksub)


def _pq_lloyd(train, m: int, ksub: int):
    """Per-subspace first-k-init 10-iteration float64 Lloyd over an
    (n, dim) matrix -> (m, ksub, dsub) codebooks.  Shared by the flat-PQ
    and IVF-PQ (residual) trainers."""
    import numpy as np

    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = train[:, j * dsub : (j + 1) * dsub]
        cent = sub[:ksub].copy()
        for _ in range(10):
            c2 = (cent * cent).sum(axis=1)
            assign = (c2[None, :] - 2.0 * (sub @ cent.T)).argmin(axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 32,
    train_cap: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC ANN top-k — the memory-scale path: vectors live as m
    uint8 codes (8 bytes here vs 256 for the raw float32s), and a query
    scans CODES, not vectors.

    1. TRAIN driver-side (train_pq_codebooks, bounded + deterministic).
    2. ENCODE: one narrow mapInPandas pass assigns each subvector its
       nearest sub-centroid (fixed-order einsum — batch-shape
       independent, same rationale as ivf_topk's assign_cells).
    3. ADC SCAN: each query precomputes an (m, ksub) distance table;
       every partition of the codes frame emits only its per-partition
       top-`shortlist` candidates per query (bounded emit: the map-side
       top-k that makes the scan 100-TB-shaped — never O(N x Q) rows),
       then one global rank cuts to `shortlist`.  Top-S of the union of
       per-partition top-S equals the global top-S, ties broken by id.
    4. EXACT RE-RANK of the shortlist by true cosine (the same JVM fold
       expression the other ANN paths use), top-k per query.

    Output (query_id, nbr_id, rank) — same shape as ivf/lsh/brute.
    Recall gated in pytest; oracled against an independent numpy
    reimplementation (tools/gen_golden_pq.py)."""
    import numpy as np

    spark = emb.sparkSession
    books = train_pq_codebooks(
        emb, m=m, ksub=ksub, train_cap=train_cap,
        id_col=id_col, vec_col=vec_col,
    )
    bc = spark.sparkContext.broadcast(books)
    dsub = books.shape[2]

    def encode(batches):
        import pandas as pd

        B = bc.value
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"nbr_id": [], "codes": []})
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                C = B[j]
                c2 = (C * C).sum(axis=1)
                codes[:, j] = (
                    c2[None, :] - 2.0 * np.einsum("ij,kj->ik", sub, C)
                ).argmin(axis=1)
            yield pd.DataFrame(
                {"nbr_id": pdf[id_col], "codes": list(codes)}
            )

    id_type = emb.schema[id_col].dataType.simpleString()
    codes = emb.select(id_col, vec_col).mapInPandas(
        encode, f"nbr_id {id_type}, codes array<long>"
    )

    qrows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )  # bounded: |query_ids| rows
    qvecs = {r[0]: np.array(r[1], dtype=np.float64) for r in qrows}
    tables = {}
    for qid, qv in qvecs.items():
        T = np.empty((m, ksub), dtype=np.float64)
        for j in range(m):
            diff = bc.value[j] - qv[j * dsub : (j + 1) * dsub][None, :]
            T[j] = (diff * diff).sum(axis=1)
        tables[qid] = T
    bt = spark.sparkContext.broadcast(tables)

    def adc_scan(batches):
        import heapq

        import pandas as pd

        T = bt.value
        out = {"query_id": [], "nbr_id": [], "adc": []}
        per_q: dict = {qid: [] for qid in T}
        for pdf in batches:
            if not len(pdf):
                continue
            nbrs = pdf["nbr_id"].to_numpy()
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)
            for qid, tab in T.items():
                # accumulate subspace j in ascending order — the SAME
                # float addition order as a per-row sequential loop
                # (and the golden), vectorized across rows
                d = tab[0][cmat[:, 0]].copy()
                for j in range(1, m):
                    d += tab[j][cmat[:, j]]
                cand = per_q[qid]
                for i in range(len(nbrs)):
                    if nbrs[i] != qid:
                        cand.append((float(d[i]), nbrs[i]))
                # re-truncate per batch: the buffer stays O(shortlist +
                # batch), never O(partition_rows x queries) — the memory
                # bound the docstring promises.  nsmallest == sorted[:S]
                # on (dist, id) tuples, so results are unchanged.
                if len(cand) > 4 * shortlist:
                    per_q[qid] = heapq.nsmallest(shortlist, cand)
        for qid, cand in per_q.items():
            for d, nbr in sorted(cand)[:shortlist]:
                out["query_id"].append(qid)
                out["nbr_id"].append(nbr)
                out["adc"].append(d)
        yield pd.DataFrame(out)

    short = codes.mapInPandas(
        adc_scan, f"query_id {id_type}, nbr_id {id_type}, adc double"
    )
    w_s = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("nbr_id")
    )
    short = (
        short.withColumn("srank", F.row_number().over(w_s))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "nbr_id")
    )
    qdf = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q")
    )
    scored = (
        short.join(emb.select(F.col(id_col).alias("nbr_id"),
                              F.col(vec_col).alias("v")), "nbr_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "nbr_id",
            cosine_similarity_col(
                F.transform(F.col("q"), lambda x: x.cast("double")),
                F.transform(F.col("v"), lambda x: x.cast("double")),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("long").alias("rank"))
    )


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 64,
    train_cap: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with residual encoding — the production ANN layout
    (faiss IndexIVFPQ): a coarse quantizer routes each vector to a
    cell, PQ codes store the RESIDUAL v - centroid[cell] (residuals
    are tighter-clustered than raw vectors, so the same code budget
    quantizes finer), and a query scans only its n_probe nearest
    cells' codes with a per-cell ADC table built from the query's own
    residual.

    Distributed shape: coarse + PQ training are one bounded driver
    sample (the shared deterministic Lloyd kernels); encoding is one
    narrow mapInPandas pass emitting (cell, codes); the scan filters
    to probed cells BEFORE computing distances and emits only
    per-partition top-`shortlist` per query; exact cosine re-rank
    finishes.  Output (query_id, nbr_id, rank) like its siblings.
    Oracled against an independent numpy reimplementation
    (tools/gen_golden_ivfpq.py); recall gated in pytest."""
    import numpy as np

    spark = emb.sparkSession
    # ONE sample collect feeds BOTH quantizers (the coarse Lloyd and
    # the residual PQ codebooks) — byte-identical to training each on
    # its own collect of the same deterministic sample, at half the
    # corpus scans
    train = _train_sample(emb, train_cap, id_col, vec_col)
    if len(train) < max(n_centroids, ksub):
        raise ValueError(
            f"{len(train)} training vectors < max(n_centroids, ksub)"
        )
    cent = _coarse_lloyd(train, n_centroids)
    c2t = (cent * cent).sum(axis=1)
    tcells = (
        c2t[None, :] - 2.0 * np.einsum("ij,kj->ik", train, cent)
    ).argmin(axis=1)
    books = _pq_lloyd(train - cent[tcells], m, ksub)
    bc = spark.sparkContext.broadcast((cent, books))
    dsub = books.shape[2]

    def encode(batches):
        import pandas as pd

        C, B = bc.value
        c2 = (C * C).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"nbr_id": [], "cell": [], "codes": []})
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            cells = (
                c2[None, :] - 2.0 * np.einsum("ij,kj->ik", mat, C)
            ).argmin(axis=1)
            res = mat - C[cells]
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                sub = res[:, j * dsub : (j + 1) * dsub]
                Bj = B[j]
                b2 = (Bj * Bj).sum(axis=1)
                codes[:, j] = (
                    b2[None, :] - 2.0 * np.einsum("ij,kj->ik", sub, Bj)
                ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "nbr_id": pdf[id_col],
                    "cell": cells.astype("int32"),
                    "codes": list(codes),
                }
            )

    id_type = emb.schema[id_col].dataType.simpleString()
    coded = emb.select(id_col, vec_col).mapInPandas(
        encode, f"nbr_id {id_type}, cell int, codes array<long>"
    )

    qrows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    cent2 = (cent * cent).sum(axis=1)
    qmeta = {}
    for r in qrows:
        qv = np.array(r[1], dtype=np.float64)
        order = (
            cent2 - 2.0 * np.einsum("j,kj->k", qv, cent)
        ).argsort(kind="stable")[:n_probe]
        tabs = {}
        for c in order:
            qres = qv - cent[c]
            T = np.empty((m, ksub), dtype=np.float64)
            for j in range(m):
                diff = books[j] - qres[j * dsub : (j + 1) * dsub][None, :]
                T[j] = (diff * diff).sum(axis=1)
            tabs[int(c)] = T
        qmeta[r[0]] = tabs
    bq = spark.sparkContext.broadcast(qmeta)

    def adc_scan(batches):
        import heapq

        import pandas as pd

        Q = bq.value
        per_q: dict = {qid: [] for qid in Q}
        for pdf in batches:
            if not len(pdf):
                continue
            nbrs = pdf["nbr_id"].to_numpy()
            cells = pdf["cell"].to_numpy()
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)
            for qid, tabs in Q.items():
                for cell, tab in tabs.items():
                    mask = cells == cell
                    if not mask.any():
                        continue
                    sub = cmat[mask]
                    # ascending-j accumulation: same float order as the
                    # per-row sequential loop and the golden
                    d = tab[0][sub[:, 0]].copy()
                    for j in range(1, m):
                        d += tab[j][sub[:, j]]
                    mn = nbrs[mask]
                    cand = per_q[qid]
                    for i in range(len(mn)):
                        if mn[i] != qid:
                            cand.append((float(d[i]), mn[i]))
                    # same per-batch re-truncation bound as pq_topk
                    if len(cand) > 4 * shortlist:
                        per_q[qid] = heapq.nsmallest(shortlist, cand)
        out = {"query_id": [], "nbr_id": [], "adc": []}
        for qid, cand in per_q.items():
            for d, nbr in sorted(cand)[:shortlist]:
                out["query_id"].append(qid)
                out["nbr_id"].append(nbr)
                out["adc"].append(d)
        yield pd.DataFrame(out)

    short = coded.mapInPandas(
        adc_scan, f"query_id {id_type}, nbr_id {id_type}, adc double"
    )
    w_s = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("nbr_id"))
    short = (
        short.withColumn("srank", F.row_number().over(w_s))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "nbr_id")
    )
    qdf = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q")
    )
    scored = (
        short.join(
            emb.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("v")),
            "nbr_id",
        )
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "nbr_id",
            cosine_similarity_col(
                F.transform(F.col("q"), lambda x: x.cast("double")),
                F.transform(F.col("v"), lambda x: x.cast("double")),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.col("rank").cast("long").alias("rank"))
    )
