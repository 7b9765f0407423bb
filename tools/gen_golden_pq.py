"""Generate dist/golden_ann_pq.parquet — the DuckDB oracle for the
`ann_pq_topk` query.

An INDEPENDENT single-node reimplementation of the PQ-ADC spec
(operators/similarity.py:pq_topk), not an engine snapshot: no Spark, no
imports from the module under test.  It replicates: the deterministic
id-ordered training sample (full table at test SFs — asserted), per-
subspace first-k-init 10-iteration float64 Lloyd, fixed-order einsum
code assignment, sequential-accumulation ADC distances, the
(adc, nbr_id)-ordered global shortlist, and the exact fold-dot cosine
re-rank with (cos DESC, nbr ASC) ranking.  A defect in the distributed
plan (wrong subspace split, lost tie-break, shortlist truncation bug)
shows up as a golden mismatch.

Usage: python tools/gen_golden_pq.py
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_ann_pq.parquet"

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(vec_id::VARCHAR || embedding::VARCHAR, '|' "
    "ORDER BY vec_id)) FROM {src}"
)

# query parameters pinned by queries.py:ann_pq_topk
QUERY_IDS = list(range(10))
K = 5
M = 8
KSUB = 16
SHORTLIST = 96
TRAIN_CAP = 20_000


def fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def fold_norm(a) -> float:
    acc = 0.0
    for v in a:
        acc = acc + v * v
    return acc ** 0.5


def pq_rows(sf_dir: str):
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in tbl]
    vecs = {r[0]: [float(x) for x in r[1]] for r in tbl}
    assert len(ids) <= TRAIN_CAP, (
        f"{sf_dir}: {len(ids)} rows > train_cap — the engine's xxhash64 "
        "sample is no longer the full table; extend this generator"
    )
    train = np.array([vecs[i] for i in ids], dtype=np.float64)
    dim = train.shape[1]
    dsub = dim // M
    books = np.empty((M, KSUB, dsub), dtype=np.float64)
    for j in range(M):
        sub = train[:, j * dsub : (j + 1) * dsub]
        cent = sub[:KSUB].copy()
        for _ in range(10):
            c2 = (cent * cent).sum(axis=1)
            assign = (c2[None, :] - 2.0 * (sub @ cent.T)).argmin(axis=1)
            for c in range(KSUB):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent

    # ENCODE — fixed-order einsum, batch-shape independent
    mat = np.array([vecs[i] for i in ids], dtype=np.float64)
    codes = np.empty((len(ids), M), dtype=np.int64)
    for j in range(M):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        c2 = (C * C).sum(axis=1)
        codes[:, j] = (
            c2[None, :] - 2.0 * np.einsum("ij,kj->ik", sub, C)
        ).argmin(axis=1)
    code_of = {i: codes[n] for n, i in enumerate(ids)}

    rows = []
    for q in QUERY_IDS:
        qv = np.array(vecs[q], dtype=np.float64)
        T = np.empty((M, KSUB), dtype=np.float64)
        for j in range(M):
            diff = books[j] - qv[j * dsub : (j + 1) * dsub][None, :]
            T[j] = (diff * diff).sum(axis=1)
        cand = []
        for nbr in ids:
            if nbr == q:
                continue
            cs = code_of[nbr]
            d = 0.0
            for j in range(M):
                d += T[j][cs[j]]  # sequential accumulation, engine order
            cand.append((d, nbr))
        short = [nbr for _, nbr in sorted(cand)[:SHORTLIST]]
        scored = []
        for nbr in short:
            cos = fold_dot(vecs[q], vecs[nbr]) / (
                fold_norm(vecs[q]) * fold_norm(vecs[nbr])
            )
            scored.append((-cos, nbr))
        scored.sort()
        for rank, (_, nbr) in enumerate(scored[:K], start=1):
            rows.append((q, nbr, rank))
    return rows


def main():
    fps, qids, nbrs, ranks = [], [], [], []
    for sf_dir in SF_DIRS:
        fp = duckdb.sql(
            FINGERPRINT_SQL.format(src=f"'{sf_dir}/embeddings.parquet'")
        ).fetchone()[0]
        rows = pq_rows(sf_dir)
        for q, nbr, rank in rows:
            fps.append(fp)
            qids.append(q)
            nbrs.append(nbr)
            ranks.append(rank)
        print(f"{sf_dir}: fp={fp} rows={len(rows)}")
    pq.write_table(
        pa.table(
            {
                "corpus_fp": pa.array(fps, pa.string()),
                "query_id": pa.array(qids, pa.int64()),
                "nbr_id": pa.array(nbrs, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        ),
        OUT,
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
