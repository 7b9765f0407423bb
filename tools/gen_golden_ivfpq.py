"""Generate dist/golden_ann_ivfpq.parquet — the DuckDB oracle for the
`ann_ivfpq_topk` query.

An INDEPENDENT single-node reimplementation of the IVF-PQ residual
spec (operators/similarity.py:ivfpq_topk), not an engine snapshot.  It
replicates: the deterministic id-ordered sample (full table at test
SFs — asserted); coarse first-k-init 10-iteration Lloyd; per-subspace
Lloyd on the coarse RESIDUALS; fixed-order einsum cell + code
assignment; stable-argsort probe order; per-cell ADC tables built from
the query residual with sequential accumulation; the (adc, nbr)-ordered
shortlist; the exact fold-dot cosine re-rank.

Usage: python tools/gen_golden_ivfpq.py
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = (
    Path(__file__).resolve().parent.parent / "dist" / "golden_ann_ivfpq.parquet"
)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(vec_id::VARCHAR || embedding::VARCHAR, '|' "
    "ORDER BY vec_id)) FROM {src}"
)

# parameters pinned by queries.py:ann_ivfpq_topk
QUERY_IDS = list(range(10))
K = 5
N_CENTROIDS = 16
N_PROBE = 4
M = 8
KSUB = 16
SHORTLIST = 64
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


def lloyd(train, k):
    cent = train[:k].copy()
    for _ in range(10):
        c2 = (cent * cent).sum(axis=1)
        assign = (c2[None, :] - 2.0 * (train @ cent.T)).argmin(axis=1)
        for c in range(k):
            members = train[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivfpq_rows(sf_dir: str):
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in tbl]
    vecs = {r[0]: [float(x) for x in r[1]] for r in tbl}
    assert len(ids) <= TRAIN_CAP, f"{sf_dir}: extend this generator"

    train = np.array([vecs[i] for i in ids], dtype=np.float64)
    cent = lloyd(train, N_CENTROIDS)
    c2 = (cent * cent).sum(axis=1)
    tcells = (
        c2[None, :] - 2.0 * np.einsum("ij,kj->ik", train, cent)
    ).argmin(axis=1)
    res = train - cent[tcells]
    dim = train.shape[1]
    dsub = dim // M
    books = np.empty((M, KSUB, dsub), dtype=np.float64)
    for j in range(M):
        books[j] = lloyd(res[:, j * dsub : (j + 1) * dsub], KSUB)

    # ENCODE every vector (cells above are already the encode pass —
    # same expression, full matrix, einsum-fixed order)
    codes = np.empty((len(ids), M), dtype=np.int64)
    for j in range(M):
        sub = res[:, j * dsub : (j + 1) * dsub]
        Bj = books[j]
        b2 = (Bj * Bj).sum(axis=1)
        codes[:, j] = (
            b2[None, :] - 2.0 * np.einsum("ij,kj->ik", sub, Bj)
        ).argmin(axis=1)
    cell_of = {i: int(tcells[n]) for n, i in enumerate(ids)}
    code_of = {i: codes[n] for n, i in enumerate(ids)}

    rows = []
    for q in QUERY_IDS:
        qv = np.array(vecs[q], dtype=np.float64)
        order = (
            c2 - 2.0 * np.einsum("j,kj->k", qv, cent)
        ).argsort(kind="stable")[:N_PROBE]
        tabs = {}
        for c in order:
            qres = qv - cent[c]
            T = np.empty((M, KSUB), dtype=np.float64)
            for j in range(M):
                diff = books[j] - qres[j * dsub : (j + 1) * dsub][None, :]
                T[j] = (diff * diff).sum(axis=1)
            tabs[int(c)] = T
        cand = []
        for nbr in ids:
            if nbr == q or cell_of[nbr] not in tabs:
                continue
            tab = tabs[cell_of[nbr]]
            cs = code_of[nbr]
            d = 0.0
            for j in range(M):
                d += tab[j][cs[j]]
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
        rows = ivfpq_rows(sf_dir)
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
