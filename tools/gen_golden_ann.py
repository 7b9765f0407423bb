"""Generate dist/golden_ann_ivf.parquet — the DuckDB oracle for the
`ann_ivf_topk` query.

This is an INDEPENDENT single-node reimplementation of the IVF spec
(operators/similarity.py:ivf_topk), not an engine snapshot: no Spark, no
imports from the operator module.  It replicates the documented algorithm —
deterministic bounded sample in vec_id order, first-k init, 10 Lloyd
iterations in float64, |c|^2 - 2 v.c cell assignment, n_probe nearest
cells per query, exact cosine re-rank with (desc cos, asc nbr_id)
tie-break — so a defect in the distributed plan (wrong join, lost
candidates, wrong tie-break) shows up as a golden mismatch.

The engine's driver-side k-means also runs in numpy float64, so Lloyd
iterations here are bit-identical by construction; the re-rank cosine is
computed as the engine's sequential HOF left fold (plain Python loop over
double-widened float32 components) rather than np.dot, so even last-ulp
summation-order effects cannot diverge.

Because the top-k depends on the data, each golden row is tagged with a
corpus fingerprint (md5 over the ordered embeddings table, computed in
DuckDB) and the oracle SQL selects the slice whose fingerprint matches the
`embeddings` view it is run against — the same golden file serves every
test scale, and an unknown corpus fails loudly with 0 rows.

Usage: python tools/gen_golden_ann.py  (re-run when testdata or the IVF
spec changes; tests/test_operators.py guards engine parity).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_ann_ivf.parquet"

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(vec_id::VARCHAR || embedding::VARCHAR, '|' "
    "ORDER BY vec_id)) FROM {src}"
)

# query parameters pinned by queries.py:ann_ivf_topk
QUERY_IDS = list(range(10))
K = 5
N_CENTROIDS = 16
N_PROBE = 4
TRAIN_CAP = 20_000


def fold_dot(a: list[float], b: list[float]) -> float:
    """Sequential left fold acc + x*y — exactly Spark's F.aggregate order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def fold_norm(a: list[float]) -> float:
    acc = 0.0
    for v in a:
        acc = acc + v * v
    return acc ** 0.5


def ivf_rows(sf_dir: str):
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in tbl]
    vecs = {r[0]: [float(x) for x in r[1]] for r in tbl}

    # TRAIN — the pmod(xxhash64,100) < frac_pct sample passes every row when
    # total <= train_cap (frac_pct = 100), which holds at every test SF;
    # guard that assumption so a larger future SF fails loudly here instead
    # of silently diverging from the engine's hash sample.
    assert len(ids) <= TRAIN_CAP, (
        f"{sf_dir}: {len(ids)} rows > train_cap — the engine's xxhash64 "
        "sample is no longer the full table; extend this generator"
    )
    train = np.array([vecs[i] for i in ids], dtype=np.float64)
    cent = train[:N_CENTROIDS].copy()
    for _ in range(10):
        c2 = (cent * cent).sum(axis=1)
        assign = (c2[None, :] - 2.0 * (train @ cent.T)).argmin(axis=1)
        for c in range(N_CENTROIDS):
            members = train[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)

    # ASSIGN + PROBE — same numpy expressions as the engine's pandas
    # passes; fixed-order einsum (batch-shape-independent, never BLAS
    # GEMM) so the full-corpus matrices here match per-batch results
    c2 = (cent * cent).sum(axis=1)
    mat = np.array([vecs[i] for i in ids], dtype=np.float64)
    cells = (c2[None, :] - 2.0 * np.einsum("ij,kj->ik", mat, cent)).argmin(axis=1)
    cell_of = dict(zip(ids, cells.tolist()))
    qmat = np.array([vecs[q] for q in QUERY_IDS], dtype=np.float64)
    probe = (
        c2[None, :] - 2.0 * np.einsum("ij,kj->ik", qmat, cent)
    ).argsort(axis=1, kind="stable")[:, :N_PROBE]

    rows = []
    for qi, q in enumerate(QUERY_IDS):
        probed = set(int(c) for c in probe[qi])
        cands = [i for i in ids if i != q and cell_of[i] in probed]
        scored = []
        for nbr in cands:
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
        for q, nbr, rank in ivf_rows(sf_dir):
            fps.append(fp)
            qids.append(q)
            nbrs.append(nbr)
            ranks.append(rank)
        print(f"{sf_dir}: fp={fp[:12]}… rows={len(qids)}")
    table = pa.table(
        {
            "corpus_fp": pa.array(fps, pa.string()),
            "query_id": pa.array(qids, pa.int64()),
            "nbr_id": pa.array(nbrs, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
