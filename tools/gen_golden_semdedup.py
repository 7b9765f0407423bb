"""Generate dist/golden_semdedup.parquet — the DuckDB oracle for the
`semantic_dedup` query.

An INDEPENDENT single-node reimplementation of the SemDeDup spec
(operators/semdedup.py module docstring) — no Spark, no imports from the
operator module.  It replicates the pinned contract: deterministic
bounded sample in vec_id order, first-k init, 10 float64 Lloyd
iterations, |c|^2 - 2 v.c cell assignment, cosine-to-centroid on
L2-normalized rows, per-cell (cent_sim ASC, vec_id ASC) ordering, and
the blockwise (B=2048) prefix-max GEMM deciding keep = max_prefix <
1 - eps.  Same numpy expressions on the same-ordered matrices => results
are bit-identical with the engine's pandas passes; outputs are
floor-quantized to x1e6 longs before they reach the value hash.

Each golden row is tagged with a corpus fingerprint (md5 over the
ordered embeddings table, computed in DuckDB) and the oracle SQL selects
the matching slice — one golden file serves every test scale, and an
unknown corpus fails loudly with 0 rows.

Usage: python tools/gen_golden_semdedup.py  (re-run when testdata or the
spec changes).
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_semdedup.parquet"

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(vec_id::VARCHAR || embedding::VARCHAR, '|' "
    "ORDER BY vec_id)) FROM {src}"
)

# parameters pinned by queries.py:semantic_dedup
EPS = 0.7
N_CENTROIDS = 16
TRAIN_CAP = 20_000
PREFIX_BLOCK = 2048


def semdedup_rows(sf_dir: str):
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in tbl], dtype=np.int64)
    mat = np.array([[float(x) for x in r[1]] for r in tbl], dtype=np.float64)

    # TRAIN — the pmod(xxhash64,100) sample passes every row when
    # total <= train_cap (frac_pct = 100), which holds at every test SF
    assert len(ids) <= TRAIN_CAP, (
        f"{sf_dir}: {len(ids)} rows > train_cap — extend this generator to "
        "replicate the engine's xxhash64 sample"
    )
    cent = mat[:N_CENTROIDS].copy()
    for _ in range(10):
        c2 = (cent * cent).sum(axis=1)
        assign = (c2[None, :] - 2.0 * (mat @ cent.T)).argmin(axis=1)
        for c in range(N_CENTROIDS):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)

    # ASSIGN — same numpy expressions as the engine's pandas pass; the
    # fixed-order einsum SOP loop is batch-shape-independent, so the
    # full-corpus matrix here matches the engine's per-batch results
    c2 = (cent * cent).sum(axis=1)
    cells = (c2[None, :] - 2.0 * np.einsum("ij,kj->ik", mat, cent)).argmin(axis=1)
    cn = cent / np.sqrt((cent * cent).sum(axis=1, keepdims=True))
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    matn = mat / np.where(norms == 0.0, 1.0, norms)
    cent_sim = (matn * cn[cells]).sum(axis=1)

    # PRUNE — per cell, (cent_sim ASC, vec_id ASC) order, blockwise
    # prefix-max GEMM, keep iff max_prefix < 1 - eps
    thr = 1.0 - EPS
    rows = []
    for cell in sorted(set(cells.tolist())):
        member_idx = np.where(cells == cell)[0]
        order = np.lexsort((ids[member_idx], cent_sim[member_idx]))
        member_idx = member_idx[order]
        V = matn[member_idx]
        n = len(member_idx)
        maxp = np.full(n, -2.0)
        for s in range(0, n, PREFIX_BLOCK):
            e = min(s + PREFIX_BLOCK, n)
            S = V[s:e] @ V[:e].T
            for li in range(e - s):
                i = s + li
                if i:
                    maxp[i] = S[li, :i].max()
        for j, gi in enumerate(member_idx):
            rows.append(
                (
                    int(ids[gi]),
                    int(cell),
                    int(np.floor(cent_sim[gi] * 1e6)),
                    int(np.floor(maxp[j] * 1e6)),
                    bool(maxp[j] < thr),
                )
            )
    return rows


def main():
    cols = {k: [] for k in
            ("corpus_fp", "vec_id", "cell", "cent_sim_x1m",
             "max_prefix_x1m", "keep")}
    for sf_dir in SF_DIRS:
        fp = duckdb.sql(
            FINGERPRINT_SQL.format(src=f"'{sf_dir}/embeddings.parquet'")
        ).fetchone()[0]
        rows = semdedup_rows(sf_dir)
        kept = sum(1 for r in rows if r[4])
        for vec_id, cell, cs, mp, keep in rows:
            cols["corpus_fp"].append(fp)
            cols["vec_id"].append(vec_id)
            cols["cell"].append(cell)
            cols["cent_sim_x1m"].append(cs)
            cols["max_prefix_x1m"].append(mp)
            cols["keep"].append(keep)
        print(f"{sf_dir}: fp={fp[:12]}… rows={len(rows)} kept={kept}")
    table = pa.table(
        {
            "corpus_fp": pa.array(cols["corpus_fp"], pa.string()),
            "vec_id": pa.array(cols["vec_id"], pa.int64()),
            "cell": pa.array(cols["cell"], pa.int32()),
            "cent_sim_x1m": pa.array(cols["cent_sim_x1m"], pa.int64()),
            "max_prefix_x1m": pa.array(cols["max_prefix_x1m"], pa.int64()),
            "keep": pa.array(cols["keep"], pa.bool_()),
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
