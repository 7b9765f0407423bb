"""Generate dist/golden_bpe.parquet — the DuckDB oracle for the
`bpe_merges` and `doc_bpe_tokens` queries.

This is an INDEPENDENT pure-Python reimplementation of the BPE spec
(functions/bpe.py), not an engine snapshot: no Spark, no imports from
the module under test.  It replicates the documented algorithm — lower
+ ASCII-whitespace word histogram, code-point initial symbols,
overlapping adjacent-pair counts weighted by word frequency, argmax
with (count DESC, left ASC, right ASC) tie-break, min pair count 2,
left-greedy merge application — so a defect in the distributed plan
(wrong fold, lost pair, wrong tie-break, broken early-stop) shows up
as a golden mismatch.

Each golden row is tagged with a corpus fingerprint (md5 over the
ordered documents table, computed in DuckDB with the same expression
the oracle SQL embeds), so one golden file serves every test scale and
an unknown corpus fails loudly with 0 rows.

Usage: python tools/gen_golden_bpe.py  (re-run when testdata or the
BPE spec changes; tests/test_bpe.py guards engine parity).
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

DIST = Path(__file__).resolve().parent.parent / "dist"
OUT_MERGES = DIST / "golden_bpe_merges.parquet"
OUT_TOKENS = DIST / "golden_bpe_tokens.parquet"

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(doc_id || '|' || text, '' ORDER BY doc_id)) "
    "FROM {src}"
)

NUM_MERGES = 12  # pinned by queries.py:bpe_merges

# Java \s and RE2 \s are the ASCII class; spell it out so Python's
# unicode-aware \s can never diverge on exotic whitespace.  Likewise the
# engine's F.trim strips ONLY the space character, so mirror with
# strip(' ') rather than Python's unicode-whitespace strip().
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def words_of(text: str) -> list[str]:
    return [w for w in _WS.split(text.strip(" ").lower()) if w]


def train(word_counts: Counter, num_merges: int):
    """(merges, final_segmentation) — merges as (rank, left, right, count)."""
    segs = {w: [c for c in w] for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in segs.items():
            wc = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc
        best = None
        for (a, b), c in pairs.items():
            if c < 2:
                continue
            key = (-c, a, b)
            if best is None or key < best[0]:
                best = (key, a, b, c)
        if best is None:
            break
        _, left, right, cnt = best
        merges.append((rank, left, right, cnt))
        for w, syms in segs.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            segs[w] = out
    return merges, segs


def main() -> None:
    m_rows = {k: [] for k in ("corpus_fp", "rank", "left", "right", "pair_count")}
    t_rows = {k: [] for k in ("corpus_fp", "doc_id", "n_words", "n_bpe_tokens")}
    for sf_dir in SF_DIRS:
        src = f"'{sf_dir}/documents.parquet'"
        con = duckdb.connect()
        fp = con.execute(FINGERPRINT_SQL.format(src=src)).fetchone()[0]
        docs = con.execute(f"SELECT doc_id, text FROM {src} ORDER BY doc_id").fetchall()
        wc: Counter = Counter()
        doc_words = {}
        for doc_id, text in docs:
            ws = words_of(text)
            doc_words[doc_id] = ws
            wc.update(ws)
        merges, segs = train(wc, NUM_MERGES)
        for rank, left, right, cnt in merges:
            m_rows["corpus_fp"].append(fp)
            m_rows["rank"].append(rank)
            m_rows["left"].append(left)
            m_rows["right"].append(right)
            m_rows["pair_count"].append(cnt)
        for doc_id, ws in doc_words.items():
            t_rows["corpus_fp"].append(fp)
            t_rows["doc_id"].append(doc_id)
            t_rows["n_words"].append(len(ws))
            t_rows["n_bpe_tokens"].append(sum(len(segs[w]) for w in ws))
        print(f"{sf_dir}: fp={fp} merges={len(merges)} docs={len(docs)}")
    DIST.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            m_rows,
            schema=pa.schema(
                [
                    ("corpus_fp", pa.string()),
                    ("rank", pa.int64()),
                    ("left", pa.string()),
                    ("right", pa.string()),
                    ("pair_count", pa.int64()),
                ]
            ),
        ),
        OUT_MERGES,
    )
    pq.write_table(
        pa.table(
            t_rows,
            schema=pa.schema(
                [
                    ("corpus_fp", pa.string()),
                    ("doc_id", pa.int64()),
                    ("n_words", pa.int64()),
                    ("n_bpe_tokens", pa.int64()),
                ]
            ),
        ),
        OUT_TOKENS,
    )
    print(f"wrote {OUT_MERGES} and {OUT_TOKENS}")


if __name__ == "__main__":
    main()
