"""Generate dist/golden_unigram_{vocab,tokens}.parquet — the DuckDB
oracles for the `unigram_vocab` and `doc_unigram_tokens` queries.

An INDEPENDENT pure-Python reimplementation of the unigram-LM trainer
spec (functions/unigram.py module docstring) — no Spark, no imports
from the module under test.  It replicates: lower + ASCII-whitespace
word histogram; overlapping substring seed (len 1..4, multi-char count
>= 2, top-192 by (count DESC, piece ASC), all singles); 2 rounds of
hard-EM with exact-integer Laplace Viterbi (candidates compared by
big-int cross-multiplication, ties -> fewer pieces -> lexicographic
piece list); prune to vocab_size=96 keeping all singles; final rank by
(count DESC, piece ASC).  A defect in the distributed plan (wrong
seed explode, lost smoothing, broken tie-break, truncated prune) shows
up as a golden mismatch.

Rows are tagged with the corpus fingerprint (md5 over the ordered
documents table, same expression the oracle SQL embeds) so one file
serves every scale and an unknown corpus fails loudly with 0 rows.

Usage: python tools/gen_golden_unigram.py
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

DIST = Path(__file__).resolve().parent.parent / "dist"
OUT_VOCAB = DIST / "golden_unigram_vocab.parquet"
OUT_TOKENS = DIST / "golden_unigram_tokens.parquet"

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FINGERPRINT_SQL = (
    "SELECT md5(string_agg(doc_id || '|' || text, '' ORDER BY doc_id)) "
    "FROM {src}"
)

VOCAB_SIZE = 96
ROUNDS = 2
MAX_PIECE_LEN = 4
SEED_MAX = 192

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def words_of(text: str) -> list[str]:
    return [w for w in _WS.split(text.strip(" ").lower()) if w]


def seed(word_counts: Counter) -> list[tuple[str, int]]:
    subs: Counter = Counter()
    for w, wc in word_counts.items():
        for i in range(len(w)):
            for L in range(1, MAX_PIECE_LEN + 1):
                if i + L <= len(w):
                    subs[w[i : i + L]] += wc
    singles = sorted(
        ((p, c) for p, c in subs.items() if len(p) == 1),
        key=lambda t: (-t[1], t[0]),
    )
    multis = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1 and c >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:SEED_MAX]
    return singles + multis


MAX_VITERBI_WORD = 256  # mirrors functions/unigram.py's hostile-word guard


def viterbi(word: str, counts: dict, denom: int) -> list[str]:
    if len(word) > MAX_VITERBI_WORD:
        out = []
        for i in range(0, len(word), MAX_VITERBI_WORD):
            out.extend(viterbi(word[i : i + MAX_VITERBI_WORD], counts, denom))
        return out
    n = len(word)
    pows = [1]  # memoized denom powers (identity-preserving speedup)

    def powd(k):
        while len(pows) <= k:
            pows.append(pows[-1] * denom)
        return pows[k]

    best = [None] * (n + 1)
    best[0] = (1, 0, ())
    for i in range(1, n + 1):
        cb = None
        for L in range(1, min(MAX_PIECE_LEN, i) + 1):
            prev = best[i - L]
            if prev is None:
                continue
            piece = word[i - L : i]
            if len(piece) > 1 and piece not in counts:
                continue
            prod, k, seq = (
                prev[0] * (counts.get(piece, 0) + 1),
                prev[1] + 1,
                prev[2] + (piece,),
            )
            if cb is None:
                cb = (prod, k, seq)
                continue
            bprod, bk, bseq = cb
            lhs, rhs = prod * powd(bk), bprod * powd(k)
            if lhs > rhs or (lhs == rhs and (k < bk or (k == bk and seq < bseq))):
                cb = (prod, k, seq)
        best[i] = cb
    return list(best[n][2])


def train(word_counts: Counter):
    pieces = seed(word_counts)
    for _ in range(ROUNDS):
        counts = dict(pieces)
        denom = sum(counts.values()) + len(counts)
        observed: Counter = Counter()
        for w, wc in word_counts.items():
            for p in viterbi(w, counts, denom):
                observed[p] += wc
        singles = [(p, observed.get(p, 0)) for p, _ in pieces if len(p) == 1]
        multis = sorted(
            (
                (p, observed[p])
                for p, _ in pieces
                if len(p) > 1 and observed.get(p, 0) > 0
            ),
            key=lambda t: (-t[1], t[0]),
        )[: max(0, VOCAB_SIZE - len(singles))]
        pieces = sorted(singles + multis, key=lambda t: (-t[1], t[0]))
    return pieces


def main() -> None:
    vocab_rows = {
        "corpus_fp": [],
        "rank": [],
        "piece": [],
        "piece_count": [],
    }
    token_rows = {
        "corpus_fp": [],
        "doc_id": [],
        "n_words": [],
        "n_unigram_tokens": [],
    }
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        src = f"read_parquet('{sf_dir}/documents.parquet')"
        fp = con.execute(FINGERPRINT_SQL.format(src=src)).fetchone()[0]
        docs = con.execute(
            f"SELECT doc_id, text FROM {src} ORDER BY doc_id"
        ).fetchall()

        word_counts: Counter = Counter()
        for _, text in docs:
            word_counts.update(words_of(text))
        pieces = train(word_counts)
        for rank, (p, c) in enumerate(pieces):
            vocab_rows["corpus_fp"].append(fp)
            vocab_rows["rank"].append(rank)
            vocab_rows["piece"].append(p)
            vocab_rows["piece_count"].append(c)

        counts = dict(pieces)
        denom = sum(counts.values()) + len(counts)
        seg_cache: dict[str, int] = {}
        for doc_id, text in docs:
            ws = words_of(text)
            n_tok = 0
            for w in ws:
                if w not in seg_cache:
                    seg_cache[w] = len(viterbi(w, counts, denom))
                n_tok += seg_cache[w]
            token_rows["corpus_fp"].append(fp)
            token_rows["doc_id"].append(doc_id)
            token_rows["n_words"].append(len(ws))
            token_rows["n_unigram_tokens"].append(n_tok)
        print(f"{sf_dir}: fp={fp} vocab={len(pieces)} docs={len(docs)}")

    pq.write_table(
        pa.table(
            {
                "corpus_fp": pa.array(vocab_rows["corpus_fp"], pa.string()),
                "rank": pa.array(vocab_rows["rank"], pa.int64()),
                "piece": pa.array(vocab_rows["piece"], pa.string()),
                "piece_count": pa.array(vocab_rows["piece_count"], pa.int64()),
            }
        ),
        OUT_VOCAB,
    )
    pq.write_table(
        pa.table(
            {
                "corpus_fp": pa.array(token_rows["corpus_fp"], pa.string()),
                "doc_id": pa.array(token_rows["doc_id"], pa.int64()),
                "n_words": pa.array(token_rows["n_words"], pa.int64()),
                "n_unigram_tokens": pa.array(
                    token_rows["n_unigram_tokens"], pa.int64()
                ),
            }
        ),
        OUT_TOKENS,
    )
    print(f"wrote {OUT_VOCAB} and {OUT_TOKENS}")


if __name__ == "__main__":
    main()
