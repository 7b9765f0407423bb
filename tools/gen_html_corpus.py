"""Materialize the deterministic raw HTML corpus (doc_id, url, html) as
dist/html_corpus.parquet so DuckDB oracles can read the SAME bytes the
Spark web-graph queries consume.

Page URL assignment is what makes the link graph interesting: family i
(sorted order) is served at path '/' (i = 0) or '/<letter i>' — the
boilerplate nav links to '/', '/a', '/b' and the menu family links to
'/m', '/n', so several hrefs land on REAL pages and the graph has cycles,
while the rest ('/login', '/s0'.., '/x', ...) are frontier URLs with no
outlinks (dangling nodes for PageRank).  Replica 1 is served from a
second host with deliberately messy URLs (upper-case scheme/host, an
explicit :443) so url canonicalization is exercised on the src side.
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_spark.html_fixtures import html_corpus

REPLICAS = 2


def corpus_rows() -> list[tuple[str, str, str]]:
    fam_paths: dict[str, str] = {}
    rows = []
    for doc_id, html, _expected in html_corpus(replicas=REPLICAS):
        name, rep = doc_id.rsplit("-", 1)
        if name not in fam_paths:
            i = len(fam_paths)
            fam_paths[name] = "/" if i == 0 else "/" + string.ascii_lowercase[i - 1]
        path = fam_paths[name]
        if int(rep) == 0:
            url = f"https://corpus.test{path}"
        else:
            url = f"HTTPS://Corpus-{int(rep)}.TEST:443{path}"
        rows.append((doc_id, url, html))
    return rows


def main() -> None:
    rows = corpus_rows()
    table = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "url": [r[1] for r in rows],
            "html": [r[2] for r in rows],
        }
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dist",
        "html_corpus.parquet",
    )
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
