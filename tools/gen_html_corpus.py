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


def extra_web_rows() -> list[tuple[str, str, str]]:
    """Web-only pages (no html_main golden derives from these — they
    exist to give the LINK GRAPH structure the fixture families can't):

    * `/farm` — a 40-anchor link farm: a high-out-degree hub for HITS
      and a link-density stress case for the boilerpipe classifier
      (every farm block must classify boilerplate).
    * `/t0..7` — an authority cycle: short articles linking back to the
      farm and to the next target, so authority mass circulates and the
      farm's hub score has real in-link support.
    * mirror host pages — absolute cross-host hrefs onto corpus.test,
      so edges span hosts and canonicalization runs on the dst side.
    * `/longform` — a long article with nav blocks interleaved between
      paragraphs (the WSDM'10 prev/next context rules fire mid-doc).
    """
    rows = []
    farm_links = " ".join(
        f"<a href='/t{i % 8}'>target {i} here</a>" for i in range(40)
    )
    rows.append((
        "web_link_farm-000000",
        "https://corpus.test/farm",
        f"<html><body><div class='links'>{farm_links}</div></body></html>",
    ))
    for i in range(8):
        para = (
            f"Target article {i} carries enough plain prose to classify "
            "as content under the shallow text feature rules because it "
            "holds well over sixteen words of link free body text."
        )
        rows.append((
            f"web_target_{i}-000000",
            f"https://corpus.test/t{i}",
            "<html><body>"
            f"<p>{para}</p>"
            f"<p><a href='/farm'>back to farm</a> and onward to "
            f"<a href='/t{(i + 1) % 8}'>the next target</a> in the ring, "
            "which keeps authority mass circulating through the cycle "
            "instead of draining into dangling frontier nodes.</p>"
            "</body></html>",
        ))
    for i in range(3):
        rows.append((
            f"web_mirror_{i}-000000",
            f"https://mirror.test/m{i}",
            "<html><body>"
            f"<p>Mirror page {i} syndicates the corpus and points back at "
            "the origin host with absolute links so the edge list crosses "
            "hosts and destination canonicalization gets exercised.</p>"
            f"<p><a href='https://corpus.test/t{i}'>origin target</a> "
            f"<a href='HTTPS://Corpus-1.TEST:443/a'>messy origin</a></p>"
            "</body></html>",
        ))
    paras = []
    for i in range(6):
        paras.append(
            f"<p>Longform paragraph {i} develops the argument across more "
            "than sixteen words so the classifier keeps it on its own "
            "evidence without leaning on the neighbour context rules.</p>"
        )
        paras.append(
            "<div class='related'><a href='/'>home</a> "
            f"<a href='/t{i}'>related {i}</a></div>"
        )
    rows.append((
        "web_longform-000000",
        "https://corpus.test/longform",
        "<html><body>" + "".join(paras) + "</body></html>",
    ))
    return rows


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
    rows.extend(extra_web_rows())
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
