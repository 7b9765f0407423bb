"""Materialize the deterministic crawl-policy corpus — robots.txt bodies
and sitemap XML bodies — as dist/robots_corpus.parquet and
dist/sitemap_corpus.parquet, so the DuckDB oracles read the SAME bytes
the Spark robots/sitemap queries consume (same contract as
tools/gen_html_corpus.py).

The bodies are engineered to exercise every parse branch the operator
claims (operators/robots.py):

  * corpus.test — two groups: a '*' group and an exact-agent group whose
    two consecutive ``User-agent`` lines (trainbot, altbot) SHARE one rule
    set (the RFC 9309 group-merge rule); longest-match precedence
    (/t0 allow vs /t disallow), the allow-wins-on-tie rule (/x twice),
    a Crawl-delay, and a Sitemap directive.
  * corpus-1.test — CRLF line endings, a group-less preamble rule that
    must be IGNORED (rules before any User-agent line bind to no agent),
    mixed-case directive and agent names, an inline ``#`` comment, an
    empty ``Disallow:`` (means allow-all and must be dropped), and an
    exact-tie where Allow and Disallow name the same path.
  * dead.test — a robots file for a host that never appears in the
    frontier: its rules must not leak into any decision.
  * mirror.test has NO robots row: every URL on it is allowed by the
    missing-robots default.

Sitemaps cover the urlset and sitemapindex shapes, messy-cased <loc>
values (canonicalization must fold them onto graph nodes), surrounding
whitespace, and optional <lastmod>/<priority> fields present/absent.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

ROBOTS = [
    (
        "corpus.test",
        "\n".join(
            [
                "# corpus.test crawl policy",
                "User-agent: *",
                "Disallow: /login",
                "Disallow: /s",
                "Allow: /s0",
                "Crawl-delay: 2",
                "",
                "User-agent: trainbot",
                "User-agent: altbot",
                "Allow: /t0",
                "Disallow: /t",
                "Disallow: /farm",
                "Allow: /x",
                "Disallow: /x",
                "",
                "Sitemap: https://corpus.test/sitemap.xml",
                "",
            ]
        ),
    ),
    (
        "corpus-1.test",
        "\r\n".join(
            [
                "Disallow: /preamble",
                "",
                "User-Agent: TrainBot",
                "Disallow: /a",
                "Allow: /a",
                "DISALLOW: /b  # keep the b section private",
                "Disallow:",
                "Crawl-delay: 7",
                "",
            ]
        ),
    ),
    (
        "dead.test",
        "User-agent: *\nDisallow: /\n",
    ),
]

SITEMAPS = [
    (
        "https://corpus.test/sitemap.xml",
        "\n".join(
            [
                '<?xml version="1.0" encoding="UTF-8"?>',
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
                "  <url>",
                "    <loc> HTTPS://Corpus.TEST:443/t0 </loc>",
                "    <lastmod>2026-01-15</lastmod>",
                "    <priority>0.8</priority>",
                "  </url>",
                "  <url>",
                "    <loc>https://corpus.test/farm</loc>",
                "    <priority>0.2</priority>",
                "  </url>",
                "  <url>",
                "    <loc>https://corpus.test/longform</loc>",
                "    <lastmod>2025-11-30</lastmod>",
                "  </url>",
                "</urlset>",
            ]
        ),
    ),
    (
        "https://corpus.test/sitemap_index.xml",
        "\n".join(
            [
                '<?xml version="1.0" encoding="UTF-8"?>',
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
                "  <sitemap>",
                "    <loc>https://corpus.test/sitemap.xml</loc>",
                "    <lastmod>2026-02-01</lastmod>",
                "  </sitemap>",
                "  <sitemap>",
                "    <loc>HTTPS://Mirror.TEST/sitemap.xml</loc>",
                "  </sitemap>",
                "</sitemapindex>",
            ]
        ),
    ),
]


def main() -> None:
    dist = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dist"
    )
    robots = pa.table(
        {
            "host": [r[0] for r in ROBOTS],
            "robots_txt": [r[1] for r in ROBOTS],
        }
    )
    pq.write_table(robots, os.path.join(dist, "robots_corpus.parquet"))
    sitemaps = pa.table(
        {
            "url": [s[0] for s in SITEMAPS],
            "xml": [s[1] for s in SITEMAPS],
        }
    )
    pq.write_table(sitemaps, os.path.join(dist, "sitemap_corpus.parquet"))
    print(f"wrote robots_corpus.parquet ({robots.num_rows} rows) and "
          f"sitemap_corpus.parquet ({sitemaps.num_rows} rows) under {dist}")


if __name__ == "__main__":
    main()
