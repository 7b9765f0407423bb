"""Host-level graph projection (operators/webgraph.py host_edges) and
the sitemap/graph discovery frontier (operators/robots.py
discovery_frontier)."""

from pyspark.sql import functions as F

from pdf_extract_spark.operators.robots import discovery_frontier
from pdf_extract_spark.operators.webgraph import host_edges


def _edges(spark):
    rows = [
        # a.test -> b.test twice (two page edges, 3 anchors total)
        ("https://a.test/p1", "https://b.test/x", 2),
        ("https://a.test/p2", "https://b.test/y", 1),
        # intra-host navigation must be dropped
        ("https://a.test/p1", "https://a.test/p2", 9),
        # b.test -> a.test once
        ("https://b.test/x", "https://a.test/p1", 1),
    ]
    return spark.createDataFrame(
        rows, "src string, dst string, n_anchors long"
    )


def test_host_edges_projection(spark):
    got = {
        (r.src_host, r.dst_host): (r.n_page_edges, r.n_anchors)
        for r in host_edges(_edges(spark)).collect()
    }
    assert got == {
        ("a.test", "b.test"): (2, 3),
        ("b.test", "a.test"): (1, 1),
    }


def test_discovery_frontier_merge(spark):
    entries = spark.createDataFrame(
        [
            ("s1", "url", "https://a.test/p1", "2026-01-01", "0.3"),
            ("s2", "url", "https://a.test/p1", None, "0.9"),  # max wins
            ("s1", "url", "https://c.test/new", "2026-02-02", None),
            ("s1", "sitemap", "https://a.test/sm.xml", None, None),  # excluded
        ],
        "sitemap_url string, kind string, loc string, "
        "lastmod string, priority string",
    )
    nodes = spark.createDataFrame(
        [("https://a.test/p1",), ("https://b.test/x",)], "url string"
    )
    got = {r.url: r for r in discovery_frontier(entries, nodes).collect()}
    assert set(got) == {
        "https://a.test/p1", "https://b.test/x", "https://c.test/new"
    }
    both = got["https://a.test/p1"]
    assert both.in_graph and both.in_sitemap
    assert both.sitemap_priority == 0.9  # max across declaring sitemaps
    assert both.sitemap_lastmod == "2026-01-01"
    new = got["https://c.test/new"]
    assert new.in_sitemap and not new.in_graph
    assert new.sitemap_priority is None
    stale = got["https://b.test/x"]
    assert stale.in_graph and not stale.in_sitemap
    # the <sitemap> index entry never appears as a frontier URL
    assert "https://a.test/sm.xml" not in got


def test_host_pagerank_mass_conservation(spark):
    """The shared fixed-point kernel over a host projection: ranks must
    sum to SCALE minus bounded floor losses."""
    from pdf_extract_spark.operators.webgraph import (
        SCALE,
        pagerank_fixed_point,
    )

    he = host_edges(_edges(spark)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    ranks = pagerank_fixed_point(he, iterations=5).collect()
    tot = sum(r.rank_e12 for r in ranks)
    assert 0 <= SCALE - tot < 400 * len(ranks)
