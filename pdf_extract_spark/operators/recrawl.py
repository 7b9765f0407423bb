"""Recrawl lifecycle operators: crawl-over-crawl change detection.

The incremental-recrawl loop needs to know, per canonical URL, whether
the page is new, gone, changed, or unchanged since the previous crawl
round — the diff drives frontier priority (changed pages recrawl first),
index tombstones (removed), and the skip set (unchanged, the bulk).

Reference parity note: the reference engine (jrmuizel/pdf-extract) has
no crawl layer; this extends the web family like robots.py/crawl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Crawl-over-crawl change detection: (url, status, prev_fp, curr_fp)
    with status in {added, removed, changed, unchanged}.

    The recrawl scheduler's input: 'changed' URLs re-enter the frontier
    at high priority, 'removed' URLs tombstone downstream indexes, and
    the unchanged bulk is skipped entirely — at web scale the diff is
    what makes incremental recrawls orders of magnitude cheaper than
    full ones.  One full-outer equi-join on the canonical URL; both
    sides arrive pre-deduplicated (doc_url_dedup / resolve_redirects
    upstream), so there is no window and no skew concern beyond what
    AQE already handles for hot URL-hash ranges.
    """
    p = prev.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("prev_fp")
    )
    c = curr.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("curr_fp")
    )
    return p.join(c, "url", "full_outer").select(
        "url",
        F.when(F.col("prev_fp").isNull(), F.lit("added"))
        .when(F.col("curr_fp").isNull(), F.lit("removed"))
        .when(F.col("prev_fp") == F.col("curr_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "prev_fp",
        "curr_fp",
    )
