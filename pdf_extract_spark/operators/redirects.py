"""Redirect-chain resolution: map every URL to the terminal target of
its HTTP-redirect chain (the alias a crawler must fetch and the key
dedup/link analysis should group on).

Semantics: ``redirects`` is a functional mapping — at most ONE outgoing
redirect per src URL (a crawler records one Location per fetch).  A URL
resolves to the first chain element with NO outgoing redirect; chains
that never terminate within ``max_hops`` (cycles, or longer than the
cap) come back ``resolved = false`` with NULL final_url — the caller's
quarantine tier, same contract as the tagged media stubs.

100-TB shape — pointer jumping, not per-hop walking: each round joins
the current mapping with itself (``next(u) = f(f(u))``), DOUBLING the
distance covered, so a chain of length L resolves in ceil(log2 L)
shuffles instead of L.  ceil(log2 max_hops) rounds of one equi-join
each, lineage truncated per round exactly like pagerank_fixed_point —
the same trick operators/graph.py uses for connected components.  The
final status check is one anti-join-shaped left join against redirect
sources.  No window, no UDF, no driver state.

Reference parity note: the reference engine (jrmuizel/pdf-extract) has
no crawl layer; this extends the web family like robots.py/crawl.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    urls: DataFrame,
    redirects: DataFrame,
    max_hops: int = 16,
    url_col: str = "url",
) -> DataFrame:
    """(url) x (src, dst) -> (url, final_url, hops, resolved).

    URLs with no outgoing redirect resolve to themselves at 0 hops.
    ``max_hops`` must be a power of two (the doubling rounds cover
    exactly that distance); chains longer than it, and cycles, are
    ``resolved = false``.
    """
    rounds = max(1, int(math.ceil(math.log2(max_hops))))
    # m: the current "skip pointer" per redirecting src — after round k
    # it points 2^k hops ahead (or at the chain's terminal, whichever
    # comes first), with hops = the exact distance covered
    m = redirects.select(
        F.col("src"), F.col("dst"), F.lit(1).cast("long").alias("hops")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("n_src"),
            F.col("dst").alias("n_dst"),
            F.col("hops").alias("n_hops"),
        )
        m = (
            m.join(nxt, m["dst"] == nxt["n_src"], "left")
            .select(
                "src",
                F.coalesce("n_dst", "dst").alias("dst"),
                (F.col("hops") + F.coalesce("n_hops", F.lit(0))).alias(
                    "hops"
                ),
            )
            .localCheckpoint(eager=True)
        )
    # terminal test: the landing URL must have no outgoing redirect;
    # a pointer still sitting on a redirecting src after full doubling
    # is a cycle or an over-long chain
    srcs = redirects.select(F.col("src").alias("dst")).distinct().withColumn(
        "still_redirects", F.lit(True)
    )
    resolved = (
        m.join(srcs, "dst", "left")
        .select(
            F.col("src").alias("url"),
            F.when(F.col("still_redirects").isNull(), F.col("dst")).alias(
                "final_url"
            ),
            F.when(F.col("still_redirects").isNull(), F.col("hops")).alias(
                "hops"
            ),
            F.col("still_redirects").isNull().alias("resolved"),
        )
    )
    base = urls.select(F.col(url_col).alias("url")).distinct()
    return base.join(resolved, "url", "left").select(
        "url",
        F.coalesce("final_url", F.when(F.col("resolved").isNull(), F.col("url"))).alias("final_url"),
        F.coalesce("hops", F.when(F.col("resolved").isNull(), F.lit(0).cast("long"))).alias("hops"),
        F.coalesce("resolved", F.lit(True)).alias("resolved"),
    )
