"""Redirect-chain resolution (operators/redirects.py): pointer-jumping
doubling vs hand-walked chains, cycle quarantine, identity rows."""

from pdf_extract_spark.operators.redirects import resolve_redirects


def _frames(spark):
    # chain: a -> b -> c -> d (terminal), 2-cycle: x <-> y,
    # feeder into the cycle: z -> x, identity: solo
    redirects = spark.createDataFrame(
        [
            ("https://s/a", "https://s/b"),
            ("https://s/b", "https://s/c"),
            ("https://s/c", "https://s/d"),
            ("https://s/x", "https://s/y"),
            ("https://s/y", "https://s/x"),
            ("https://s/z", "https://s/x"),
        ],
        "src string, dst string",
    )
    urls = spark.createDataFrame(
        [(u,) for u in
         ["https://s/a", "https://s/b", "https://s/c", "https://s/d",
          "https://s/x", "https://s/y", "https://s/z", "https://s/solo"]],
        "url string",
    )
    return urls, redirects


def test_resolve_chains_cycles_identity(spark):
    urls, redirects = _frames(spark)
    got = {r.url: r for r in resolve_redirects(urls, redirects, 16).collect()}
    assert (got["https://s/a"].final_url, got["https://s/a"].hops) == (
        "https://s/d", 3)
    assert (got["https://s/b"].final_url, got["https://s/b"].hops) == (
        "https://s/d", 2)
    assert (got["https://s/c"].final_url, got["https://s/c"].hops) == (
        "https://s/d", 1)
    # terminal and never-redirected URLs resolve to themselves at 0 hops
    for u in ("https://s/d", "https://s/solo"):
        assert (got[u].final_url, got[u].hops, got[u].resolved) == (u, 0, True)
    # cycle members AND the chain feeding into the cycle quarantine
    for u in ("https://s/x", "https://s/y", "https://s/z"):
        assert not got[u].resolved
        assert got[u].final_url is None and got[u].hops is None


def test_resolve_long_chain_within_doubling_budget(spark):
    """A chain of length 15 must resolve exactly with max_hops=16
    (4 doubling rounds cover 2^4 hops)."""
    n = 15
    redirects = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(n)], "src string, dst string"
    )
    urls = spark.createDataFrame(
        [(f"u{i}",) for i in range(n + 1)], "url string"
    )
    got = {r.url: r for r in resolve_redirects(urls, redirects, 16).collect()}
    assert all(got[f"u{i}"].final_url == f"u{n}" for i in range(n + 1))
    assert [got[f"u{i}"].hops for i in range(n + 1)] == list(
        range(n, -1, -1)
    )
    assert all(r.resolved for r in got.values())


def test_resolve_partition_invariance(spark):
    urls, redirects = _frames(spark)
    one = {
        tuple(r) for r in resolve_redirects(
            urls.coalesce(1), redirects.coalesce(1), 16
        ).collect()
    }
    many = {
        tuple(r) for r in resolve_redirects(
            urls.repartition(7), redirects.repartition(5), 16
        ).collect()
    }
    assert one == many


def test_snapshot_diff_statuses(spark):
    from pdf_extract_spark.operators.recrawl import snapshot_diff

    prev = spark.createDataFrame(
        [("u1", "f1"), ("u2", "f2"), ("u3", "f3")],
        "url string, fingerprint string",
    )
    curr = spark.createDataFrame(
        [("u2", "f2"), ("u3", "f3x"), ("u4", "f4")],
        "url string, fingerprint string",
    )
    got = {r.url: r for r in snapshot_diff(prev, curr).collect()}
    assert got["u1"].status == "removed" and got["u1"].curr_fp is None
    assert got["u2"].status == "unchanged"
    assert got["u3"].status == "changed"
    assert (got["u3"].prev_fp, got["u3"].curr_fp) == ("f3", "f3x")
    assert got["u4"].status == "added" and got["u4"].prev_fp is None
    assert len(got) == 4
