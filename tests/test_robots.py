"""Crawl-policy layer (operators/robots.py) and heuristic language ID
(functions/langid.py): RFC 9309 subset semantics — group merging, agent
selection precedence, longest-match decisions — plus sitemap parsing
and the langid arg-max, all against hand-computed expectations."""

from pyspark.sql import functions as F

from pdf_extract_spark.functions.langid import identify_language
from pdf_extract_spark.operators.robots import (
    effective_rules,
    parse_robots,
    parse_sitemaps,
    robots_decisions,
)

ROBOTS_BODY = "\r\n".join(
    [
        "Disallow: /preamble",  # before any group: must bind to group 0
        "User-agent: *",
        "Disallow: /private",
        "",
        "User-Agent: TrainBot  # exact group, mixed case",
        "User-agent: altbot",  # consecutive UA lines merge into ONE group
        "Allow: /private/ok",
        "Disallow: /private",
        "Allow: /tie",
        "Disallow: /tie",  # exact length tie: allow must win
        "Disallow:",  # empty value = allow-all, dropped from rules
        "Crawl-delay: 3",
    ]
)


def _parsed(spark, body=ROBOTS_BODY, host="h.test"):
    return parse_robots(
        spark.createDataFrame([(host, body)], "host string, robots_txt string")
    )


def test_parse_robots_groups_and_cleanup(spark):
    rows = _parsed(spark).collect()
    by_val = {(r.directive, r.value): r for r in rows}
    # preamble rule retained but in group 0 (selected by no agent)
    assert by_val[("disallow", "/preamble")].group_id == 0
    # '*' group is 1; the merged trainbot+altbot group is 2
    assert by_val[("user-agent", "*")].group_id == 1
    assert by_val[("user-agent", "TrainBot")].group_id == 2
    assert by_val[("user-agent", "altbot")].group_id == 2
    assert by_val[("allow", "/private/ok")].group_id == 2
    # inline comment stripped before value capture, CRLF tolerated
    assert ("user-agent", "TrainBot") in by_val
    # empty Disallow kept at parse level with empty value
    assert ("disallow", "") in by_val
    assert by_val[("crawl-delay", "3")].group_id == 2


def test_effective_rules_exact_beats_star(spark):
    p = _parsed(spark)
    exact = {
        (r.rule, r.rpath) for r in effective_rules(p, "TRAINBOT").collect()
    }
    # only the merged exact group's non-empty allow/disallow rules
    assert exact == {
        ("allow", "/private/ok"),
        ("disallow", "/private"),
        ("allow", "/tie"),
        ("disallow", "/tie"),
    }
    # an agent with no exact group falls back to '*'
    star = {(r.rule, r.rpath) for r in effective_rules(p, "nobot").collect()}
    assert star == {("disallow", "/private")}


def _decide(spark, parsed, urls, agent="trainbot"):
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r.url: r for r in robots_decisions(parsed, frontier, agent).collect()
    }


def test_robots_decisions_longest_match_and_ties(spark):
    p = _parsed(spark)
    d = _decide(
        spark,
        p,
        [
            "https://h.test/private/ok/page",  # allow /private/ok (longer)
            "https://h.test/private/secret",  # disallow /private
            "https://h.test/tie",  # equal length: allow wins
            "https://h.test/open",  # no rule matches -> allowed
            "https://h.test",  # empty path folds to '/'
            "https://other.test/anything",  # host w/o robots -> allowed
        ],
    )
    assert d["https://h.test/private/ok/page"].allowed
    assert d["https://h.test/private/ok/page"].rule_path == "/private/ok"
    assert not d["https://h.test/private/secret"].allowed
    assert d["https://h.test/private/secret"].rule == "disallow"
    assert d["https://h.test/tie"].allowed
    assert d["https://h.test/open"].allowed
    assert d["https://h.test/open"].rule is None
    assert d["https://h.test"].allowed
    assert d["https://other.test/anything"].allowed
    # preamble rule (group 0) must never fire: /preamble is allowed
    d2 = _decide(spark, p, ["https://h.test/preamble/x"])
    assert d2["https://h.test/preamble/x"].allowed


def test_robots_decisions_star_fallback_and_case(spark):
    p = _parsed(spark)
    # unknown agent gets the '*' group: /private disallowed, /tie open
    d = _decide(
        spark, p, ["https://h.test/private/x", "https://h.test/tie"], "nobot"
    )
    assert not d["https://h.test/private/x"].allowed
    assert d["https://h.test/tie"].allowed
    # agent matching is case-insensitive both ways
    d = _decide(spark, p, ["https://h.test/tie"], "AltBot")
    assert d["https://h.test/tie"].allowed


def test_effective_crawl_delay_selection(spark):
    """Delay comes from the SELECTED groups only (exact beats '*'), max
    across them; malformed values drop; undeclared hosts emit no row."""
    from pdf_extract_spark.operators.robots import effective_crawl_delay

    body = "\n".join(
        [
            "User-agent: *",
            "Crawl-delay: 10",
            "",
            "User-agent: trainbot",
            "Crawl-delay: 2",
            "Crawl-delay: 2.5",
            "Crawl-delay: soon",  # malformed -> dropped
        ]
    )
    p = parse_robots(
        spark.createDataFrame(
            [("h.test", body), ("bare.test", "User-agent: *\nDisallow: /x")],
            "host string, robots_txt string",
        )
    )
    got = {r.host: r.crawl_delay for r in
           effective_crawl_delay(p, "TrainBot").collect()}
    assert got == {"h.test": 2.5}  # exact group's max, not '*'s 10
    star = {r.host: r.crawl_delay for r in
            effective_crawl_delay(p, "otherbot").collect()}
    assert star == {"h.test": 10.0}


def test_fetch_schedule_composition(spark):
    """Waves timed by the host's delay: offset = wave * crawl_delay,
    default 1.0 for undeclared hosts; disallowed URLs never scheduled."""
    from pdf_extract_spark.operators.crawl import fetch_schedule

    p = _parsed(spark)  # trainbot group has Crawl-delay: 3 (see body)
    urls = [f"https://h.test/open{i}" for i in range(5)] + [
        "https://h.test/private/secret",  # disallowed for trainbot
        "https://quiet.test/a",
        "https://quiet.test/b",
        "https://quiet.test/c",
    ]
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = fetch_schedule(
        p, frontier, "trainbot", per_host_cap=2, default_delay_s=1.0
    ).collect()
    assert all(r.url != "https://h.test/private/secret" for r in rows)
    for r in rows:
        expect_delay = 3.0 if r.host == "h.test" else 1.0
        assert r.crawl_delay == expect_delay
        assert r.fetch_offset_s == r.wave * expect_delay
    # 5 h.test URLs at cap 2 -> waves 0,0,1,1,2 -> max offset 2*3=6
    assert max(r.fetch_offset_s for r in rows if r.host == "h.test") == 6.0
    assert max(r.fetch_offset_s for r in rows if r.host == "quiet.test") == 1.0


SITEMAP_XML = "\n".join(
    [
        '<?xml version="1.0"?>',
        "<urlset>",
        "  <url><loc> HTTPS://H.TEST:443/a </loc>"
        "<lastmod>2026-01-01</lastmod><priority>0.9</priority></url>",
        "  <url><loc>https://h.test/b</loc></url>",
        "</urlset>",
    ]
)

SITEMAP_INDEX_XML = (
    "<sitemapindex><sitemap><loc>http://h.test:80/s1.xml</loc>"
    "<lastmod>2026-02-02</lastmod></sitemap></sitemapindex>"
)


def test_parse_sitemaps_canonicalizes_and_nulls(spark):
    df = spark.createDataFrame(
        [
            ("https://h.test/sitemap.xml", SITEMAP_XML),
            ("https://h.test/sitemap_index.xml", SITEMAP_INDEX_XML),
        ],
        "url string, xml string",
    )
    rows = {(r.kind, r.loc): r for r in parse_sitemaps(df).collect()}
    # messy-cased loc with default port canonicalized onto graph form
    a = rows[("url", "https://h.test/a")]
    assert a.lastmod == "2026-01-01" and a.priority == "0.9"
    b = rows[("url", "https://h.test/b")]
    assert b.lastmod is None and b.priority is None
    s1 = rows[("sitemap", "http://h.test/s1.xml")]
    assert s1.lastmod == "2026-02-02" and s1.priority is None
    assert len(rows) == 3


def test_langid_argmax_und_and_ties(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "the cat and the dog went to the market and it is fine"),
            ("d2", "le chat et la maison est que des une belle les choses"),
            ("d3", "der Hund und die Katze ist nicht ein Tier mit Namen"),
            ("d4", "el perro y los gatos es una que de las casas"),
            ("d5", "这是一个中文文档 没有空格"),
            ("d6", "zzz qqq www"),  # nothing scores -> und
            ("d7", ""),  # empty text -> und
        ],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in identify_language(docs).collect()}
    assert got["d1"].lang_pred == "en"
    assert got["d2"].lang_pred == "fr"
    assert got["d3"].lang_pred == "de"
    assert got["d4"].lang_pred == "es"
    assert got["d5"].lang_pred == "zh"
    assert got["d5"].score_zh == len("这是一个中文文档没有空格")
    assert got["d6"].lang_pred == "und"
    assert got["d7"].lang_pred == "und"
    # deterministic tie-break: 'de' before 'en' in code order
    tie = spark.createDataFrame(
        [("t", "und the")], "doc_id string, text string"
    )
    r = identify_language(tie).collect()[0]
    assert r.score_de == r.score_en == 1 and r.lang_pred == "de"


def test_langid_plan_is_jvm_only_no_shuffle(spark):
    """langid must stay a narrow scan-side projection: no Python eval
    nodes and no Exchange in the physical plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        identify_language(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_robots_decisions_partition_invariance(spark):
    """The struct-max winner must not depend on input partitioning."""
    p = _parsed(spark)
    urls = [f"https://h.test/private/ok/p{i}" for i in range(10)] + [
        f"https://h.test/private/p{i}" for i in range(10)
    ]
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    one = {
        (r.url, r.allowed, r.rule, r.rule_path)
        for r in robots_decisions(p, frontier.coalesce(1), "trainbot").collect()
    }
    many = {
        (r.url, r.allowed, r.rule, r.rule_path)
        for r in robots_decisions(
            p, frontier.repartition(13), "trainbot"
        ).collect()
    }
    assert one == many


def test_parse_robots_hostile_bytes(spark):
    """Untrusted crawl bytes: binary junk, enormous lines, directives
    with no colon, and a directive-bomb (10k lines) must parse without
    raising and without row explosion — the retained-directive filter
    bounds output to actual directive lines."""
    junk = "\x00\x01\x02<<>>%%EOF" + "A" * 100_000
    bomb = "\n".join(f"Disallow: /p{i}" for i in range(10_000))
    rows = parse_robots(
        spark.createDataFrame(
            [
                ("junk.test", junk),
                ("nocolon.test", "UserAgent *\nDisallow\njustwords"),
                ("bomb.test", "User-agent: *\n" + bomb),
            ],
            "host string, robots_txt string",
        )
    )
    by_host = {
        r["host"]: r["n"]
        for r in rows.groupBy("host").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert "junk.test" not in by_host        # nothing retained
    assert "nocolon.test" not in by_host     # colon-less lines dropped
    assert by_host["bomb.test"] == 10_001    # bounded by directive lines
    # and the decision path stays total: group-0-less bomb host decides
    d = _decide(spark, rows, ["https://bomb.test/p5", "https://junk.test/x"])
    assert not d["https://bomb.test/p5"].allowed
    assert d["https://junk.test/x"].allowed


def test_parse_sitemaps_hostile_xml(spark):
    """Unterminated tags, nested garbage, and non-XML bytes must yield
    zero or well-formed rows, never a raise."""
    df = spark.createDataFrame(
        [
            ("https://a.test/s1.xml", "<urlset><url><loc>https://a.test/x"),
            ("https://a.test/s2.xml", "\x00\xff not xml at all"),
            ("https://a.test/s3.xml",
             "<urlset><url><loc>https://a.test/ok</loc></url>"
             "<url><priority>0.5</priority></url></urlset>"),
        ],
        "url string, xml string",
    )
    from pdf_extract_spark.operators.robots import parse_sitemaps

    rows = parse_sitemaps(df).collect()
    # only the two complete <url> blocks of s3 survive; the loc-less one
    # carries an empty-canonicalized loc and NULL lastmod/priority=0.5
    assert {r.sitemap_url for r in rows} == {"https://a.test/s3.xml"}
    locs = {r.loc for r in rows}
    assert "https://a.test/ok" in locs and len(rows) == 2
