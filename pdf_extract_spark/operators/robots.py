"""robots.txt exclusion rules and sitemap discovery — the crawl-policy
half of the web-extraction tier (the politeness half is
operators/crawl.py's fetch waves; this module decides WHAT may be
fetched, crawl.py decides WHEN).

Everything is pure scan-side codegen (split / regexp / window / join) —
no UDF anywhere — and every piece has an exact DuckDB counterpart, so
parsing, group selection, and longest-match precedence are all
value-hash-checked against an independent SQL reimplementation.

Semantics: the practical RFC 9309 subset

  * a robots body splits into lines; ``#`` starts a comment anywhere on
    a line; CRLF endings and surrounding whitespace are tolerated;
    directive names and agent tokens compare case-insensitively.
  * consecutive ``User-agent`` lines open ONE group that shares the
    rules that follow (the RFC group-merge rule); rules appearing
    before any ``User-agent`` line bind to no agent and are ignored.
  * group selection for an agent A: every group naming A exactly wins
    over the ``*`` groups; only if no exact group exists do the ``*``
    groups apply; if neither exists the host is unrestricted.
  * decision for a URL path: among the selected groups' rules whose
    path is a prefix of the URL path, the LONGEST path wins; on a
    length tie ``Allow`` wins; no matching rule (or no robots row at
    all) means allowed.  An empty rule value ("Disallow:" = allow all)
    is dropped at parse time.  Wildcards (``*``/``$``) are out of scope
    for this subset — rule paths are treated as literal prefixes.

100-TB shape: the per-host line window in ``parse_robots`` partitions
on host where one host contributes the lines of ONE robots file — the
de-facto 500 KiB robots size cap bounds any partition, so there is no
skew risk.  ``robots_decisions`` joins the frontier to the effective
rule table as an EQUI-join on host with the prefix test as a residual
condition; the rules side (hosts x a handful of rules) is orders of
magnitude smaller than the frontier but NOT broadcastable at web scale
(10^8 hosts x tens of rules), so the plan deliberately leaves the
strategy to Catalyst/AQE — a mega-host's fan-out (its URL count times
its rule count) is bounded per URL by the host's rule count and AQE
skew-join splits the host partition.  The winner is picked with a
map-side-combinable max over a (length, is_allow, ...) struct — no
per-URL window, no global sort.

Reference parity note: the reference engine (jrmuizel/pdf-extract) has
no crawl-policy layer; this extends the web family the same way
webgraph.py / crawl.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import canonical_url

# directives the parser retains; anything else (Host:, junk) is dropped
_DIRECTIVES = ("user-agent", "allow", "disallow", "crawl-delay", "sitemap")

# directive name ahead of the colon: letters and dashes (crawl-delay)
_DIRECTIVE_RE = r"^([A-Za-z][A-Za-z-]*)\s*:"
_VALUE_RE = r"^[A-Za-z][A-Za-z-]*\s*:\s*(.*)$"


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> one row per retained directive line:
    (host, ln, group_id, directive, value).

    ``group_id`` numbers User-agent groups per host (1-based); a group
    opens at a User-agent line whose PREVIOUS retained line is not a
    User-agent line, so consecutive agent lines share the group.  Lines
    before the first group carry group_id 0 (selected by nothing).
    """
    d = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "raw"),
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace("raw", r"\r$", ""), r"#.*$", "")
    )
    d = (
        d.withColumn("clean", clean)
        .withColumn(
            "directive", F.lower(F.regexp_extract("clean", _DIRECTIVE_RE, 1))
        )
        .withColumn("value", F.trim(F.regexp_extract("clean", _VALUE_RE, 1)))
        .where(F.col("directive").isin(*_DIRECTIVES))
    )
    w = Window.partitionBy("host").orderBy("ln")
    is_ua = F.col("directive") == "user-agent"
    d = d.withColumn(
        "starts_group", is_ua & ~F.lag(is_ua, 1, False).over(w)
    ).withColumn(
        "group_id",
        F.sum(F.col("starts_group").cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return d.select(
        "host", F.col("ln").cast("long").alias("ln"), "group_id",
        "directive", "value",
    )


def robots_rule_table(parsed: DataFrame) -> DataFrame:
    """The expanded group-scoped rule table: one row per (agent x rule)
    pair within each group — (host, group_id, agent, directive, value,
    ln).  Crawl-delay rides along as a group-scoped directive; Sitemap
    is host-global and intentionally excluded (see parse_sitemaps)."""
    agents = parsed.where(F.col("directive") == "user-agent").select(
        "host", "group_id", F.lower("value").alias("agent")
    )
    rules = parsed.where(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
        & (F.col("value") != "")
    ).select("host", "group_id", "directive", "value", "ln")
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "group_id", "agent", "directive", "value", "ln"
    )


def _selected_groups(parsed: DataFrame, agent: str) -> DataFrame:
    """The (host, group_id) set governing ``agent``: every group naming
    the agent exactly beats the ``*`` groups; ``*`` only applies when no
    exact group exists on that host."""
    a = agent.lower()
    ag = (
        parsed.where(F.col("directive") == "user-agent")
        .select("host", "group_id", F.lower("value").alias("ua"))
        .withColumn(
            "pref",
            F.when(F.col("ua") == a, 2).when(F.col("ua") == "*", 1),
        )
        .where(F.col("pref").isNotNull())
    )
    host_pref = ag.groupBy("host").agg(F.max("pref").alias("host_pref"))
    return (
        ag.join(host_pref, "host")
        .where(F.col("pref") == F.col("host_pref"))
        .select("host", "group_id")
        .distinct()
    )


def effective_rules(parsed: DataFrame, agent: str) -> DataFrame:
    """The allow/disallow rules that govern ``agent``: rules of every
    group naming the agent exactly, else of every ``*`` group —
    distinct (host, rule, rpath)."""
    sel = _selected_groups(parsed, agent)
    rules = parsed.where(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host", "group_id",
        F.col("directive").alias("rule"), F.col("value").alias("rpath"),
    )
    return rules.join(sel, ["host", "group_id"]).select(
        "host", "rule", "rpath"
    ).distinct()


def effective_crawl_delay(parsed: DataFrame, agent: str) -> DataFrame:
    """Per-host Crawl-delay governing ``agent`` (seconds, max across the
    selected groups; malformed values NULL out via the cast and drop):
    (host, crawl_delay).  Hosts with no delay directive emit no row —
    callers coalesce to their default."""
    sel = _selected_groups(parsed, agent)
    # try_cast, not cast: ANSI mode raises on malformed numerics, and
    # crawl bytes are untrusted — a bad value must drop, not kill a task
    delays = parsed.where(
        (F.col("directive") == "crawl-delay")
        & F.col("value").try_cast("double").isNotNull()
    ).select(
        "host", "group_id", F.col("value").try_cast("double").alias("d")
    )
    return (
        delays.join(sel, ["host", "group_id"])
        .groupBy("host")
        .agg(F.max("d").alias("crawl_delay"))
    )


def robots_decisions(
    parsed: DataFrame,
    frontier: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Per-frontier-URL fetch decision for ``agent``: (url, host,
    allowed, rule, rule_path) — rule/rule_path are the winning rule or
    NULL when nothing matched.  ``frontier`` holds canonical absolute
    URLs (one row per URL)."""
    eff = effective_rules(parsed, agent)
    fr = frontier.select(
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_extract(url_col, r"^[^:/?#]+://([^/?#]*)", 1)
        ).alias("host"),
        F.regexp_extract(url_col, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1).alias(
            "path"
        ),
    ).withColumn(
        "path", F.when(F.col("path") == "", "/").otherwise(F.col("path"))
    )
    m = fr.join(
        eff,
        (fr["host"] == eff["host"]) & fr["path"].startswith(eff["rpath"]),
        "left",
    )
    # longest path wins; on a tie allow (1) beats disallow (0); the
    # trailing (rpath, rule) fields only break exact duplicates so the
    # struct-max stays deterministic
    winner = F.max(
        F.when(
            eff["rpath"].isNotNull(),
            F.struct(
                F.length(eff["rpath"]).alias("l"),
                (eff["rule"] == "allow").cast("int").alias("a"),
                eff["rpath"].alias("p"),
                eff["rule"].alias("r"),
            ),
        )
    )
    return (
        m.groupBy(fr["url"], fr["host"])
        .agg(winner.alias("w"))
        .select(
            "url",
            "host",
            (F.col("w").isNull() | (F.col("w.a") == 1)).alias("allowed"),
            F.col("w.r").alias("rule"),
            F.col("w.p").alias("rule_path"),
        )
    )


def discovery_frontier(
    sitemap_entries: DataFrame, nodes: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Merge sitemap-declared page URLs with the link-graph node set into
    one discovery table: (url, in_graph, in_sitemap, sitemap_priority,
    sitemap_lastmod).

    ``in_sitemap AND NOT in_graph`` is the crawl's new-URL feed (declared
    but never linked); ``in_graph AND NOT in_sitemap`` flags pages the
    site stopped declaring.  Priority is the max across declaring
    sitemaps, lastmod the lexicographic max (ISO dates order correctly).

    100-TB shape: one groupBy on the sitemap side (bounded by declared
    URLs, far smaller than the frontier) and one full-outer equi-join on
    the canonical URL — both AQE-planned; no window, no UDF.
    """
    sm = (
        sitemap_entries.where(F.col("kind") == "url")
        .groupBy(F.col("loc").alias("url"))
        .agg(
            F.max(F.col("priority").cast("double")).alias("sitemap_priority"),
            F.max("lastmod").alias("sitemap_lastmod"),
        )
        .withColumn("in_sitemap", F.lit(True))
    )
    g = nodes.select(F.col(url_col).alias("url")).distinct().withColumn(
        "in_graph", F.lit(True)
    )
    return (
        g.join(sm, "url", "full_outer")
        .select(
            "url",
            F.coalesce("in_graph", F.lit(False)).alias("in_graph"),
            F.coalesce("in_sitemap", F.lit(False)).alias("in_sitemap"),
            "sitemap_priority",
            "sitemap_lastmod",
        )
    )


# --- sitemap discovery -----------------------------------------------------

_LOC_RE = r"<loc>([\s\S]*?)</loc>"
_LASTMOD_RE = r"<lastmod>([\s\S]*?)</lastmod>"
_PRIORITY_RE = r"<priority>([\s\S]*?)</priority>"


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(url, xml) -> one row per <url> (kind='url') or <sitemap>
    (kind='sitemap') entry: (sitemap_url, kind, loc, lastmod, priority).
    <loc> is canonicalized with the SAME rules as the link graph so
    sitemap entries merge with graph nodes; lastmod/priority stay
    strings (NULL when absent) — scheduling layers parse them.  Pure
    regexp codegen over the XML bytes: the sitemap grammar is flat
    enough that tag-scoped non-greedy extraction is exact, and a full
    XML parser would put a Python UDF on the scan path for nothing."""

    def entries(tag: str, kind: str) -> DataFrame:
        blocks = F.regexp_extract_all(
            F.col(xml_col), F.lit(rf"<{tag}>([\s\S]*?)</{tag}>"), F.lit(1)
        )
        return sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            F.lit(kind).alias("kind"),
            F.explode(blocks).alias("b"),
        )

    d = entries("url", "url").unionByName(entries("sitemap", "sitemap"))
    return d.select(
        "sitemap_url",
        "kind",
        canonical_url(F.trim(F.regexp_extract("b", _LOC_RE, 1))).alias("loc"),
        F.nullif(
            F.trim(F.regexp_extract("b", _LASTMOD_RE, 1)), F.lit("")
        ).alias("lastmod"),
        F.nullif(
            F.trim(F.regexp_extract("b", _PRIORITY_RE, 1)), F.lit("")
        ).alias("priority"),
    )
