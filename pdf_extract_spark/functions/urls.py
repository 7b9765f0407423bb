"""URL canonicalization + URL-keyed dedup — the step every web-crawl
pipeline runs BEFORE content dedup (CommonCrawl-derived corpora dedup by
canonical URL first: it is free relative to content hashing and removes
the bulk of recrawl duplicates).

All pure JVM codegen expressions (regexp_extract / split / filter /
array_sort) with exact DuckDB oracles — no UDFs, so canonicalization
runs scan-side at full scan speed and the dedup is one hash shuffle on
the canonical key.

Canonical form (the conservative, widely used subset):
  * scheme and host lowercased
  * default ports stripped (:80 for http, :443 for https)
  * fragment dropped
  * tracking query parameters dropped (utm_*, fbclid, gclid)
  * remaining query parameters sorted bytewise
  * empty path normalized to '/'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never affect content identity
_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL as a single codegen
    expression tree.  Engine-portable: every piece has an exact DuckDB
    counterpart (see URL_CANONICAL_SQL fragments in queries.py)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # the query must come from the PRE-fragment part: an unanchored
    # \?(...) would resurface a '?' inside the fragment as a query
    # ('http://h.io/p#a?b=1' must canonicalize to 'http://h.io/p')
    prefrag = F.regexp_extract(url, r"^([^#]*)", 1)
    query = F.regexp_extract(prefrag, r"\?(.*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    # guard: concat only when params survive (DuckDB array_to_string of an
    # empty list is NULL, Spark's is '' — the `when` keeps both sides on
    # the non-empty branch or a literal)
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    # validity guard: a relative/schemeless/junk URL has no scheme or host
    # to normalize — fall back to the verbatim input so malformed rows
    # dedup only on exact equality, instead of ALL collapsing onto one
    # ':///' key (a corpus-wide hot group and mass false dedup)
    return F.when(
        (scheme == "") | (host == ""), url
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qpart))


def url_dedup(docs: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-keyed dedup verdicts: one row per input doc with its canonical
    URL, whether it is the keeper (minimum id among docs sharing the
    canonical form), and the group size.  One map-side-combined groupBy on
    the canonical key + one equi-join back — the exact-dedup shuffle
    shape, chosen over a window on purpose: crawls DO have giant dup
    groups (a landing page recrawled 10^8 times), and a
    Window.partitionBy(canonical_url) would push such a group through one
    task, while here the groupBy combines map-side and AQE splits the
    skewed probe side of the join."""
    with_c = docs.select(
        id_col, url_col, canonical_url(F.col(url_col)).alias("canonical_url")
    )
    groups = with_c.groupBy("canonical_url").agg(
        F.min(id_col).alias("__keep_id"),
        F.count("*").cast("long").alias("n_dups"),
    )
    return (
        with_c.join(groups, "canonical_url")
        .select(
            id_col,
            url_col,
            "canonical_url",
            (F.col(id_col) == F.col("__keep_id")).alias("is_canonical"),
            "n_dups",
        )
    )
