"""Physical-plan quality gates: the plans we ship must stay the plans we
designed — filters pushed to the parquet scan, columns pruned, small dims
broadcast, no Python in JVM-expressible pipelines."""

import re

from pyspark.sql import functions as F

from pdf_extract_spark.queries import (
    dedup_exact_q,
    doc_stats,
    q1_pricing_summary,
    q5_nation_revenue,
    spans_explode,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_filter_pushed_to_scan(spark):
    txt = formatted(q1_pricing_summary(spark, SF))
    assert "PushedFilters" in txt
    m = re.search(r"PushedFilters: \[([^\]]*)\]", txt)
    assert m and "l_shipdate" in m.group(1), m.group(0) if m else txt[:500]


def test_q1_column_pruning(spark):
    txt = formatted(q1_pricing_summary(spark, SF))
    m = re.search(r"ReadSchema: ([^\n]*)", txt)
    assert m is not None
    # only the 5 needed columns are read, not all 11
    assert "l_partkey" not in m.group(1)
    assert "l_orderkey" not in m.group(1)
    assert "l_quantity" in m.group(1)


def test_q5_broadcasts_small_dims(spark):
    txt = plan_of(q5_nation_revenue(spark, SF))
    assert "BroadcastHashJoin" in txt
    # never a cartesian / nested-loop on the fact table
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_doc_stats_is_jvm_only(spark):
    """Text analysis must stay in codegen: no Python UDF nodes."""
    df = doc_stats(spark, SF)
    txt = plan_of(df)
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt
    # AQE finalizes the plan on execution; codegen spans appear then
    df.collect()
    final = plan_of(df)
    # '*(N)' is the whole-stage-codegen marker in the final plan string
    assert "*(" in final


def test_dedup_exact_partial_aggregation(spark):
    """groupBy must produce map-side partial agg (two HashAggregate nodes)."""
    txt = plan_of(dedup_exact_q(spark, SF))
    assert txt.count("HashAggregate") >= 2


def test_spans_explode_single_shuffle(spark):
    """The span-ordering window should cost exactly one exchange."""
    txt = plan_of(spans_explode(spark, SF))
    # one shuffle for the window partitioning + possibly one for orderBy
    # sampling; never more than 2 data exchanges
    assert txt.count("Exchange") <= 2


def test_ngram_jaccard_hot_set_is_broadcast_anti(spark):
    """The df-cap must be applied with a broadcast ANTI-join against the
    tiny hot-shingle set — never a shuffle join against the huge rare set —
    and doc sizes must come from size(array) with no extra doc_id shuffle."""
    from pdf_extract_spark.queries import ngram_jaccard_q

    df = ngram_jaccard_q(spark, SF)
    df.collect()  # AQE-final plan
    txt = plan_of(df)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", txt) or (
        "LeftAnti, BuildRight" in txt and "Broadcast" in txt
    ), txt[:2000]


def test_stratified_sample_is_scan_side_filter(spark):
    """The md5 hash-bucket sample must be a narrow filter next to the
    scan — no exchange, no Python, codegen throughout."""
    from pdf_extract_spark.queries import doc_sample_stratified

    df = doc_sample_stratified(spark, SF)
    txt = plan_of(df)
    body = txt.split("== Physical Plan ==")[-1]
    # the only exchange allowed is the final orderBy's range partitioning
    n_ex = body.count("Exchange ")
    n_range = body.count("Exchange rangepartitioning")
    assert n_ex == n_range, txt[:2000]
    assert "Python" not in body


def test_source_quota_partition_invariant(spark):
    """Hash-priority quota: the retained set must be identical however the
    input is partitioned (first-seen-order quotas are not)."""
    from pdf_extract_spark.functions.text import source_quota_cap

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(r["doc_id"] for r in source_quota_cap(docs, 12).collect())
    b = sorted(
        r["doc_id"]
        for r in source_quota_cap(docs.repartition(13, "doc_id"), 12).collect()
    )
    assert a == b and len(a) > 0


def test_quality_stage_gopher_is_scan_side(spark):
    """quality_stage's Gopher verdict must be a narrow filter (no flag
    frame joined back): exactly ONE semi-join in the plan (the repetition
    verdict restore), and no join whose both sides scan the corpus."""
    from pdf_extract_spark.pipeline import quality_stage

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(quality_stage(docs, min_stopwords=1))
    assert txt.count("LeftSemi") == 1, txt[:2000]


def test_source_quota_window_is_salted(spark):
    """The first (full-corpus) window of source_quota_cap must partition on
    (source, bucket) — never on source alone — so a source holding half the
    corpus can't flow through a single task.  The exact per-source window
    may only run over the phase-1 survivors (≤ buckets×cap per source)."""
    from pdf_extract_spark.functions.text import source_quota_cap

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(source_quota_cap(docs, 12))
    assert len(re.findall(r"\bWindow \[", txt)) == 2, txt[:2000]
    # scan-adjacent exchange (the one feeding the first window) carries the salt
    m = re.findall(r"hashpartitioning\(([^)]*)\)", txt)
    assert m, txt[:2000]
    inner = m[-1]  # plan prints top-down: last hashpartitioning is nearest the scan
    assert "__qb" in inner and "source" in inner, txt[:2000]
    # the unsalted source-only exchange exists exactly once (phase 2)
    unsalted = [g for g in m if "source" in g and "__qb" not in g]
    assert len(unsalted) == 1, m


def test_winnow_is_single_arrow_pass(spark):
    """Winnowing must run inside one mapInArrow stage: no posexplode of
    character positions, no window exchange over (doc_id, pos)."""
    from pdf_extract_spark.queries import doc_winnow_fingerprints

    txt = plan_of(doc_winnow_fingerprints(spark, SF))
    assert "PythonMapInArrow" in txt or "MapInArrow" in txt, txt[:1500]
    assert "Window" not in txt
    assert "Generate" not in txt  # the old char-level explode


def test_decontaminate_eval_side_is_broadcast(spark):
    """The benchmark-gram side of doc_decontaminate must build as the
    broadcast side of the membership join (the verdict never moves the
    corpus), and the gram streams must be codegen — no interpreted
    higher-order lambdas (the r5 gram-build rewrite)."""
    from pdf_extract_spark.queries import doc_decontaminate

    plan = plan_of(doc_decontaminate(spark, SF))
    m = re.search(
        r"BroadcastHashJoin \[h#\d+\], \[h#\d+\], Left(Semi|Outer), BuildRight",
        plan,
    )
    assert m, plan[:2000]
    assert "lambdafunction" not in plan, plan[:2000]


def test_span_dedup_gram_stats_partial_aggregation(spark):
    """doc_span_dedup's gram occurrence counts must map-side combine
    (partial_count before the exchange) so a hot boilerplate gram
    collapses before it can skew a reducer."""
    from pdf_extract_spark.queries import doc_span_dedup

    plan = plan_of(doc_span_dedup(spark, SF))
    assert re.search(r"partial_count|partial_min|HashAggregate.*partial", plan), plan[:2000]


def test_repetition_flags_no_python_udf(spark):
    """doc_repetition_flags is pure JVM expressions — no Python worker in
    the plan."""
    from pdf_extract_spark.queries import doc_repetition_flags

    plan = plan_of(doc_repetition_flags(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_pii_redact_is_scan_side_codegen(spark):
    """PII scrubbing must be a narrow, JVM-only pass: it touches every
    byte of the corpus, so a Python worker or an exchange would be the
    single most expensive mistake in the pipeline."""
    from pdf_extract_spark.functions.text import pii_redact

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = plan_of(pii_redact(docs))
    body = txt.split("== Physical Plan ==")[-1]
    assert "Exchange" not in body, txt[:1500]
    assert "Python" not in body


def test_url_dedup_partial_aggregation(spark):
    """The canonical-URL groupBy must map-side combine before its single
    exchange (hot canonical keys collapse before the shuffle)."""
    from pdf_extract_spark.functions.urls import url_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "concat('http://h.io/', cast(doc_id % 7 as string)) AS url"
    )
    txt = plan_of(url_dedup(docs))
    assert txt.count("HashAggregate") >= 2, txt[:1500]
    assert "Python" not in txt.split("== Physical Plan ==")[-1]


def test_q4_exists_is_equi_semi_join(spark):
    """The EXISTS(non-equi) predicate must compile to a hash/merge SEMI
    join on the extracted equi key (l_orderkey = o_orderkey) with the
    date comparison as a residual — never a nested-loop over the fact
    table."""
    from pdf_extract_spark.queries import q4_order_priority

    txt = plan_of(q4_order_priority(spark, SF))
    assert "LeftSemi" in txt, txt[:1500]
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt


def test_q7_q8_dims_broadcast_no_nested_loop(spark):
    """The double-role nation joins (and region/part/supplier dims) must
    all be broadcast hash joins; only the lineitem->orders->customer
    chain may shuffle.  A nested-loop anywhere means a role-join
    compiled to a cartesian."""
    from pdf_extract_spark.queries import q7_volume_shipping, q8_market_share

    for q in (q7_volume_shipping, q8_market_share):
        txt = plan_of(q(spark, SF))
        assert "BroadcastHashJoin" in txt, txt[:1500]
        assert "CartesianProduct" not in txt
        assert "BroadcastNestedLoopJoin" not in txt


def test_q13_outer_join_preserved(spark):
    """The join-side priority predicate must stay ON the LEFT OUTER join
    (zero-order customers survive with count 0) — if it slid into a
    WHERE the outer join would have collapsed to inner."""
    from pdf_extract_spark.queries import q13_customer_distribution

    txt = plan_of(q13_customer_distribution(spark, SF))
    assert "LeftOuter" in txt, txt[:1500]


def test_q22_recent_orders_is_anti_join(spark):
    """NOT EXISTS(recent order) must compile to a hash LEFT ANTI join on
    the customer key, with the date filter pushed below the join."""
    from pdf_extract_spark.queries import q22_global_sales_opportunity

    df = q22_global_sales_opportunity(spark, SF)
    txt = plan_of(df)
    assert "LeftAnti" in txt, txt[:1500]
    assert "CartesianProduct" not in txt
    ftxt = formatted(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", ftxt)
    assert any("o_orderdate" in g for g in m), m


def test_web_link_extraction_is_jvm_only(spark):
    """Anchor/edge extraction must be pure scan-side codegen — regex
    extraction and URL canonicalization never leave the JVM."""
    from pdf_extract_spark.queries import web_anchor_text, web_link_edges

    for q in (web_link_edges, web_anchor_text):
        txt = plan_of(q(spark, SF))
        assert "BatchEvalPython" not in txt
        assert "ArrowEvalPython" not in txt


def test_web_pagerank_step_plan_shape(spark):
    """One rank iteration must stay JVM-only, never degenerate to a
    cartesian product, carry no corpus-wide single-task window, shuffle
    the contribution join on keys (SortMergeJoin/ShuffledHashJoin — hubs
    are AQE's problem, not a window's), and bring the one-row dangling
    mass in as a broadcast.  (The production loop's localCheckpoint
    collapses the END plan to an ExistingRDD scan, so the gate inspects
    a single un-checkpointed step.)"""
    from pdf_extract_spark.operators.webgraph import SCALE, pagerank_step

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    base = spark.createDataFrame(
        [("a", 2), ("b", 1), ("c", 0)], "node string, outdeg long"
    )
    ranks = base.withColumn("rank", F.lit(SCALE // 3))
    step = pagerank_step(base, e, ranks, teleport=SCALE // 20, n_nodes=3,
                         damping_pct=85)
    txt = plan_of(step)
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt
    assert "CartesianProduct" not in txt
    assert "Window" not in txt
    assert "BroadcastNestedLoopJoin" in txt  # the 1-row dangling crossJoin


def test_boilerpipe_plan_is_jvm_only_one_window(spark):
    """The densitometric classifier must be pure codegen: regex
    segmentation scan-side, exactly ONE doc-keyed window exchange for
    the lag/lead context, and no Python evaluation anywhere."""
    from pdf_extract_spark.queries import html_boilerpipe_blocks

    txt = formatted(html_boilerpipe_blocks(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt
    assert "CartesianProduct" not in txt
    # lag/lead and row_number are two Window nodes (different frames) but
    # must REUSE one url-keyed exchange; the only other exchange allowed
    # is the final presentation orderBy -> exactly 2 in the whole plan
    assert len(re.findall(r"\(\d+\) Exchange", txt)) == 2


def test_fetch_waves_no_megahost_window(spark):
    """The frontier-sized rank must partition by (pid, host) — never by
    host alone, or one mega-host serializes onto a single task.  The
    host-only window may run ONLY over the (partition x host) count
    frame (bounded: P rows per host), which the plan shows as a window
    over the aggregated counts, not the frontier."""
    from pdf_extract_spark.operators.crawl import fetch_waves

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frontier = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".x/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("source").alias("host"),
    )
    txt = plan_of(fetch_waves(frontier))
    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", txt)
    assert wins, txt[:2000]
    frontier_wins = [w for w in wins if "pid" in w]
    host_only_wins = [w for w in wins if "pid" not in w]
    # the row_number over the checkpointed frontier carries pid + the
    # null-safe host key
    assert any("__hk" in w for w in frontier_wins), wins
    # any host-only window is the offset prefix over the count frame,
    # which sits downstream of a HashAggregate, never the raw frontier
    for _ in host_only_wins:
        assert "HashAggregate" in txt


def test_robots_decisions_plan_no_nested_loop_no_python(spark):
    """The frontier->rules join must be an EQUI-join on host with the
    prefix test as a residual — never a nested-loop/cartesian over the
    frontier — and the whole decision plan stays JVM-side."""
    from pdf_extract_spark.operators.robots import (
        parse_robots,
        robots_decisions,
    )

    robots = spark.createDataFrame(
        [("h.test", "User-agent: *\nDisallow: /private\nAllow: /private/ok")],
        "host string, robots_txt string",
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frontier = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".x/"),
                 F.col("doc_id").cast("string")).alias("url")
    )
    txt = plan_of(robots_decisions(parse_robots(robots), frontier, "bot"))
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt
    # the winner is a plain aggregate (map-side combinable struct max),
    # never a per-URL window: the only windows allowed are the robots
    # parser's per-host line-group numbering (bounded by one robots
    # file), keyed (host, ln) — nothing keyed on url
    assert "partial_max" in txt
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", txt):
        assert "url" not in spec, spec


def test_langid_scan_prunes_to_two_columns(spark):
    """Language ID must push column pruning to the parquet reader: only
    (doc_id, text) read, none of the other document columns."""
    from pdf_extract_spark.functions.langid import identify_language

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    txt = formatted(identify_language(docs))
    m = re.search(r"ReadSchema: ([^\n]*)", txt)
    assert m is not None
    assert "doc_id" in m.group(1) and "text" in m.group(1)
    assert "lang" not in m.group(1).replace("lang_pred", "")
    assert "n_chars" not in m.group(1)
    assert "source" not in m.group(1)


def test_funnel_steps_no_window_no_python(spark):
    """The ordered funnel must be the join-chain-of-min-aggregates plan:
    per-user min aggs joined on user_id — never a per-user event window
    (corpus-sized sort) and never a Python UDF."""
    from pdf_extract_spark.queries import events_funnel_steps

    txt = plan_of(events_funnel_steps(spark, SF))
    assert "Window" not in txt
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt
    assert "partial_min" in txt  # map-side combine on every step agg


def test_value_extremes_stats_broadcast(spark):
    """The per-type stats frame (5 rows) must broadcast back over the
    scan, and the only window is keyed by event_type (bounded fanout),
    never unpartitioned."""
    from pdf_extract_spark.queries import events_value_extremes

    txt = plan_of(events_value_extremes(spark, SF))
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", txt):
        assert "event_type" in spec, spec


def test_cohort_retention_no_window(spark):
    """Cohort retention is two aggregates and one join — integer day
    arithmetic, no windows, no Python."""
    from pdf_extract_spark.queries import events_cohort_retention

    txt = plan_of(events_cohort_retention(spark, SF))
    assert "Window" not in txt
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt


def test_interleave_family_jvm_only_doc_windows(spark):
    """The interleave alignment family must stay whole-stage codegen
    (no Python) and every window must be keyed by doc_id — the widest
    partition is one document's span list, never the corpus."""
    from pdf_extract_spark.queries import (
        spans_interleave_stats,
        spans_media_captions,
    )

    for q in (spans_media_captions, spans_interleave_stats):
        txt = plan_of(q(spark, SF))
        assert "BatchEvalPython" not in txt
        assert "ArrowEvalPython" not in txt
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", txt):
            assert "doc_id" in spec, spec


def test_pack_interleaved_partition_invariant(spark):
    """The multimodal pack manifest must not depend on where the
    range-partition cuts fall (the two-phase prefix sum contract)."""
    from pdf_extract_spark.operators.interleave import (
        pack_interleaved,
        synth_interleaved,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    spans = synth_interleaved(docs)
    a = pack_interleaved(spans, 128, 64, num_parts=2)
    b = pack_interleaved(spans, 128, 64, num_parts=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_source_token_quota_partition_invariant_and_grouped(spark):
    """The token-budget quota must be invariant to where the range
    cuts fall, and its corpus-facing window must carry (pid, __sk) —
    never a bare per-source partition that serializes a mega-source."""
    from pdf_extract_spark.functions.text import source_token_quota

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, source_token_quota(docs, 2000, num_parts=3).collect()))
    b = sorted(map(tuple, source_token_quota(docs, 2000, num_parts=11).collect()))
    assert a == b
    txt = plan_of(source_token_quota(docs, 2000))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", txt):
        assert ("pid" in spec) or ("ptok" in spec or "pcnt" in spec), spec


def test_vocab_coverage_partition_invariant_and_pid_windows(spark):
    """The coverage curve must not depend on where the range cuts fall,
    and the histogram-facing windows must carry pid (the two-phase
    prefix) — the only non-pid window is the P-row offsets frame."""
    from pdf_extract_spark.functions.text import vocab_coverage

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, vocab_coverage(docs, num_parts=2).collect()))
    b = sorted(map(tuple, vocab_coverage(docs, num_parts=9).collect()))
    assert a == b
    # curve is monotone and ends at full coverage once K >= vocab
    ppm = [r[3] for r in a]
    assert ppm == sorted(ppm)
