"""Benchmark harness: runs the headline queries + the extraction pipeline
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall time over the headline set (lower is better).
The extraction benchmark replicates the deterministic fixture corpus so
that extraction work scales with sf (sf0.1 -> ~4800 docs).

Scaling-efficiency evidence (local[8] vs local[32]) is produced separately
by tools/bench_scaling.py and reported in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "q1_pricing_summary",
    "q3_top_urgent_revenue",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q10_returned_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # partsupp-derived TPC-H tail (the derived relation is built inside
    # each query; q2/q11/q16/q20 time the dim-broadcast plans, q9 the
    # profit join over the widest fact chain)
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_potential_promotion",
    # event analytics wave: ordered funnel (min-agg join chain), weekly
    # cohorts (integer day arithmetic), integer-exact outlier ranking,
    # and hybrid lexical+semantic RRF fusion over bounded top-k lists
    "events_funnel_steps",
    "events_funnel_windowed",
    "events_cohort_retention",
    "events_value_extremes",
    "doc_hybrid_rrf",
    # interleaved text+media alignment family: synthetic stream caption
    # mining + profile (doc-keyed windows only) and multimodal packing
    # through the two-phase prefix sum with a per-media patch budget
    "spans_media_captions",
    "spans_interleave_stats",
    "spans_pack_interleaved",
    # the composed multimodal funnel (stats -> captions -> gate -> pack)
    "interleaved_funnel",
    "events_value_percentiles",
    "events_distinct_users_hll",
    "events_value_quantile_sketch",
    "corpus_term_cm_freq",
    "nation_balance_full_outer",
    "custkeys_urgent_and_returned",
    "events_moving_avg",
    "events_json_props",
    "corpus_top_terms",
    "doc_bm25_topk",
    "doc_index_hot_terms",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "top3_orders_per_customer",
    "events_sessionize",
    "events_hourly_rollup",
    "events_asof_orders",
    "lineitem_rollup",
    "lineitem_cube",
    "orders_pivot_priority",
    "doc_stats",
    "doc_quality_filter",
    "doc_sample_stratified",
    "doc_mix_temperature",
    "doc_chunk_sliding",
    "doc_source_quota",
    "doc_source_token_quota",
    "corpus_summary_stats",
    "corpus_card",
    "doc_vocab_coverage",
    "doc_repetition_flags",
    "doc_span_dedup",
    "doc_span_dedup_apply",
    "doc_decontaminate",
    "doc_decontaminate_bloom",
    "doc_holdout_split",
    "doc_decontaminate_fuzzy",
    "doc_mix_epochs",
    "doc_pii_redact",
    "doc_blocklist",
    "doc_url_dedup",
    "doc_token_bpe",
    "doc_winnow_fingerprints",
    "doc_shuffle_shards",
    "doc_lm_perplexity",
    "doc_lm_trigram",
    "doc_ppl_buckets",
    "doc_pack_sequences",
    "doc_quality_classifier",
    "doc_dsir_weights",
    "doc_dsir_select",
    "semantic_dedup",
    "doc_classifier_topk",
    # bpe_merges covers the BPE family in the bench; doc_bpe_tokens shares
    # the same 12-round training loop at construction (it would re-train
    # per timed invocation, doubling the loop cost without new signal) and
    # stays correctness-gated via its oracle row instead
    "bpe_merges",
    # unigram-LM sibling: substring seed + 2 EM rounds, every job
    # vocabulary-sized, corpus scanned once (functions/unigram.py)
    "unigram_vocab",
    "media_dhash",
    "media_dhash_near_dup",
    "media_audio_fp",
    "media_audio_near_dup",
    "warc_records_meta",
    "wet_text_docs",
    "wat_link_edges",
    "warc_html_spans",
    "dedup_exact",
    "minhash_lsh_candidates",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "spans_explode",
    "ann_cosine_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "html_main_content",
    # web link-graph family: edges/anchor-text are scan-side extraction;
    # pagerank times the 10-iteration fixed-point join loop (the corpus is
    # the fixed fixture graph, so this measures per-iteration scheduling
    # + join cost, the quantity that scales with iteration count)
    "web_link_edges",
    "web_anchor_text",
    "web_pagerank",
    # hits adds the L1-normalize half-steps (two one-row broadcast
    # aggregates per iteration) on top of pagerank's join loop
    "web_hits",
    # the declarative boilerplate classifier: regex segmentation +
    # one window shuffle, the zero-Python HTML strip path
    "html_boilerpipe_blocks",
    # politeness scheduler: grouped two-phase prefix rank over the
    # synthetic frontier (checkpoint + two bounded broadcasts)
    "web_fetch_waves",
    # crawl-policy layer: robots parse + agent selection + longest-match
    # decisions over the link-graph frontier, and the composed
    # robots->waves schedule (the full WHAT+WHEN crawl gate)
    "web_robots_allowed",
    "web_crawl_frontier",
    # host projection + the shared fixed-point kernel on the 4-5-orders
    # smaller domain graph, and the sitemap/graph discovery merge
    "web_host_pagerank",
    "web_host_communities",
    "web_host_triangles",
    "web_host_components",
    "web_discovery_frontier",
    # delay-timed schedule (one more bounded join over the frontier) and
    # pointer-jumping redirect resolution (log2(max_hops) self-joins)
    "web_fetch_schedule",
    "web_redirect_resolution",
    "web_wave_profile",
    "web_snapshot_diff",
    # scan-side language ID over documents: pure codegen, zero shuffle —
    # times the per-row profile-scoring projection at corpus scale
    "doc_langid",
]


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def extraction_replicas(sf: float) -> int:
    # sf0.1 -> 300 replicas x 16 fixtures = 4800 docs
    return max(1, int(sf * 3000))


def _spin_control() -> float:
    """Single-thread busy-loop timed at a fixed work size: a host-steal
    indicator.  On an idle host this is ~constant; inflation between the
    start and end samples means another tenant stole CPU mid-run, and the
    absolute level calibrates cross-round comparisons (r3's 'extraction
    regression' turned out to be unconfirmable because no such control was
    recorded)."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 3)


def _spin_worker(_):
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    return time.perf_counter() - t0


def _spin_control_parallel(k: int = 8) -> float:
    """MANY-CORE steal indicator: mean per-task time of k concurrent
    busy-loops.  The single-thread control under-reports contention when
    other tenants load most-but-not-all cores (observed: scalar spin 0.34
    — clean — while a 32-way spin averaged 0.99 vs the ~0.30 idle
    reference, i.e. the host was effectively ~1/3 of its cores); this
    control makes that visible in the recorded evidence."""
    import multiprocessing as mp

    with mp.Pool(k) as p:
        times = p.map(_spin_worker, range(k))
    return round(sum(times) / len(times), 3)


def _unpersist_all(spark) -> None:
    """Unpersist every lingering cached/localCheckpointed RDD — called
    OUTSIDE the timed regions.  Several operators lazily localCheckpoint
    narrow frames (classifier ranks, pack prefix sums, BPE rounds);
    across a 70+ query bench those blocks pile up and the accumulated
    heap pressure taxes later entries (extraction sampled 1,195 vs
    1,570 docs/s on the identical kernel before this hygiene).  Each
    query's OWN timing still pays its own checkpoint cost."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            try:
                jrdd.unpersist(False)
            except Exception:
                pass
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    spin_start = _spin_control()
    spin_par_start = _spin_control_parallel(cpus)

    from pdf_extract_spark.operators.extraction import extract_documents
    from pdf_extract_spark.plans.session import get_spark
    from pdf_extract_spark.queries import QUERIES
    from pdf_extract_spark.sources.raw_docs import synthetic_corpus_df

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    timings: dict[str, float] = {}

    # Warm-up (untimed): r1 measured q1 at 14.6s vs 1.1s for q6 on the same
    # table — JVM/codegen/Arrow/python-worker init, not plan cost.  Touch
    # every runtime surface once so the timed loop measures steady state:
    # parquet scan + agg (q1), and a python-worker mapInPandas round trip.
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    warm = synthetic_corpus_df(spark, 64)
    extract_documents(warm, num_partitions=cpus).count()

    # Throughput metrics run FIRST (right after warm-up): extraction is
    # the north-star number, and measuring it after 75 queries' worth of
    # session state (checkpoint blocks, codegen cache churn, GC debt)
    # taxed it ~25% in the r5 wave-3 record even with per-query
    # unpersist hygiene.  Order disclosed in BASELINE.md.
    # extraction throughput: deterministic mixed corpus (5% multi-page
    # docs for skew), generated executor-side, scaled by sf.  min-of-3
    # with EVERY sample recorded: the host suffers intermittent multi-x
    # CPU steal, and per-sample spread (plus the spin control) is the
    # evidence that separates a real regression from a stolen window.
    n_target = extraction_replicas(sf) * 16
    raw = synthetic_corpus_df(spark, n_target, pct_large=0.05).cache()
    n_docs = raw.count()  # materialize input outside the timed region
    # TWO untimed full-size warmup passes: moving this stage before the
    # query loop (r5) stripped the JVM/Arrow/python-worker warmup those
    # queries used to provide, and the clean-window number fell
    # 1,517->1,194 docs/s with no kernel change — the 64-doc warmup above
    # touches the code path but not the full-parallelism task set,
    # codegen, or Arrow batch sizes.  Measured plateau: rep0 1,011 ->
    # rep1 1,655 -> rep2+ ~1,800-1,900 docs/s on the identical kernel,
    # so one pass still under-measures JIT steady state.
    for _ in range(2):
        extract_documents(raw, num_partitions=cpus).groupBy().sum(
            "n_spans", "decode_failures"
        ).collect()
    extract_samples = []
    # num_partitions = cpus (the operator's own default), NOT cpus*2: the
    # normal+giant split fans out to 5x num_partitions tasks total, and at
    # this corpus size the 2x override made tasks so small that per-task
    # Arrow/python-worker overhead dominated (measured: 2,254 docs/s at
    # cpus vs ~1,650 at cpus*2 on the same warmed kernel)
    for _ in range(3):
        t0 = time.perf_counter()
        out = extract_documents(raw, num_partitions=cpus)
        agg = out.groupBy().sum("n_spans", "decode_failures").collect()[0]
        extract_samples.append(round(time.perf_counter() - t0, 3))
    dt = min(extract_samples)
    timings["extract_pdf_spans"] = dt
    docs_per_sec = round(n_docs / dt, 1)
    spans_per_sec = round((agg[0] or 0) / dt, 1)
    raw.unpersist()

    # HTML boilerplate-strip throughput (the north rule's HTML half):
    # deterministic executor-side corpus, same scale rule as the PDF bench
    from pdf_extract_spark.html_main import extract_main_content
    from pdf_extract_spark.sources.raw_docs import synthetic_html_corpus_df

    html_raw = synthetic_html_corpus_df(spark, n_target).cache()
    n_html = html_raw.count()
    # same untimed full-size warmup + partitions=cpus rationale as the
    # PDF stage above (measured: 6,342 docs/s at cpus vs 4,443 at cpus*2)
    for _ in range(2):
        extract_main_content(html_raw, num_partitions=cpus).groupBy().sum(
            "n_spans"
        ).collect()
    html_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        hagg = (
            extract_main_content(html_raw, num_partitions=cpus)
            .groupBy().sum("n_spans").collect()[0]
        )
        html_samples.append(round(time.perf_counter() - t0, 3))
    hdt = min(html_samples)
    timings["extract_html_main"] = hdt
    html_docs_per_sec = round(n_html / hdt, 1)
    html_spans_per_sec = round((hagg[0] or 0) / hdt, 1)
    html_raw.unpersist()

    # headline relational/dedup/similarity queries — each timed TWICE and
    # reported as the min: the sandbox VM suffers intermittent CPU steal
    # (observed 2-10x swings between consecutive minutes), and min-of-2
    # recovers the steady-state plan cost the number is meant to measure
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        _unpersist_all(spark)

    # Forced-evaluation pass: count() lets Catalyst prune columns (and
    # even eliminate a left join against a provably-unique aggregate),
    # so for a few queries the count() number under-measures the real
    # work (r5 found doc_decontaminate at 0.27s counted vs 18s forced,
    # pre-optimization).  This pass forces every output column through
    # an xxhash64 aggregate — full computation, no driver transfer.
    # `queries` stays count()-based for round-over-round comparability;
    # `queries_forced` is the honest total-work number.
    timings_forced: dict[str, float] = {}
    forced_fallbacks: list[str] = []
    from pyspark.sql import functions as _F

    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            try:
                # bit_xor, not sum: summing 64-bit hashes overflows
                # under ANSI mode; columns backtick-quoted
                cols = ", ".join(f"`{c}`" for c in df.columns)
                df.agg(_F.expr(f"bit_xor(xxhash64({cols}))")).collect()
            except Exception:
                # recorded: a fallback timing is count()-pruned, NOT a
                # forced number — don't let it masquerade as one
                if name not in forced_fallbacks:
                    forced_fallbacks.append(name)
                df.count()
            best = min(best, time.perf_counter() - t0)
        timings_forced[name] = round(best, 3)
        _unpersist_all(spark)


    # composed corpus pipeline (quality -> exact -> near-dup CC ->
    # decontaminate), timed end-to-end as a MACRO metric: it re-runs work
    # the per-operator entries already measure, so it is reported beside
    # the headline total rather than inside it
    t0 = time.perf_counter()
    funnel = {
        r["stage"]: r["n_docs"]
        for r in QUERIES["corpus_funnel"](spark, sf_dir).collect()
    }
    corpus_pipeline_sec = round(time.perf_counter() - t0, 3)
    # the pipeline query caches its stage frames internally; drop them so
    # the macro metric leaves no cached partitions behind
    spark.catalog.clearCache()

    # BPE training at 100 merges — the production-vocab viability probe
    # for the incremental pair-count loop (a MACRO metric like the corpus
    # pipeline: the 12-merge bpe_merges entry already times the operator,
    # this measures how per-round cost scales with round count)
    from pdf_extract_spark.functions.bpe import bpe_train
    from pdf_extract_spark.queries import load as _load

    _bpe_docs = _load(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    _bpe_df, _bpe_rules = bpe_train(_bpe_docs, 100)
    _bpe_df.count()
    bpe100_sec = round(time.perf_counter() - t0, 3)
    bpe100_rounds = len(_bpe_rules)
    _unpersist_all(spark)

    total = round(sum(timings.values()), 3)
    spin_end = _spin_control()
    spin_par_end = _spin_control_parallel(cpus)
    full = {
        "metric": "headline_queries_plus_extraction_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_forced": timings_forced,
        "queries_forced_fallback": forced_fallbacks,
        "sf": sf,
        "extract_docs": n_docs,
        "extract_docs_per_sec": docs_per_sec,
        "extract_spans_per_sec": spans_per_sec,
        "html_docs": n_html,
        "html_docs_per_sec": html_docs_per_sec,
        "html_spans_per_sec": html_spans_per_sec,
        "extract_samples_sec": extract_samples,
        "html_samples_sec": html_samples,
        "corpus_pipeline_sec": corpus_pipeline_sec,
        "corpus_funnel": funnel,
        "bpe_train_100_sec": bpe100_sec,
        "bpe_train_100_rounds": bpe100_rounds,
        "bpe_train_sec_per_round": round(bpe100_sec / max(1, bpe100_rounds), 3),
        "spin_control_sec": {"start": spin_start, "end": spin_end},
        "spin_parallel_sec": {"start": spin_par_start, "end": spin_par_end},
        "cpus": cpus,
    }
    # full record first (for archives/humans), then a COMPACT summary as
    # the very LAST line: the driver keeps only a ~2 KB tail of stdout, so
    # r5's single full-dict line lost its head and parsed as null.  The
    # compact line carries the headline metric, throughputs, and both
    # steal controls, and always fits inside the kept tail.
    print(json.dumps(full))
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_extraction_wall_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "queries": {"total_sec": total, "n": len(timings)},
                "extract_docs_per_sec": docs_per_sec,
                "extract_spans_per_sec": spans_per_sec,
                "extract_samples_sec": extract_samples,
                "html_docs_per_sec": html_docs_per_sec,
                "corpus_pipeline_sec": corpus_pipeline_sec,
                "bpe_train_100_sec": bpe100_sec,
                "spin_control_sec": {"start": spin_start, "end": spin_end},
                "spin_parallel_sec": {
                    "start": spin_par_start,
                    "end": spin_par_end,
                },
                "cpus": cpus,
                "full_record": "preceding line",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
