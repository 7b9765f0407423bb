"""End-to-end training-corpus construction pipeline.

Composes the engine's document operators into the standard LLM-data flow
(the pipeline a user of the reference engine would assemble around its
extraction output — extraction itself is jobs/extract_job.py; this stage
consumes the resulting documents table):

    ingest -> quality filters -> exact dedup -> near-dup dedup
           -> decontamination -> quota/sampling -> corpus report

Stage order is cost-ordered for 100 TB: the narrow, codegen-only quality
filter runs first and prunes the corpus BEFORE anything shuffles; exact
dedup (one fingerprint shuffle) runs before MinHash (shingle explode);
near-dup clustering only sees the exact-dedup survivors; decontamination
broadcasts the benchmark grams against the already-shrunk corpus.  Every
stage is expressed on DataFrames — the corpus itself never transits the
driver.  Two steps do run bounded driver-side work at CONSTRUCTION time
(not first-action time): the iterative connected-components rounds
execute eagerly (checkpoints per round, operators/graph.py), and — only
when `mix_budget` is set — temperature_mix collects the tiny per-source
count table (one row per source, over the already-cached survivors) to
derive exact integer keep thresholds.  Callers scheduling around the
build should expect `corpus_pipeline(...)` to do the dedup work up
front; the returned frames are cheap to act on.

Returned stage frames share one cached spine (the quality survivors), so
counting the funnel costs one scan of the cache per stage, not a re-run
of upstream stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import (
    decontaminate,
    fingerprint,
    gopher_keep_expr,
    pii_redact_expr,
    repetition_signals,
    source_quota_cap,
    stratified_sample,
)
from .operators.dedup import minhash_lsh_candidates
from .operators.graph import connected_components


def quality_stage(docs: DataFrame, text_col: str = "text",
                  min_stopwords: int = 2) -> DataFrame:
    """Gopher rule-chain + repetition filter.  The Gopher verdict is a
    pure codegen predicate applied as a narrow scan-side filter (no flag
    frame, no join), so the repetition signals' gram explodes — the
    stage's only wide work — run over Gopher survivors, not the raw
    corpus.  Repetition verdicts are per-doc (duplicate-gram fractions
    within the doc), so pre-filtering the input cannot change any
    surviving doc's verdict.  Total stage cost: one gram shuffle pair plus
    one semi-join to restore doc rows.  `min_stopwords` tunes the
    English-stopword rule for corpora whose register lacks function words
    (e.g. code/log corpora)."""
    gq = docs.filter(gopher_keep_expr(text_col, min_stopwords=min_stopwords))
    keep_r = repetition_signals(gq, text_col).filter("keep").select("doc_id")
    return gq.join(keep_r, "doc_id", "left_semi")


def exact_dedup_stage(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one canonical (min doc_id) per normalized-content fingerprint.
    One md5-key shuffle with map-side combine, then a semi-join on
    (fp, doc_id) — identical mirrors collapse before any gram explode."""
    with_fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    canon = with_fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    return (
        with_fp.join(canon, ["__fp", "doc_id"], "left_semi").drop("__fp")
    )


def near_dedup_stage(
    docs: DataFrame,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs -> connected components -> keep each
    cluster's canonical (min doc_id).  Components converge in O(log d)
    pointer-jumping rounds with checkpointed lineage; docs outside any
    pair are their own cluster and always survive."""
    pairs = minhash_lsh_candidates(docs, text_col=text_col)
    comp = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    # canonical member per cluster; non-members are implicit singletons
    canon = comp.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    drop = comp.join(canon, ["cluster_id", "doc_id"], "left_anti").select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


def corpus_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    eval_pct: int = 3,
    quota_cap: int | None = None,
    sample_rates: dict[str, int] | None = None,
    sample_default_pct: int = 100,
    min_stopwords: int = 2,
    checkpoint_dir: str | None = None,
    redact_pii: bool = False,
    fuzzy_decontaminate: bool = False,
    token_quota: int | None = None,
    mix_budget: int | None = None,
    mix_temperature: float = 0.5,
    mix_key: str = "source",
    embeddings: DataFrame | None = None,
    semdedup_eps: float = 0.7,
    semdedup_centroids: int = 16,
) -> dict[str, DataFrame]:
    """Run the full corpus-construction flow; returns the stage frames
    keyed by stage name (each a filter of the previous — count them for
    the funnel report, write `final`).

    `eval_pct`: the deterministic md5-bucket slice held out as the
    benchmark proxy for decontamination (in production, pass the real
    benchmark corpus through `functions.text.decontaminate` directly).
    `quota_cap` / `sample_rates`: optional anti-domination cap and
    per-source mixing percentages (100 = keep all).  `mix_budget`
    (optional) applies temperature-weighted mixing instead/in addition:
    sample toward ~mix_budget docs with per-`mix_key` rates
    proportional to n^mix_temperature / n (functions.text
    .temperature_mix — exact integer ppm thresholds, scan-side; derives
    them from a bounded one-row-per-source collect, so setting this
    makes pipeline CONSTRUCTION run the upstream stages).  `redact_pii`
    rewrites the final stage's text through `pii_redact` (a narrow
    scan-side pass — the standard pre-release scrub); doc counts are
    unchanged, so the funnel stays comparable either way.

    `fuzzy_decontaminate` adds the MinHash-band near-dup decontamination
    pass (operators/dedup.py:fuzzy_decontaminate) after the exact 8-gram
    pass, against the SAME eval slice — catching paraphrased leaks; its
    stage appears in the funnel as `fuzzy_decontaminated`.  `token_quota`
    (optional) caps each source at a TOKEN budget after the doc-count
    quota (functions/text.py:source_token_quota, grouped two-phase
    prefix — the budget a trainer actually consumes).

    `embeddings` (optional, (vec_id, embedding) keyed by doc_id) enables
    the SemDeDup stage after lexical near-dup: paraphrase-level
    duplicates that share no n-grams are pruned by
    `operators.semdedup.semantic_dedup` at cos >= 1 - semdedup_eps.  The
    stage is one anti-join against the pruned-id set (small — only
    duplicates — so AQE broadcasts it); docs without an embedding row
    are untouched (no evidence, no drop)."""
    stages: dict[str, DataFrame] = {"ingested": docs}

    # degenerate-source defense: a corpus that arrives in fewer splits
    # than the cluster has slots (single file, giant row groups) would
    # run every narrow stage on those few cores.  At real scale
    # spark.sql.files.maxPartitionBytes already yields many splits and
    # this is a no-op; the check costs no job.
    spark = docs.sparkSession
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)

    quality = quality_stage(docs, text_col, min_stopwords=min_stopwords).cache()
    stages["quality"] = quality

    # cache: consumed by the near-dup candidate generation, the near
    # anti-join, and the funnel count (MEMORY_AND_DISK — spills at corpus
    # scale rather than failing)
    exact = exact_dedup_stage(quality, text_col).cache()
    stages["exact_dedup"] = exact

    # cache: the near-dup survivors feed decontamination, the final mix,
    # AND the funnel counts — without this the MinHash + connected
    # components iteration re-runs once per downstream consumer
    near = near_dedup_stage(exact, text_col, checkpoint_dir=checkpoint_dir).cache()
    stages["near_dedup"] = near

    spine = near
    if embeddings is not None:
        from .operators.semdedup import semantic_dedup

        dropped = (
            semantic_dedup(
                embeddings, eps=semdedup_eps, n_centroids=semdedup_centroids
            )
            .filter(~F.col("keep"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        # cache: feeds decontamination, the final mix, and the funnel
        spine = near.join(dropped, "doc_id", "left_anti").cache()
        stages["semantic_dedup"] = spine

    verdicts = decontaminate(spine, text_col, eval_pct=eval_pct)
    # cache: counted for the funnel AND re-read by the quota/sample stage
    # and the final sink — the gram explode + semi-join is the pipeline's
    # second-most-expensive recompute
    clean = spine.join(
        verdicts.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    ).cache()
    stages["decontaminated"] = clean

    if fuzzy_decontaminate:
        from .operators.dedup import fuzzy_decontaminate as _fuzzy

        fz = _fuzzy(spine, text_col, eval_pct=eval_pct)
        clean = clean.join(
            fz.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_semi",
        ).cache()
        stages["fuzzy_decontaminated"] = clean

    mixed = clean
    if quota_cap is not None:
        mixed = source_quota_cap(mixed, cap=quota_cap)
    if sample_rates is not None or sample_default_pct < 100:
        mixed = stratified_sample(
            mixed, rates=sample_rates or {}, default_pct=sample_default_pct
        )
    if token_quota is not None:
        from .functions.text import source_token_quota

        keep_ids = (
            source_token_quota(mixed, cap_tokens=token_quota)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        mixed = mixed.join(keep_ids, "doc_id", "left_semi")
    if mix_budget is not None:
        from .functions.text import temperature_mix

        mixed = temperature_mix(
            mixed, budget=mix_budget, temperature=mix_temperature,
            key_col=mix_key,
        )
    if redact_pii:
        # narrow in-place column rewrite — no join, no shuffle
        mixed = mixed.withColumn(text_col, pii_redact_expr(F.col(text_col)))
    stages["final"] = mixed
    return stages


def funnel_frame(stages: dict[str, DataFrame]) -> DataFrame:
    """The per-stage counts as ONE DataFrame (stage_idx, stage, n_docs):
    tagged single-row aggregates unioned together, so materializing the
    whole funnel costs one Spark job (scanning each cached spine once)
    instead of one job per stage.  Shared by funnel_report and the
    corpus_funnel oracle query so the two can never drift."""
    import functools

    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_docs",
        )
        for i, (name, df) in enumerate(stages.items())
    ]
    return functools.reduce(DataFrame.unionByName, parts).orderBy("stage_idx")


def funnel_report(stages: dict[str, DataFrame]) -> list[tuple[str, int]]:
    """Count every stage frame in ONE Spark job — the per-run health table
    a 100 TB pipeline publishes so drops are attributable to a stage, not
    discovered at training time."""
    return [
        (r["stage"], r["n_docs"]) for r in funnel_frame(stages).collect()
    ]


def release_stages(stages: dict[str, DataFrame]) -> None:
    """Unpersist every stage frame corpus_pipeline cached.  Call when the
    funnel has been reported and `final` written: a long-lived session
    (oracle/bench harnesses, notebooks) otherwise accumulates cached
    partitions across pipeline invocations until LRU eviction."""
    for df in stages.values():
        if df.is_cached:
            df.unpersist()
