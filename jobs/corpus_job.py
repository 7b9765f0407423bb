"""Corpus-construction job — spark-submit entry for the full training-data
flow over a documents table (quality -> exact dedup -> near-dup dedup ->
decontamination -> quota/sampling), with a per-stage funnel report.

Usage (local sandbox):
    python tools/package_pyfiles.py   # builds dist/pdf_extract_spark.zip
    spark-submit --master local[8] \
        --py-files dist/pdf_extract_spark.zip \
        jobs/corpus_job.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/corpus_out --run-id run1 [--quota-cap N] \
        [--sample-pct P] [--checkpoint-dir DIR]

Upstream of this job sits jobs/extract_job.py (raw PDF/HTML bytes ->
unified spans -> documents); this job takes the documents table from
there (or any parquet with doc_id/text/lang/source) and emits the final
mixed corpus plus the funnel table that makes every stage's drop count
auditable.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default=f"run-{int(time.time())}")
    p.add_argument("--eval-pct", type=int, default=3)
    p.add_argument("--min-stopwords", type=int, default=2,
                   help="Gopher stopword rule threshold (lower for corpora "
                        "whose register lacks English function words)")
    p.add_argument("--quota-cap", type=int, default=None)
    p.add_argument("--sample-pct", type=int, default=100,
                   help="default per-source keep percentage (100 = all)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="reliable checkpoint dir for connected components "
                        "(recommended on a real cluster)")
    p.add_argument("--mix-budget", type=int, default=None,
                   help="temperature-weighted mixing target doc count")
    p.add_argument("--mix-temperature", type=float, default=0.5)
    p.add_argument("--fuzzy-decontaminate", action="store_true",
                   help="additionally drop MinHash-band near-dups of the "
                        "eval slice (paraphrased leaks)")
    p.add_argument("--token-quota", type=int, default=None,
                   help="per-source TOKEN budget cap (grouped two-phase "
                        "prefix; the crossing doc is the last kept)")
    p.add_argument("--redact-pii", action="store_true",
                   help="scrub emails/IPs/phones from the final corpus "
                        "(narrow scan-side rewrite)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from pdf_extract_spark.pipeline import corpus_pipeline, funnel_report, release_stages

    spark = SparkSession.builder.appName("pdf_extract_spark.corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    stages = corpus_pipeline(
        docs,
        eval_pct=args.eval_pct,
        min_stopwords=args.min_stopwords,
        quota_cap=args.quota_cap,
        sample_default_pct=args.sample_pct,
        checkpoint_dir=args.checkpoint_dir,
        redact_pii=args.redact_pii,
        fuzzy_decontaminate=args.fuzzy_decontaminate,
        token_quota=args.token_quota,
        mix_budget=args.mix_budget,
        mix_temperature=args.mix_temperature,
    )

    stages["final"].write.mode("overwrite").parquet(f"{args.output}/corpus")

    funnel = funnel_report(stages)
    spark.createDataFrame(
        [(args.run_id, i, name, n) for i, (name, n) in enumerate(funnel)],
        "run_id string, stage_idx int, stage string, n_docs long",
    ).coalesce(1).write.mode("append").parquet(f"{args.output}/funnel")

    release_stages(stages)

    for name, n in funnel:
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
