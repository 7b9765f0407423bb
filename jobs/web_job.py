"""Web-curation job — spark-submit entry composing the crawl half of
the pipeline end to end: raw HTML pages in, boilerplate-stripped
content blocks, the link graph, and both link-analysis scores out.

Stages (each written under --output):
  blocks/     densitometric block classification (Kohlschuetter rules,
              operators/boilerpipe.py) — every block with its features
              and content/boilerplate label, so downstream consumers can
              re-threshold without re-parsing
  content/    per-page main text: the content-labelled blocks joined in
              document order (the corpus a training pipeline ingests)
  edges/      distinct (src, dst, n_anchors) from anchor extraction with
              canonicalized endpoints (operators/webgraph.py)
  pagerank/   10-iteration fixed-point PageRank (rank_e12)
  hits/       10-iteration fixed-point HITS (hub_e9, auth_e9)
  metrics/    one row per stage: row counts + content/boilerplate split
              + graph size, keyed by --run-id — the lineage row a
              scheduler checks before re-running

Usage (local sandbox):
    python tools/package_pyfiles.py   # builds dist/pdf_extract_spark.zip
    spark-submit --master local[8] \
        --py-files dist/pdf_extract_spark.zip \
        jobs/web_job.py --input pages.parquet --output /tmp/web_out
    # or --input fixture  (the deterministic 24-page HTML corpus)

The input is (url, html); every stage reads only written artifacts of
the previous ones (blocks -> content; edges -> pagerank/hits), so a
re-run after a partial failure recomputes nothing upstream.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="pages parquet (url, html) or 'fixture'")
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default=f"run-{int(time.time())}")
    p.add_argument("--iterations", type=int, default=10)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_extract_spark.operators.boilerpipe import densitometric_blocks
    from pdf_extract_spark.operators.webgraph import (
        edge_list,
        extract_links,
        hits_fixed_point,
        pagerank_fixed_point,
    )

    spark = SparkSession.builder.appName("pdf_extract_spark.web").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input == "fixture":
        # the materialized URL-bearing corpus (doc_id, url, html) the
        # oracles read — same bytes as tools/gen_html_corpus.py
        import os

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pages = spark.read.parquet(
            os.path.join(here, "dist", "html_corpus.parquet")
        ).select("url", "html")
    else:
        pages = spark.read.parquet(args.input).select("url", "html")

    blocks = densitometric_blocks(pages)
    blocks.write.mode("overwrite").parquet(f"{args.output}/blocks")
    b = spark.read.parquet(f"{args.output}/blocks")
    content = (
        b.filter(F.col("label") == "content")
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_ord", "text"))
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("content_text"),
            F.count(F.lit(1)).cast("long").alias("n_content_blocks"),
            F.sum("words").cast("long").alias("n_content_words"),
        )
    )
    content.write.mode("overwrite").parquet(f"{args.output}/content")

    edges = edge_list(extract_links(pages))
    edges.write.mode("overwrite").parquet(f"{args.output}/edges")
    e = spark.read.parquet(f"{args.output}/edges")
    pagerank_fixed_point(e, iterations=args.iterations).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/pagerank")
    hits_fixed_point(e, iterations=args.iterations).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/hits")

    def stat(name, df, extra=0):
        return {"run_id": args.run_id, "stage": name,
                "n_rows": df.count(), "n_extra": extra}

    n_content = b.filter(F.col("label") == "content").count()
    metrics = [
        stat("blocks", b, extra=n_content),
        stat("content", spark.read.parquet(f"{args.output}/content")),
        stat("edges", e),
        stat("pagerank", spark.read.parquet(f"{args.output}/pagerank")),
        stat("hits", spark.read.parquet(f"{args.output}/hits")),
    ]
    spark.createDataFrame(
        metrics, "run_id string, stage string, n_rows long, n_extra long"
    ).write.mode("overwrite").parquet(f"{args.output}/metrics")
    for m in metrics:
        print(f"[web_job] {m['stage']}: rows={m['n_rows']} extra={m['n_extra']}")
    spark.stop()


if __name__ == "__main__":
    main()
