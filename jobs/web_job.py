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
  hostrank/   PageRank over the host-level projection of the graph —
              the domain-quality signal (host_edges drops intra-host
              navigation first)
  frontier/   the crawl gate: every graph node (src ∪ dst) run through
              robots_decisions for --agent, the allowed URLs fanned
              into politeness fetch waves (operators/robots.py +
              operators/crawl.py) — the WHAT+WHEN schedule the next
              crawl round consumes (skipped when --robots none)
  langid/     heuristic language ID over the extracted content
              (functions/langid.py) — per-page profile scores and
              lang_pred, so the output corpus is language-filterable
  captions/   (media, caption) training pairs mined from the html_main
              interleaved spans (operators/interleave.py) — the
              CLIP-style multimodal artifact of the crawl
  metrics/    one row per stage: row counts + content/boilerplate split
              + graph size + allowed-URL count, keyed by --run-id — the
              lineage row a scheduler checks before re-running

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
    p.add_argument("--robots", default="fixture",
                   help="robots parquet (host, robots_txt), 'fixture' "
                        "(dist/robots_corpus.parquet), or 'none' to skip "
                        "the frontier stage")
    p.add_argument("--agent", default="TrainBot")
    p.add_argument("--per-host-cap", type=int, default=2)
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

    from pdf_extract_spark.operators.webgraph import host_edges

    he = host_edges(e).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    pagerank_fixed_point(he, iterations=args.iterations).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/hostrank")

    n_allowed = 0
    if args.robots != "none":
        from pdf_extract_spark.operators.crawl import fetch_waves
        from pdf_extract_spark.operators.robots import (
            parse_robots,
            robots_decisions,
        )

        if args.robots == "fixture":
            import os

            here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            robots = spark.read.parquet(
                os.path.join(here, "dist", "robots_corpus.parquet")
            )
        else:
            robots = spark.read.parquet(args.robots)
        nodes = e.select(F.col("src").alias("url")).union(
            e.select(F.col("dst").alias("url"))
        ).distinct()
        decisions = robots_decisions(parse_robots(robots), nodes, args.agent)
        allowed = decisions.where(F.col("allowed")).select("url", "host")
        n_allowed = allowed.count()
        fetch_waves(allowed, per_host_cap=args.per_host_cap).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/frontier")

    from pdf_extract_spark.functions.langid import identify_language

    identify_language(
        spark.read.parquet(f"{args.output}/content"),
        text_col="content_text",
        id_col="url",
    ).write.mode("overwrite").parquet(f"{args.output}/langid")

    # caption mining over the INTERLEAVED spans of the html_main path:
    # (media, caption) training pairs per page — the multimodal artifact
    # a CLIP-style pair corpus consumes (operators/interleave.py)
    from pdf_extract_spark.html_main import extract_main_content
    from pdf_extract_spark.operators.interleave import media_captions

    spans = (
        extract_main_content(pages.select(F.col("url").alias("doc_id"), "html"))
        .select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .select(
            "doc_id",
            "pos",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )
    media_captions(spans, max_words=6, min_words=1).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/captions")

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
        stat("hostrank", spark.read.parquet(f"{args.output}/hostrank")),
        stat("langid", spark.read.parquet(f"{args.output}/langid")),
        stat("captions", spark.read.parquet(f"{args.output}/captions")),
    ]
    if args.robots != "none":
        metrics.append(
            stat(
                "frontier",
                spark.read.parquet(f"{args.output}/frontier"),
                extra=n_allowed,
            )
        )
    spark.createDataFrame(
        metrics, "run_id string, stage string, n_rows long, n_extra long"
    ).write.mode("overwrite").parquet(f"{args.output}/metrics")
    for m in metrics:
        print(f"[web_job] {m['stage']}: rows={m['n_rows']} extra={m['n_extra']}")
    spark.stop()


if __name__ == "__main__":
    main()
