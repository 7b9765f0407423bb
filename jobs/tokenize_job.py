"""Tokenize-and-pack job — the trainer-facing last mile as a
spark-submit entry: documents in, a trained tokenizer vocabulary, the
packed-chunk shard map, and the shuffled shard assignment out.

Stages (each written under --output):
  vocab/     the trained tokenizer table — BPE merge rules
             (rank, left, right, pair_count) or unigram pieces
             (rank, piece, piece_count), per --tokenizer
  counts/    per-doc token counts under the trained vocab
             (doc_id, n_words, n_{bpe,unigram}_tokens)
  pack/      the seq_len shard map (chunk_id, doc_id, doc_off,
             chunk_off, n_toks) from the two-phase distributed
             prefix sum — what a trainer uses to assemble batches
             without materializing the concatenated stream
  shards/    deterministic md5-order global shuffle split into
             --n-shards balanced shards
  metrics/   one row per stage keyed by --run-id

Usage (local sandbox):
    python tools/package_pyfiles.py
    spark-submit --master local[8] \
        --py-files dist/pdf_extract_spark.zip \
        jobs/tokenize_job.py --input documents.parquet \
        --output /tmp/tok_out --tokenizer bpe --num-merges 32

Scale notes: training scans the corpus ONCE for the word histogram;
every merge/EM round is vocabulary-sized; packing and sharding use the
two-phase distributed prefix sum (no corpus-sized window partition).
Pass --checkpoint-dir on a real cluster so the pack's partition pin
survives executor loss.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default=f"run-{int(time.time())}")
    p.add_argument("--tokenizer", choices=["bpe", "unigram"], default="bpe")
    p.add_argument("--num-merges", type=int, default=32,
                   help="BPE merge rounds (bpe mode)")
    p.add_argument("--vocab-size", type=int, default=96,
                   help="unigram vocab cap (unigram mode)")
    p.add_argument("--em-rounds", type=int, default=2)
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "pdf_extract_spark.tokenize"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pdf_extract_spark.operators.pack import pack_sequences, shuffle_shards

    docs = spark.read.parquet(args.input)

    if args.tokenizer == "bpe":
        from pdf_extract_spark.functions.bpe import bpe_segment, bpe_train

        vocab_df, rules = bpe_train(docs, args.num_merges)
        counts = bpe_segment(docs, rules)
        count_col = "n_bpe_tokens"
    else:
        from pdf_extract_spark.functions.unigram import (
            unigram_segment,
            unigram_train,
        )

        vocab_df, pieces = unigram_train(
            docs, vocab_size=args.vocab_size, rounds=args.em_rounds
        )
        counts = unigram_segment(docs, pieces)
        count_col = "n_unigram_tokens"

    vocab_df.coalesce(1).write.mode("overwrite").parquet(
        f"{args.output}/vocab"
    )
    counts.write.mode("overwrite").parquet(f"{args.output}/counts")
    counts_r = spark.read.parquet(f"{args.output}/counts")

    pack_sequences(
        counts_r,
        args.seq_len,
        count_col=count_col,
        checkpoint_dir=args.checkpoint_dir,
    ).write.mode("overwrite").parquet(f"{args.output}/pack")

    shuffle_shards(docs, args.n_shards).write.mode("overwrite").parquet(
        f"{args.output}/shards"
    )

    metrics = []
    for stage in ("vocab", "counts", "pack", "shards"):
        n = spark.read.parquet(f"{args.output}/{stage}").count()
        metrics.append((args.run_id, stage, n))
        print(f"[tokenize_job] {stage}: rows={n}")
    spark.createDataFrame(
        metrics, "run_id string, stage string, n_rows long"
    ).coalesce(1).write.mode("append").parquet(f"{args.output}/metrics")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
