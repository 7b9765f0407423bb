"""Media-curation job — spark-submit entry for the multimodal half of
the interleaved pipeline: a media table (media_id, media_kind, payload)
in, perceptual signatures and near-duplicate verdicts out.

Stages (each written under --output):
  image_hashes/  per-image (width, height, dhash, decoder) — stub-tier
                 rows carry decoder='stub' with NULL dhash (quarantine
                 stays visible, never a task failure)
  audio_fps/     per-audio (sample_rate, n_channels, audio_fp, decoder)
  image_pairs/   dhash near-duplicates (hamming <= --max-hamming)
  audio_pairs/   audio-signature near-duplicates
  metrics/       one row per stage: counts + stub counts + pair counts,
                 keyed by --run-id (the lineage row a scheduler checks
                 before re-running)

Usage (local sandbox):
    python tools/package_pyfiles.py   # builds dist/pdf_extract_spark.zip
    spark-submit --master local[8] \
        --py-files dist/pdf_extract_spark.zip \
        jobs/media_job.py --input media.parquet --output /tmp/media_out
    # or --input synthetic  (the deterministic oracled corpus + plants)
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="media parquet (media_id, media_kind, payload) "
                        "or 'synthetic'")
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default=f"run-{int(time.time())}")
    p.add_argument("--max-hamming", type=int, default=3)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_extract_spark.operators.multimodal import (
        banded_hamming_pairs,
        extract_audio_fp,
        extract_media_dhash,
    )

    spark = SparkSession.builder.appName("pdf_extract_spark.media").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input == "synthetic":
        from pdf_extract_spark.sources.media_corpus import (
            audio_plant_rows,
            dhash_plant_rows,
            synthetic_media_rows,
        )

        media = spark.createDataFrame(
            synthetic_media_rows() + dhash_plant_rows() + audio_plant_rows(),
            "media_id string, media_kind string, payload binary",
        )
    else:
        media = spark.read.parquet(args.input)

    hashes = extract_media_dhash(media)
    fps = extract_audio_fp(media)
    hashes.write.mode("overwrite").parquet(f"{args.output}/image_hashes")
    fps.write.mode("overwrite").parquet(f"{args.output}/audio_fps")
    # pair passes read the WRITTEN hashes back (one decode, two joins)
    h = spark.read.parquet(f"{args.output}/image_hashes")
    a = spark.read.parquet(f"{args.output}/audio_fps")
    img_pairs = banded_hamming_pairs(h, "dhash", args.max_hamming)
    aud_pairs = banded_hamming_pairs(a, "audio_fp", args.max_hamming)
    img_pairs.write.mode("overwrite").parquet(f"{args.output}/image_pairs")
    aud_pairs.write.mode("overwrite").parquet(f"{args.output}/audio_pairs")

    def stat(name, df, stub_col=None):
        row = {"run_id": args.run_id, "stage": name,
               "n_rows": df.count(), "n_stub": 0}
        if stub_col is not None:
            row["n_stub"] = df.filter(F.col(stub_col) == "stub").count()
        return row

    metrics = [
        stat("image_hashes", h, "decoder"),
        stat("audio_fps", a, "decoder"),
        stat("image_pairs", spark.read.parquet(f"{args.output}/image_pairs")),
        stat("audio_pairs", spark.read.parquet(f"{args.output}/audio_pairs")),
    ]
    spark.createDataFrame(
        metrics, "run_id string, stage string, n_rows long, n_stub long"
    ).write.mode("overwrite").parquet(f"{args.output}/metrics")
    for m in metrics:
        print(f"[media_job] {m['stage']}: rows={m['n_rows']} stub={m['n_stub']}")
    spark.stop()


if __name__ == "__main__":
    main()
