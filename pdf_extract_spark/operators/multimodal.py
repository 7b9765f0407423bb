"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode kernels are STUBS (image/audio libs are not in this container):
``decode_image_stub`` produces deterministic fake features derived from the
bytes, and ``decode_image_real`` raises NotImplementedError with the
intended signature documented.  Everything Spark-side — schema, batch
iteration, partitioning, output shape — is real and tested; swapping the
kernel for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, media_kind string, byte_len long, "
    "sha256 string, width int, height int, feature array<float>"
)


def decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real image decode/resize/feature kernel — requires PIL/cv2.

    Intended contract: decode payload -> (width, height, feature[16])
    where feature is a 4x4 grayscale thumbnail, row-major, in [0,1].
    """
    raise NotImplementedError(
        "image decode requires PIL/cv2 which are not installed; "
        "use decode_image_stub for deterministic plumbing tests"
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake: dimensions and features derived from a sha256 of
    the payload — stable across runs/engines, zero deps."""
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feature = [digest[2 + i] / 255.0 for i in range(16)]
    return width, height, feature


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {
            "media_id": [],
            "media_kind": [],
            "byte_len": [],
            "sha256": [],
            "width": [],
            "height": [],
            "feature": [],
        }
        for media_id, kind, payload in zip(
            pdf["media_id"], pdf["media_kind"], pdf["payload"]
        ):
            data = bytes(payload) if payload is not None else b""
            w, h, feat = decode_image_stub(data)
            rows["media_id"].append(media_id)
            rows["media_kind"].append(kind)
            rows["byte_len"].append(len(data))
            rows["sha256"].append(hashlib.sha256(data).hexdigest())
            rows["width"].append(w)
            rows["height"].append(h)
            rows["feature"].append(feat)
        yield pd.DataFrame(rows)


def extract_media_features(media: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """media table -> per-asset features.  Same salting discipline as the
    PDF path: payloads are MB-scale so hash-spread before the UDF stage."""
    spark = media.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        media.repartition(num_partitions, F.xxhash64("media_id"))
        .select("media_id", "media_kind", "payload")
        .mapInPandas(_feature_batches, FEATURE_SCHEMA)
    )


def media_from_spans(spans_df: DataFrame, raw_docs: DataFrame | None = None) -> DataFrame:
    """Derive a media table from extraction output: every kind='media' span
    becomes a media row keyed (doc_id, media_ref)."""
    m = (
        spans_df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(
            F.concat_ws("#", "doc_id", "s.media_ref").alias("media_id"),
            "doc_id",
            F.lit("image").alias("media_kind"),
            F.lit(None).cast("binary").alias("payload"),
            F.create_map(F.lit("ref"), F.col("s.media_ref")).alias("meta"),
        )
    )
    return m
