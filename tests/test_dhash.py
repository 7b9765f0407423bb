"""Perceptual image dhash + banded Hamming near-dup
(operators/multimodal.py: image_dhash / extract_media_dhash /
dhash_near_pairs).  End-to-end values are additionally oracled against
the spec-math golden (tools/gen_golden_dhash.py) via the driver rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators.multimodal import (
    dhash_near_pairs,
    extract_media_dhash,
    image_dhash,
)
from pdf_extract_spark.sources.media_corpus import (
    dhash_plant_rows,
    make_bmp,
    make_gif,
    make_ppm,
    synthetic_media_rows,
)


def test_kernel_known_values():
    # strict left-to-right gradient -> every bit set -> signed -1
    grad = np.tile(np.arange(64, dtype=np.uint8)[None, :, None], (32, 1, 3))
    assert image_dhash(grad) == -1
    # constant image -> no strict increase anywhere -> 0
    solid = np.full((16, 16, 3), 128, dtype=np.uint8)
    assert image_dhash(solid) == 0
    # flipping one resample cell toggles exactly its adjacent-compare bits
    base = np.zeros((8, 9, 3), dtype=np.uint8)
    one = base.copy()
    one[0, 1] = 255  # cell (r=0, c=1): bit c=0 flips 0->1, bit c=1 stays 0
    assert bin(image_dhash(one) ^ image_dhash(base)).count("1") == 1


def test_plants_have_designed_hamming(spark):
    rows = [r for r in synthetic_media_rows() if r[0] == "png-gray-11x7"]
    rows += dhash_plant_rows()
    df = spark.createDataFrame(
        rows, "media_id string, media_kind string, payload binary"
    )
    got = {r["media_id"]: r["dhash"]
           for r in extract_media_dhash(df, num_partitions=2).collect()}
    base = got["png-gray-11x7"]
    ham = {t: bin(got[f"png-gray-11x7-{t}"] ^ base).count("1")
           for t in ("nd0", "nd1", "nd2")}
    assert ham == {"nd0": 0, "nd1": 1, "nd2": 2}


def test_stub_rows_null_and_exact_in_mixed_batches(spark):
    """One batch holding both a stub (None dhash) and a real hash must
    keep the real hash bit-exact — pd.DataFrame would coerce the mixed
    column to float64 and round 64-bit hashes to 53-bit mantissas (the
    bug this test pins)."""
    rows = [
        ("gif", "image", make_gif(13, 9, 2)),
        ("stub", "image", b"\xff\xd8garbage"),
        ("ppm", "image", make_ppm(16, 8)),
        ("bmp", "image", make_bmp(10, 6, 128)),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, media_kind string, payload binary"
    )
    got = {r["media_id"]: (r["dhash"], r["decoder"])
           for r in extract_media_dhash(df, num_partitions=1).collect()}
    assert got["stub"] == (None, "stub")
    assert got["gif"][0] == -2605695850942909075  # exact, not float-rounded
    assert got["ppm"] == (-1, "ppm") and got["bmp"] == (0, "bmp")


def test_near_pairs_banded_no_cartesian(spark):
    rows = synthetic_media_rows() + dhash_plant_rows()
    df = spark.createDataFrame(
        rows, "media_id string, media_kind string, payload binary"
    )
    pairs = dhash_near_pairs(extract_media_dhash(df, num_partitions=2))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in pairs.collect()}
    # the planted near-dups must surface with their designed distances
    assert got[("png-gray-11x7", "png-gray-11x7-nd0")] == 0
    assert got[("png-gray-11x7", "png-gray-11x7-nd1")] == 1
    assert got[("png-gray-11x7", "png-gray-11x7-nd2")] == 2
    # stub rows never pair
    assert not any("stub" in a or "stub" in b for a, b in got)


def test_hamming_beyond_band_guarantee_excluded(spark):
    """Pairs > max_hamming are filtered even when a band collides."""
    rows = [r for r in synthetic_media_rows()
            if r[0] in ("ppm-grad-16x8", "bmp-solid-10x6")]
    df = spark.createDataFrame(
        rows, "media_id string, media_kind string, payload binary"
    )
    # -1 vs 0: hamming 64, but all four bands of 0 vs 0xFFFF never equal
    assert dhash_near_pairs(extract_media_dhash(df)).count() == 0


# ---------------------------------------------------------------------------
# audio fingerprint (the dhash twin over WAV/FLAC)
# ---------------------------------------------------------------------------


def test_audio_fp_kernel_and_cross_format(spark):
    """Same content encoded as WAV and as FLAC must fingerprint
    IDENTICALLY (the decode path normalizes both to per-window RMS), and
    the planted single-window nudges sit at hamming 1 and 2."""
    from pdf_extract_spark.operators.multimodal import (
        banded_hamming_pairs,
        extract_audio_fp,
    )
    from pdf_extract_spark.sources.media_corpus import (
        audio_plant_rows,
        synthetic_media_rows,
    )

    rows = [r for r in synthetic_media_rows() if r[1] == "audio"]
    rows += audio_plant_rows()
    df = spark.createDataFrame(
        rows, "media_id string, media_kind string, payload binary"
    )
    got = {r["media_id"]: r["audio_fp"]
           for r in extract_audio_fp(df, num_partitions=2).collect()}
    assert got["wav-steps-mono"] == got["flac-steps-mono"]
    assert got["wav-steps-stereo"] == got["flac-steps-midside"]
    base = got["wav-steps-mono"]
    assert got["wav-steps-mono-nd0"] == base
    assert bin(got["wav-steps-mono-nd1"] ^ base).count("1") == 1
    assert bin(got["wav-steps-mono-nd2"] ^ base).count("1") == 2
    # fuzz audio lands in the stub tier with NULL fp
    assert got["fuzz-wav-truncated"] is None
    pairs = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in banded_hamming_pairs(
                 extract_audio_fp(df, num_partitions=2), "audio_fp"
             ).collect()}
    assert pairs[("flac-steps-mono", "wav-steps-mono")] == 0
    assert pairs[("wav-steps-mono", "wav-steps-mono-nd1")] == 1


def test_banding_rejects_unguaranteed_hamming(spark):
    from pdf_extract_spark.operators.multimodal import banded_hamming_pairs

    df = spark.createDataFrame([("a", 0)], "media_id string, dhash long")
    with pytest.raises(ValueError):
        banded_hamming_pairs(df, "dhash", max_hamming=4)
