"""Generate dist/golden_audiofp.parquet — the DuckDB oracle for the
`media_audio_fp` query.

Expected signatures are derived from the audio-corpus SPECS
(pdf_extract_spark/sources/media_corpus.py) by closed-form math: every
window holds a constant int16 amplitude, so its RMS is exactly
|amp|/32768 and the 4-bit quantized level is exactly |amp| // 2048 —
computed here in pure integer arithmetic, NEVER by running the WAV/FLAC
decoders, so a decoder defect (wrong Rice residual, wrong stereo
decorrelation, wrong normalization) flips golden nibbles.  Stub-tier
rows (truncated/corrupted payloads) expect NULL with decoder='stub'.

Usage: python tools/gen_golden_audiofp.py  (re-run when media_corpus.py
changes.)
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.sources.media_corpus import (  # noqa: E402
    AUDIO_PLANT_SPECS,
    FLAC_SPECS,
    WAV_SPECS,
    audio_plant_amps,
    fuzz_media_rows,
)

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_audiofp.parquet"


def fp_of(amps: list[int]) -> int:
    val = 0
    for a in amps:
        val = (val << 4) | min(abs(a) // 2048, 15)
    return val - (1 << 64) if val >= (1 << 63) else val


def golden_rows():
    rows = []  # (media_id, sample_rate, n_channels, audio_fp, decoder)
    for name, rate, nch, amps in WAV_SPECS:
        rows.append((name, rate, nch, fp_of(amps), "wav"))
    for name, rate, nch, _ms, amps in FLAC_SPECS:
        rows.append((name, rate, nch, fp_of(amps), "flac"))
    rate, nch = WAV_SPECS[0][1], WAV_SPECS[0][2]
    for name, nudges in AUDIO_PLANT_SPECS:
        rows.append((name, rate, nch, fp_of(audio_plant_amps(nudges)), "wav"))
    for name, kind, _payload in fuzz_media_rows():
        if kind == "audio":
            rows.append((name, 0, 0, None, "stub"))
    return rows


def main() -> None:
    rows = golden_rows()
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "media_id": pa.array(cols[0], pa.string()),
            "sample_rate": pa.array(cols[1], pa.int64()),
            "n_channels": pa.array(cols[2], pa.int64()),
            "audio_fp": pa.array(cols[3], pa.int64()),
            "decoder": pa.array(cols[4], pa.string()),
        }
    )
    OUT.parent.mkdir(exist_ok=True)
    pq.write_table(tbl, OUT)
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
