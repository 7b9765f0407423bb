"""Generate dist/golden_dhash.parquet — the DuckDB oracle for the
`media_dhash` query.

Expected hashes are derived from the media-corpus SPECS
(pdf_extract_spark/sources/media_corpus.py) by closed-form pixel math —
gradient formula, solid value, png_pixel/gif_gray/webp_gray/jpeg_pixel —
NEVER by running the decoders, so a decoder defect (wrong pixel, wrong
upsample, wrong predictor) flips golden bits.  The dhash definition is
reimplemented here from its documented spec: 9x8 nearest-neighbor
grayscale resample with ``(i*n) DIV k`` capped indices, strict
left-to-right brightness-increase bits, row-major MSB-first, signed
int64 wrap.  Stub-tier rows (fake/truncated payloads, lossy WebP)
expect NULL dhash with decoder='stub'.

Usage: python tools/gen_golden_dhash.py  (re-run when media_corpus.py
changes; tests/test_operators.py guards engine parity via the oracle).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.sources.media_corpus import (  # noqa: E402
    BMP_SPECS,
    GIF_SPECS,
    JPEG_PROG_AC_SPECS,
    JPEG_PROG_SPECS,
    JPEG_SPECS,
    PNG_SPECS,
    PPM_SPECS,
    STUB_SPECS,
    WEBP_SPECS,
    dhash_plant_pixel,
    fuzz_media_rows,
    gif_gray,
    jpeg_pixel,
    jpeg_prog_ac_pixel,
    png_pixel,
    webp_gray,
)

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_dhash.parquet"


def dhash_of(w: int, h: int, px) -> int:
    """Spec-math dhash: px(x, y) -> integer gray."""
    ys = [min(r * h // 8, h - 1) for r in range(8)]
    xs = [min(c * w // 9, w - 1) for c in range(9)]
    val = 0
    for y in ys:
        for c in range(8):
            bit = px(xs[c + 1], y) > px(xs[c], y)
            val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


def golden_rows():
    rows = []  # (media_id, width, height, dhash, decoder)

    def real(name, w, h, px, decoder):
        rows.append((name, w, h, dhash_of(w, h, px), decoder))

    for name, w, h in PPM_SPECS:
        real(name, w, h, lambda x, y, w=w: x * 255 // (w - 1), "ppm")
    for name, w, h, v in BMP_SPECS:
        real(name, w, h, lambda x, y, v=v: v, "bmp")
    for name, w, h, ct in PNG_SPECS:
        real(name, w, h, png_pixel, "png")
    for name, grid, color, sub in JPEG_SPECS:
        w, h = len(grid[0]) * 8, len(grid) * 8
        real(name, w, h, lambda x, y, g=grid: jpeg_pixel(g, x, y), "jpeg")
    for name, grid, color, sub in JPEG_PROG_SPECS:
        w, h = len(grid[0]) * 8, len(grid) * 8
        real(name, w, h, lambda x, y, g=grid: jpeg_pixel(g, x, y), "jpeg")
    for name, grid, ac in JPEG_PROG_AC_SPECS:
        # AC-bearing fixture: pixels from the spec IDCT closed form
        # (tie-safety of the AC blocks is asserted by gen_golden_media)
        w, h = len(grid[0]) * 8, len(grid) * 8
        real(name, w, h,
             lambda x, y, g=grid, a=ac: jpeg_prog_ac_pixel(g, a, x, y),
             "jpeg")
    for name, w, h, bits in GIF_SPECS:
        real(name, w, h, lambda x, y, b=bits: gif_gray(b, x, y), "gif")
    for name, w, h, kind in WEBP_SPECS:
        real(name, w, h, lambda x, y, k=kind: webp_gray(k, x, y), "webp")
    # the extra in-code fixtures beside the spec lists (synthetic_media_rows)
    real("gif-lzw-4bit-40x30", 40, 30, lambda x, y: gif_gray(4, x, y), "gif")
    real("png-adam7-gray-21x17", 21, 17, png_pixel, "png")
    real("gif-interlaced-4bit-19x13", 19, 13,
         lambda x, y: gif_gray(4, x, y), "gif")
    # planted near-duplicates: same pattern with 0/1/2 flipped resample
    # cells (dhash_plant_rows) — each flip toggles exactly one dhash bit
    for tag in ("nd0", "nd1", "nd2"):
        real(f"png-gray-11x7-{tag}", 11, 7,
             lambda x, y, t=tag: dhash_plant_pixel(t, x, y), "png")
    # stub tier: fake payloads and fuzz rows decode to NULL dhash
    for name, _payload in STUB_SPECS:
        rows.append((name, 0, 0, None, "stub"))
    for name, kind, _payload in fuzz_media_rows():
        if kind == "image":
            rows.append((name, 0, 0, None, "stub"))
    return rows


def main() -> None:
    rows = golden_rows()
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "media_id": pa.array(cols[0], pa.string()),
            "width": pa.array(cols[1], pa.int64()),
            "height": pa.array(cols[2], pa.int64()),
            "dhash": pa.array(cols[3], pa.int64()),
            "decoder": pa.array(cols[4], pa.string()),
        }
    )
    OUT.parent.mkdir(exist_ok=True)
    pq.write_table(tbl, OUT)
    n_real = sum(1 for r in rows if r[3] is not None)
    print(f"wrote {OUT}: {len(rows)} rows ({n_real} real, "
          f"{len(rows) - n_real} stub)")


if __name__ == "__main__":
    main()
