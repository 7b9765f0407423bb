"""Generate dist/golden_media.parquet — the DuckDB oracle for the
`media_features` query.

Expected rows are derived from the media-corpus SPECS
(pdf_extract_spark/sources/media_corpus.py) by closed-form math — gradient
pixel formula, solid value, per-window amplitudes, the documented stub
formula — NEVER by running the decoders, so the driver compare is a real
oracle.  byte_len/sha256 come from the payload bytes via hashlib directly.

Usage: python tools/gen_golden_media.py  (re-run when media_corpus.py or
fixtures change; tests/test_operators.py guards staleness).
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.fixtures import corpus  # noqa: E402
from pdf_extract_spark.sources.media_corpus import (  # noqa: E402
    BMP_SPECS,
    FLAC_SPECS,
    GIF_SPECS,
    JPEG_PROG_AC_SPECS,
    JPEG_PROG_SPECS,
    JPEG_SPECS,
    PNG_SPECS,
    PPM_SPECS,
    STUB_SPECS,
    WAV_SPECS,
    WEBP_SPECS,
    fuzz_media_rows,
    gif_gray,
    jpeg_pixel,
    jpeg_prog_ac_pixel,
    make_bmp,
    make_gif,
    make_gif_lzw,
    make_jpeg,
    make_flac,
    make_jpeg_progressive,
    make_png,
    make_png_raw,
    make_ppm,
    make_wav,
    make_webp_fixture,
    png_pixel,
    webp_gray,
)

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_media.parquet"


def thumb_indices(n: int) -> list[int]:
    return [min(i * n // 4, n - 1) for i in range(4)]


def stub_expect(payload: bytes):
    """The documented deterministic-fake spec (multimodal.decode_image_stub)."""
    d = hashlib.sha256(payload).digest()
    return 1 + d[0] % 64, 1 + d[1] % 64, [d[2 + i] / 255.0 for i in range(16)]


def _assert_tie_safe(grid, ac, min_dist: float = 0.05) -> None:
    """Every pre-round IDCT pixel of the AC-bearing blocks must sit at
    least `min_dist` from a half-integer; DC-only blocks are exact."""
    import math

    from pdf_extract_spark.sources.media_corpus import _jpeg_zigzag

    zz = _jpeg_zigzag()
    for (r, c), coefs in ac.items():
        full = {0: (grid[r][c] - 128) * 8, **dict(coefs)}
        for by in range(8):
            for bx in range(8):
                s = 0.0
                for k, val in full.items():
                    u, v = zz[k]
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (cu * cv * val
                          * math.cos((2 * by + 1) * u * math.pi / 16)
                          * math.cos((2 * bx + 1) * v * math.pi / 16))
                pre = s / 4.0 + 128.0
                frac = abs((pre - math.floor(pre)) - 0.5)
                assert frac >= min_dist, (r, c, bx, by, pre)


def golden_rows():
    rows = []  # (media_id, media_kind, payload, width, height, feature, decoder)
    for name, w, h in PPM_SPECS:
        xs = thumb_indices(w)
        # gradient: gray(x) = (x*255 // (w-1)) / 255, independent of y
        feat = [(x * 255 // (w - 1)) / 255.0 for _ in range(4) for x in xs]
        rows.append((name, "image", make_ppm(w, h), w, h, feat, "ppm"))
    for name, w, h, v in BMP_SPECS:
        rows.append((name, "image", make_bmp(w, h, v), w, h, [v / 255.0] * 16, "bmp"))
    for name, w, h, ct in PNG_SPECS:
        # closed-form: gray at (x, y) = png_pixel(x, y) / 255 (channels are
        # equal, so the channel mean is exactly the value in float64)
        xs, ys = thumb_indices(w), thumb_indices(h)
        feat = [png_pixel(x, y) / 255.0 for y in ys for x in xs]
        rows.append((name, "image", make_png(w, h, ct), w, h, feat, "png"))
    for name, grid, color, sub in JPEG_SPECS:
        # closed-form per the T.81 math of the fixture: a DC-only block
        # with an all-ones quant table decodes to exactly F(0,0)/8 + 128 =
        # the grid value (Cb=Cr=128 make RGB == Y exactly)
        w, h = len(grid[0]) * 8, len(grid) * 8
        xs, ys = thumb_indices(w), thumb_indices(h)
        feat = [jpeg_pixel(grid, x, y) / 255.0 for y in ys for x in xs]
        rows.append((name, "image", make_jpeg(grid, color, sub), w, h, feat, "jpeg"))
    for name, grid, color, sub in JPEG_PROG_SPECS:
        # progressive scan script, same DC-only closed form: successive
        # approximation must reconstruct the exact grid values
        w, h = len(grid[0]) * 8, len(grid) * 8
        xs, ys = thumb_indices(w), thumb_indices(h)
        feat = [jpeg_pixel(grid, x, y) / 255.0 for y in ys for x in xs]
        rows.append(
            (name, "image", make_jpeg_progressive(grid, color, sub), w, h, feat, "jpeg")
        )
    for name, grid, ac in JPEG_PROG_AC_SPECS:
        # progressive WITH AC coefficients (first-scan sizes >= 5, EOBn
        # extension bits > 7): expected pixels from the spec IDCT formula
        # (jpeg_prog_ac_pixel — spec math, never the decoder); the spec
        # guarantees every AC-block pre-round pixel is tie-safe, asserted
        # here so the exact-integer golden can never straddle a rounding
        # tie between the decoder's einsum and the spec double-sum
        _assert_tie_safe(grid, ac)
        w, h = len(grid[0]) * 8, len(grid) * 8
        xs, ys = thumb_indices(w), thumb_indices(h)
        feat = [jpeg_prog_ac_pixel(grid, ac, x, y) / 255.0
                for y in ys for x in xs]
        rows.append(
            (name, "image", make_jpeg_progressive(grid, ac=ac), w, h, feat, "jpeg")
        )
    for name, w, h, bits in GIF_SPECS:
        # closed-form: palette gray of index (x+y) % 2^bits
        xs, ys = thumb_indices(w), thumb_indices(h)
        feat = [gif_gray(bits, x, y) / 255.0 for y in ys for x in xs]
        rows.append((name, "image", make_gif(w, h, bits), w, h, feat, "gif"))
    for name, w, h, kind in WEBP_SPECS:
        # VP8L is lossless: the expectation is the closed-form gray
        # pattern itself, exactly (channels equal => mean == value)
        xs, ys = thumb_indices(w), thumb_indices(h)
        feat = [webp_gray(kind, x, y) / 255.0 for y in ys for x in xs]
        rows.append((name, "image", make_webp_fixture(name, w, h, kind),
                     w, h, feat, "webp"))
    for name, rate, nch, amps in WAV_SPECS:
        feat = [abs(a) / 32768.0 for a in amps]
        rows.append((name, "audio", make_wav(rate, nch, amps), rate, nch, feat, "wav"))
    for name, rate, nch, ms, amps in FLAC_SPECS:
        # constant per-window amplitude on every channel -> RMS exactly
        # |amp|/32768, independent of the frame's subframe/stereo coding
        feat = [abs(a) / 32768.0 for a in amps]
        rows.append(
            (name, "audio", make_flac(rate, nch, amps, mid_side=ms),
             rate, nch, feat, "flac")
        )
    # the really-LZW-compressed GIF: same closed-form palette pattern
    w, h, bits = 40, 30, 4
    xs, ys = thumb_indices(w), thumb_indices(h)
    feat = [gif_gray(bits, x, y) / 255.0 for y in ys for x in xs]
    rows.append(
        ("gif-lzw-4bit-40x30", "image", make_gif_lzw(w, h, bits), w, h, feat, "gif")
    )
    # interlaced variants: same pixel formulas, reordered on the wire
    w, h = 21, 17
    xs, ys = thumb_indices(w), thumb_indices(h)
    feat = [png_pixel(x, y) / 255.0 for y in ys for x in xs]
    px = np.array(
        [[[png_pixel(x, y)] for x in range(w)] for y in range(h)], dtype=np.uint8
    )
    rows.append(
        ("png-adam7-gray-21x17", "image",
         make_png_raw(px, color_type=0, interlace=True), w, h, feat, "png")
    )
    w, h, bits = 19, 13, 4
    xs, ys = thumb_indices(w), thumb_indices(h)
    feat = [gif_gray(bits, x, y) / 255.0 for y in ys for x in xs]
    rows.append(
        ("gif-interlaced-4bit-19x13", "image",
         make_gif_lzw(w, h, bits, interlace=True), w, h, feat, "gif")
    )
    for name, payload in STUB_SPECS:
        w, h, feat = stub_expect(payload)
        rows.append((name, "image", payload, w, h, feat, "stub"))
    # malformed real-encoder outputs (truncations / fixed corruptions):
    # every one must land in the tagged stub tier, never raise — the
    # expectation is the documented stub formula over the exact bytes
    for name, kind, payload in fuzz_media_rows():
        w, h, feat = stub_expect(payload)
        rows.append((name, kind, payload, w, h, feat, "stub"))
    # fixture PDFs ride along as opaque stub-tier blobs (the MB-scale binary
    # plumbing case): expected values from the stub spec over the raw bytes
    for doc_id, pdf, _expected in corpus(replicas=1):
        w, h, feat = stub_expect(pdf)
        rows.append((doc_id, "image", pdf, w, h, feat, "stub"))
    return rows


def main():
    rows = golden_rows()
    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.string()),
            "media_kind": pa.array([r[1] for r in rows], pa.string()),
            "byte_len": pa.array([len(r[2]) for r in rows], pa.int64()),
            "sha256": pa.array(
                [hashlib.sha256(r[2]).hexdigest() for r in rows], pa.string()
            ),
            "width": pa.array([r[3] for r in rows], pa.int32()),
            "height": pa.array([r[4] for r in rows], pa.int32()),
            # canonical string form matching the query's serialization:
            # float32 (the engine's column type) widened to double, then
            # floor(x*1e6 + 0.5) as a long — exact IEEE ops on both engines,
            # so no formatting/rounding-mode ambiguity.  Kept as a string so
            # the driver's pandas canonicalizer can sort/hash the cell.
            "feature": pa.array(
                [
                    ",".join(
                        str(math.floor(float(v) * 1e6 + 0.5))
                        for v in np.asarray(r[5], dtype=np.float32)
                    )
                    for r in rows
                ],
                pa.string(),
            ),
            "decoder": pa.array([r[6] for r in rows], pa.string()),
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
