"""WebP lossless (VP8L) decoder (operators/webp.py) vs the from-scratch
encoder (sources/webp_enc.py) and the closed-form fixture specs
(sources/media_corpus.py:WEBP_SPECS).

VP8L is lossless, so every expectation is the input pixel array itself —
exact equality, never a tolerance.  The encoder computes its prediction /
color-transform residuals with its own scalar math, so a kernel bug in
either side breaks the round trip instead of cancelling out.
"""

import numpy as np
import pytest

from pdf_extract_spark.operators.webp import (
    _DIST_MAP,
    _short_distance_map,
    decode_webp,
)
from pdf_extract_spark.sources.media_corpus import (
    WEBP_SPECS,
    make_webp_fixture,
    webp_gray,
)
from pdf_extract_spark.sources.webp_enc import make_webp


def _expected(kind, w, h):
    v = np.array(
        [[webp_gray(kind, x, y) for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    return np.repeat(v[:, :, None], 3, axis=2)


@pytest.mark.parametrize("name,w,h,kind", WEBP_SPECS)
def test_webp_specs_roundtrip_exactly(name, w, h, kind):
    img = decode_webp(make_webp_fixture(name, w, h, kind))
    assert img.shape == (h, w, 3)
    assert np.array_equal(img, _expected(kind, w, h))


def test_short_distance_map_generative_rule():
    """The map must contain the 120 unique neighbor offsets (y in [0,7],
    x in [-7,8], x >= 1 when y == 0) in ascending squared-distance order,
    larger y first within a tie, positive x before negative."""
    m = _short_distance_map()
    assert len(m) == 120
    assert len(set(m)) == 120
    for x, y in m:
        assert 0 <= y <= 7 and -7 <= x <= 8
        assert y > 0 or x >= 1
    d2 = [x * x + y * y for x, y in m]
    assert d2 == sorted(d2)


def test_short_distance_map_spec_anchors():
    """Spot values transcribed from the RFC 9649 distance-map listing —
    anchors the generated table to the published constants."""
    assert _DIST_MAP[0] == (0, 1)
    assert _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[2] == (1, 1)
    assert _DIST_MAP[3] == (-1, 1)
    assert _DIST_MAP[4] == (0, 2)
    assert _DIST_MAP[15] == (-1, 3)
    assert _DIST_MAP[34] == (0, 5)
    assert _DIST_MAP[96] == (8, 0)
    assert _DIST_MAP[119] == (8, 7)


def test_webp_constant_color_single_symbol_codes():
    """A constant image drives every alphabet to one symbol: the simple
    1-symbol (0-bit) prefix-code path on all five codes."""
    px = np.full((9, 7, 3), 201, dtype=np.uint8)
    assert np.array_equal(decode_webp(make_webp(px)), px)


def test_webp_two_color_simple_codes():
    """Exactly two distinct symbols per channel: the 2-symbol simple
    prefix-code path."""
    v = np.fromfunction(lambda y, x: ((x + y) % 2) * 255, (5, 11)).astype(np.uint8)
    px = np.repeat(v[:, :, None], 3, axis=2)
    assert np.array_equal(decode_webp(make_webp(px)), px)


def test_webp_1x1_and_thin_images():
    for w, h in ((1, 1), (1, 9), (9, 1), (2, 2)):
        v = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 7
        px = np.repeat(v[:, :, None], 3, axis=2)
        assert np.array_equal(decode_webp(make_webp(px)), px)


def test_webp_full_color_not_gray():
    """Distinct per-channel content (r != g != b) exercises the red/blue
    codes with their own alphabets."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(make_webp(px)), px)


@pytest.mark.parametrize("mode", range(14))
def test_webp_each_predictor_mode_roundtrips(mode):
    """One uniform-mode tile image per predictor mode, over content with
    enough variation that a wrong predictor changes some pixel."""
    rng = np.random.default_rng(100 + mode)
    px = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    modes = np.full((2, 2), mode, dtype=np.uint64)  # 8px tiles over 13x11
    data = make_webp(px, predictor_bits=3, predictor_modes=modes)
    assert np.array_equal(decode_webp(data), px)


def test_webp_property_sweep():
    """60 random (size, content, feature-combo) cases; exact round trip on
    every one."""
    rng = np.random.default_rng(20260817)
    for case in range(60):
        w = int(rng.integers(1, 34))
        h = int(rng.integers(1, 26))
        style = case % 3
        if style == 0:  # full-random RGB
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif style == 1:  # few colors (cache/palette-friendly)
            levels = rng.integers(0, 256, 6, dtype=np.uint8)
            px = levels[rng.integers(0, 6, (h, w))]
            px = np.repeat(px[:, :, None], 3, axis=2)
        else:  # blocky runs (lz77-friendly)
            v = rng.integers(0, 256, (max(1, h // 3), max(1, w // 5)),
                             dtype=np.uint8)
            px = np.repeat(v[:, :, None], 3, axis=2)
            px = px.repeat(3, axis=0)[:h].repeat(5, axis=1)[:, :w]
            if px.shape[0] < h:
                px = np.vstack([px, px[-1:].repeat(h - px.shape[0], axis=0)])
            if px.shape[1] < w:
                px = np.hstack([px, px[:, -1:].repeat(w - px.shape[1], axis=1)])
        cfg = {}
        if rng.random() < 0.5:
            cfg["cache_bits"] = int(rng.integers(1, 9))
        if rng.random() < 0.5:
            cfg["lz77"] = True
        if rng.random() < 0.4:
            cfg["subtract_green"] = True
        if rng.random() < 0.35 and w > 1 and h > 1:
            bits = int(rng.integers(2, 5))
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            cfg["predictor_bits"] = bits
            cfg["predictor_modes"] = rng.integers(0, 14, (th, tw)).astype(np.uint64)
        elif rng.random() < 0.3:
            bits = int(rng.integers(2, 5))
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            cfg["color_bits"] = bits
            cfg["ctes"] = rng.integers(0, 1 << 24, (th, tw)).astype(np.uint64)
        data = make_webp(px, **cfg)
        got = decode_webp(data)
        assert np.array_equal(got, px), (case, px.shape, cfg.keys())


def test_webp_palette_paths():
    """Bundled (2/4/16-color) and unbundled (>16-color) palette images,
    including widths that don't divide the bundle factor."""
    rng = np.random.default_rng(3)
    for n_colors, w, h in ((2, 17, 5), (4, 9, 6), (16, 13, 4), (40, 21, 6)):
        colors = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        colors = np.unique(colors, axis=0)
        idx = rng.integers(0, len(colors), (h, w))
        px = colors[idx]
        pal = np.array(
            sorted({0xFF000000 | (int(r) << 16) | (int(g) << 8) | int(b)
                    for r, g, b in colors}),
            dtype=np.uint64,
        )
        data = make_webp(px, palette=pal)
        assert np.array_equal(decode_webp(data), px)


def test_webp_meta_prefix_groups():
    rng = np.random.default_rng(11)
    w, h = 24, 16
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    meta = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint64)  # 8px tiles
    data = make_webp(px, meta_bits=3, meta_index=meta)
    assert np.array_equal(decode_webp(data), px)


def test_webp_truncation_raises():
    data = make_webp_fixture("", 16, 8, "literal")
    with pytest.raises(ValueError):
        decode_webp(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_webp(data[:11])  # inside the RIFF header


def test_webp_lossy_vp8_raises_not_implemented():
    payload = (b"RIFF\x28\x00\x00\x00WEBPVP8 \x1c\x00\x00\x00"
               b"fake-vp8-frame-payload-0003\x00")
    with pytest.raises(NotImplementedError):
        decode_webp(payload)


def test_webp_fuzz_rows_land_in_stub_tier():
    from pdf_extract_spark.operators.multimodal import _decode_any
    from pdf_extract_spark.sources.media_corpus import fuzz_media_rows

    rows = {n: (k, p) for n, k, p in fuzz_media_rows()}
    for name in ("fuzz-webp-truncated", "fuzz-webp-corrupt",
                 "fuzz-webp-hugedims", "fuzz-webp-duptransform",
                 "fuzz-webp-badlengths", "fuzz-webp-overlongref"):
        kind, payload = rows[name]
        *_, dec = _decode_any(kind, payload)
        assert dec == "stub", name


def test_webp_crafted_fuzz_raises_named_errors():
    """Each hand-written VP8L fuzz payload must hit ITS decoder rejection
    path (not merely any exception): the huge-dims header must be caught
    by the pixel cap BEFORE the per-pixel loop (a 12-byte payload would
    otherwise decode 268M pixels for hours), and the other three must hit
    the duplicate-transform / empty-code / LZ77-bounds guards."""
    import time

    from pdf_extract_spark.sources.media_corpus import _vp8l_fuzz

    expectations = {
        "hugedims": "decode cap",
        "duptransform": "duplicate transform",
        "badlengths": "empty prefix code",
        "overlongref": "LZ77 reference out of bounds",
    }
    for which, msg in expectations.items():
        t0 = time.perf_counter()
        with pytest.raises(ValueError, match=msg):
            decode_webp(_vp8l_fuzz(which))
        # the rejection must be immediate — the cap exists precisely so a
        # crafted header cannot stall an executor task
        assert time.perf_counter() - t0 < 1.0, which


def test_webp_feature_dispatch_tags_webp():
    from pdf_extract_spark.operators.multimodal import _decode_any

    data = make_webp_fixture("", 16, 8, "literal")
    w, h, feat, dec = _decode_any("image", data)
    assert (w, h, dec) == (16, 8, "webp")
    xs = [min(i * 16 // 4, 15) for i in range(4)]
    ys = [min(i * 8 // 4, 7) for i in range(4)]
    expect = [webp_gray("literal", x, y) / 255.0 for y in ys for x in xs]
    assert feat == expect
