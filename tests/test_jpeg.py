"""Baseline JPEG decoder (operators/jpeg.py) vs the closed-form fixture
spec (sources/media_corpus.py:make_jpeg): a DC-only block with an all-ones
quant table decodes to exactly F(0,0)/8 + 128, so expectations derive from
the T.81 math, never from the decoder."""

import numpy as np
import pytest

from pdf_extract_spark.operators.jpeg import _BitReader, _Huff, decode_jpeg
from pdf_extract_spark.sources.media_corpus import (
    JPEG_SPECS,
    _BitWriter,
    make_jpeg,
)


@pytest.mark.parametrize("name,grid,color,sub", JPEG_SPECS)
def test_jpeg_specs_decode_exactly(name, grid, color, sub):
    img = decode_jpeg(make_jpeg(grid, color, sub))
    h, w = len(grid) * 8, len(grid[0]) * 8
    assert img.shape == (h, w, 3)
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            blk = img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8]
            assert (blk == v).all(), (name, r, c, np.unique(blk))


def test_jpeg_bitstream_stuffing_roundtrip():
    """0xFF bytes in the entropy stream are stuffed with 0x00 by the
    encoder and unstuffed by the reader — byte-exact through both."""
    bw = _BitWriter()
    pattern = [(0xFF, 8), (0x00, 8), (0xFF, 8), (0b101, 3), (0x1F, 5)]
    for v, n in pattern:
        bw.put(v, n)
    bw.flush()
    assert b"\xff\x00" in bytes(bw.out)  # stuffing actually happened
    br = _BitReader(bytes(bw.out), 0)
    for v, n in pattern:
        assert br.bits(n) == v


def test_jpeg_huffman_canonical_multilength():
    """Canonical table with codes at several lengths decodes each symbol
    (the Annex K DC table shape: 12 symbols over lengths 2..9)."""
    counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    symbols = bytes(range(12))
    table = _Huff(counts, symbols)
    # rebuild codes the canonical way and check a bit-reader decode of each
    code, k, pairs = 0, 0, []
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            pairs.append((symbols[k], code, length))
            code += 1
            k += 1
        code <<= 1
    for sym, code, length in pairs:
        bw = _BitWriter()
        bw.put(code, length)
        bw.flush()
        assert _BitReader(bytes(bw.out), 0).huff(table) == sym


def _idct_ref(coefs: dict[int, int]) -> np.ndarray:
    """Independent T.81 A.3.3 inverse DCT over zigzag-indexed coefficients
    (quant all-ones), straight from the spec formula — never from the
    decoder's matrix form."""
    from pdf_extract_spark.operators.jpeg import _ZIGZAG

    f = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for k, val in coefs.items():
                u, v = _ZIGZAG[k]
                cu = np.sqrt(0.5) if u == 0 else 1.0
                cv = np.sqrt(0.5) if v == 0 else 1.0
                s += (
                    cu * cv * val
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                )
            f[x, y] = s / 4.0 + 128.0
    return np.clip(np.round(f), 0, 255)


@pytest.mark.parametrize("name,grid,color,sub", JPEG_SPECS)
def test_jpeg_progressive_dc_matches_baseline(name, grid, color, sub):
    """Progressive scan script (DC first/refine + per-component AC scans)
    must reconstruct exactly what the baseline encoding of the same
    DC-only content decodes to."""
    from pdf_extract_spark.sources.media_corpus import make_jpeg_progressive

    base = decode_jpeg(make_jpeg(grid, color, sub))
    prog = decode_jpeg(make_jpeg_progressive(grid, color, sub))
    assert (base == prog).all(), name


def test_jpeg_progressive_ac_refinement_exact():
    """AC successive approximation: even coefficients land in the first
    scan (<<1), odd magnitudes need the refinement bit, and |v| == 1
    exists ONLY as a newly-nonzero refinement symbol.  Expectations from
    the spec IDCT formula, computed independently."""
    from pdf_extract_spark.sources.media_corpus import make_jpeg_progressive

    # block (0,0): mixed parities incl. +-1 (pure refinement coefficients);
    # block (0,1): empty (exercises EOB-run coverage with correction bits
    # read under the run); block (1,0)/(1,1): negatives and a k-gap
    ac = {
        (0, 0): [(1, 3), (2, -2), (5, 1), (9, -1)],
        (1, 0): [(3, -5), (14, 4)],
        (1, 1): [(63, 1)],
    }
    grid = [[100, 140], [90, 200]]
    img = decode_jpeg(make_jpeg_progressive(grid, ac=ac))
    for (r, c), coefs in [((0, 0), ac[(0, 0)]), ((0, 1), []),
                          ((1, 0), ac[(1, 0)]), ((1, 1), ac[(1, 1)])]:
        full = {0: (grid[r][c] - 128) * 8, **dict(coefs)}
        want = _idct_ref(full)
        got = img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8, 0]
        # <=1: a pre-round value at an exact .5 tie can round either way
        # between the decoder's einsum and the reference's double-sum
        # (different float summation orders); coefficient decode is exact,
        # pixel comparison tolerates only the rounding tie
        assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all(), (
            r, c, got - want
        )


def test_jpeg_baseline_separate_scans():
    """Baseline (SOF0) with one single-component scan per component —
    the spec-legal non-interleaved layout that used to raise."""
    from pdf_extract_spark.sources.media_corpus import make_jpeg_separate_scans

    grid = [[10, 60], [250, 130]]
    base = decode_jpeg(make_jpeg(grid, color=True))
    sep = decode_jpeg(make_jpeg_separate_scans(grid))
    assert (base == sep).all()


def test_jpeg_garbage_raises():
    with pytest.raises(Exception):
        decode_jpeg(b"\xff\xd8\xff\xe0 garbage that is not a scan")


def test_jpeg_restart_markers_decode_identically():
    """DRI + RSTn every N MCUs (DC predictors reset) must not change the
    decoded pixels, for N aligned and unaligned with the MCU count."""
    grid = [[0, 64, 128, 255], [255, 128, 64, 0]]
    base = decode_jpeg(make_jpeg(grid))
    for interval in (1, 2, 3, 7):
        withrst = decode_jpeg(make_jpeg(grid, restart_interval=interval))
        assert (withrst == base).all(), interval
    # and through the 4:2:0 color path
    grid4 = [[16, 48, 80, 112], [144, 176, 208, 240],
             [240, 208, 176, 144], [112, 80, 48, 16]]
    base4 = decode_jpeg(make_jpeg(grid4, subsample420=True))
    with4 = decode_jpeg(make_jpeg(grid4, subsample420=True, restart_interval=1))
    assert (with4 == base4).all()


def test_jpeg_fuzz_never_hangs_or_crashes_python():
    """Truncations and single-byte corruptions of valid JPEGs either
    decode to an image or raise a clean exception — never hang and never
    return a malformed array.  Deterministic corruption schedule."""
    from pdf_extract_spark.sources.media_corpus import make_jpeg_progressive

    payloads = [
        make_jpeg([[0, 64], [128, 255]], color=True),
        make_jpeg_progressive([[100, 200]], ac={(0, 0): [(1, 3), (2, -1)]}),
    ]
    for payload in payloads:
        for cut in range(4, len(payload), 7):
            try:
                img = decode_jpeg(payload[:cut])
                assert img.ndim == 3 and img.shape[2] == 3
            except Exception:
                pass
        for i in range(2, len(payload), 5):
            mutated = bytearray(payload)
            mutated[i] ^= 0x5A
            try:
                img = decode_jpeg(bytes(mutated))
                assert img.ndim == 3 and img.shape[2] == 3
            except Exception:
                pass


def test_jpeg_progressive_large_magnitude_and_long_eob_run():
    """The two decoder branches no fixture reached (ADVICE r4): an AC
    coefficient whose first-scan magnitude needs size 5+ (|v|>>1 >= 16),
    and an EOB run long enough that the EOBn symbol carries more than 7
    extension bits (run >= 256 blocks).  1x300 grid, AC on the first and
    last blocks only -> a 299-block run (EOBn r=8, 8 extension bits) in
    both the first and the refinement scan."""
    from pdf_extract_spark.sources.media_corpus import make_jpeg_progressive

    ac = {
        (0, 0): [(1, 40), (7, -70)],   # sizes 5 and 6 in the first scan
        (0, 299): [(2, 33), (10, 1)],  # size 5 + a refinement-only +-1
    }
    grid = [[128] * 300]
    img = decode_jpeg(make_jpeg_progressive(grid, ac=ac))
    assert img.shape == (8, 2400, 3)
    for c in (0, 150, 299):
        full = {0: 0, **dict(ac.get((0, c), []))}
        want = _idct_ref(full)
        got = img[0:8, c * 8 : (c + 1) * 8, 0]
        assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all(), c


def _random_prog_case(seed: int):
    rng = np.random.default_rng(4200 + seed)
    sub = bool(rng.integers(0, 2))
    color = sub or bool(rng.integers(0, 2))
    if sub:
        rows = cols = int(rng.choice([2, 4]))
    else:
        rows, cols = int(rng.integers(1, 5)), int(rng.integers(1, 5))
    grid = [[int(rng.integers(0, 256)) for _ in range(cols)] for _ in range(rows)]
    restart = int(rng.choice([0, 0, 1, 2, 3, 5, 7]))
    split = None if rng.integers(0, 2) else int(rng.integers(1, 63))
    ac = {}
    for _ in range(int(rng.integers(0, rows * cols + 1))):
        r, c = int(rng.integers(0, rows)), int(rng.integers(0, cols))
        nk = int(rng.integers(1, 6))
        ks = sorted(rng.choice(np.arange(1, 64), size=nk, replace=False).tolist())
        coefs = []
        for k in ks:
            mag = int(rng.integers(1, 1 << int(rng.integers(1, 11))))
            mag = min(mag, 2047)
            coefs.append((int(k), mag if rng.integers(0, 2) else -mag))
        ac[(r, c)] = coefs
    return grid, color, sub, ac, restart, split


@pytest.mark.parametrize("seed", range(50))
def test_jpeg_progressive_random_roundtrip(seed):
    """Randomized sweep over subsampling x restart intervals x spectral
    band splits x AC coefficient sets (magnitudes through size 10, gaps
    through ZRL chains, refinement-only +-1s): decoded Y blocks must
    match the independent spec IDCT within the rounding tie."""
    from pdf_extract_spark.sources.media_corpus import make_jpeg_progressive

    grid, color, sub, ac, restart, split = _random_prog_case(seed)
    img = decode_jpeg(
        make_jpeg_progressive(
            grid, color=color, subsample420=sub, ac=ac,
            restart_interval=restart, band_split=split,
        )
    )
    rows, cols = len(grid), len(grid[0])
    assert img.shape == (rows * 8, cols * 8, 3)
    for r in range(rows):
        for c in range(cols):
            full = {0: (grid[r][c] - 128) * 8, **dict(ac.get((r, c), []))}
            want = _idct_ref(full)
            got = img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8, 0]
            assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all(), (
                seed, r, c, restart, split,
            )


def test_jpeg_422_subsampling_decodes_exactly():
    """4:2:2 (Y 2x1-sampled vs chroma — the classic digital-video layout)
    through the generic hmax/vmax upsampler: flat gray blocks decode to
    the exact grid values, including with restart markers."""
    grid = [[8, 48, 96, 248], [248, 96, 48, 8], [120, 136, 152, 168]]
    img = decode_jpeg(make_jpeg(grid, subsample="422"))
    h, w = len(grid) * 8, len(grid[0]) * 8
    assert img.shape == (h, w, 3)
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            blk = img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8]
            assert (blk == v).all(), (r, c, np.unique(blk))
    with_rst = decode_jpeg(make_jpeg(grid, subsample="422", restart_interval=2))
    assert (with_rst == img).all()


def test_jpeg_nontrivial_quant_table_dequantizes():
    """A DQT with DC step 16 forces the decoder's dequantize multiply to
    matter: quantized coefficients x16 must reconstruct the exact grid
    (values chosen so (v-128)*8 is divisible by 16, i.e. v even)."""
    grid = [[0, 64, 128, 254], [254, 128, 64, 0]]
    base = decode_jpeg(make_jpeg(grid))
    quant = decode_jpeg(make_jpeg(grid, dc_quant=16))
    assert (quant == base).all()
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            blk = quant[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8]
            assert (blk == v).all(), (r, c)
