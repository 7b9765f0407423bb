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


def test_jpeg_progressive_raises():
    data = bytearray(make_jpeg([[100]]))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_jpeg_garbage_raises():
    with pytest.raises(Exception):
        decode_jpeg(b"\xff\xd8\xff\xe0 garbage that is not a scan")
