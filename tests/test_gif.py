"""GIF first-frame decoder (operators/gif.py) vs the closed-form fixture
spec (sources/media_corpus.py:make_gif)."""

import numpy as np
import pytest

from pdf_extract_spark.operators.gif import decode_gif
from pdf_extract_spark.sources.media_corpus import GIF_SPECS, gif_gray, make_gif


@pytest.mark.parametrize("name,w,h,bits", GIF_SPECS)
def test_gif_specs_decode_exactly(name, w, h, bits):
    img = decode_gif(make_gif(w, h, bits))
    assert img.shape == (h, w, 3)
    expect = np.array(
        [[gif_gray(bits, x, y) for x in range(w)] for y in range(h)], dtype=np.uint8
    )
    assert (img == expect[:, :, None]).all()


def test_gif_extension_blocks_skipped():
    """89a graphic-control/comment extensions before the image block are
    skipped; the image still decodes."""
    base = make_gif(6, 4, 2)
    head, rest = base[:13 + 3 * 4], base[13 + 3 * 4:]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"          # graphic control
    comment = b"\x21\xfe\x05hello\x00"                  # comment extension
    img = decode_gif(head + gce + comment + rest)
    assert img.shape == (4, 6, 3)
    assert img[0, 1, 0] == gif_gray(2, 1, 0)


def test_gif_interlace_flag_permutes_rows():
    """Setting the interlace flag on an otherwise-unchanged stream must
    decode to the row-scattered image: stream row i lands at display row
    order[i] (h=4 -> stream order [0, 2, 1, 3])."""
    data = bytearray(make_gif(6, 4, 2))
    plain = decode_gif(make_gif(6, 4, 2))
    i = data.find(b"\x2c")
    data[i + 9] |= 0x40  # set interlace flag in the image descriptor
    inter = decode_gif(bytes(data))
    import numpy as np

    assert (inter == plain[np.argsort([0, 2, 1, 3], kind="stable")]).all()


def test_gif_garbage_raises():
    with pytest.raises(Exception):
        decode_gif(b"GIF89a" + b"\x00" * 6)


# ---------------------------------------------------------------------------
# Real LZW compression (make_gif_lzw): the 'uncompressed GIF' fixtures
# never emit dictionary codes, so the decoder's entry-reference,
# width-growth, KwKwK, and 4096-reset paths were reachable only by
# real-world files.  These fixtures exercise them with closed-form
# palette/index expectations.
# ---------------------------------------------------------------------------
import numpy as np


def _palette_gray(bits: int, i: int) -> int:
    n = 1 << bits
    return i * 255 // (n - 1)


def _expect_img(w, h, bits, indices):
    pal = np.array(
        [[_palette_gray(bits, i)] * 3 for i in range(1 << bits)], dtype=np.uint8
    )
    return pal[np.array(indices, dtype=np.int32)].reshape(h, w, 3)


@pytest.mark.parametrize("name,w,h,bits", GIF_SPECS)
def test_gif_lzw_matches_uncompressed(name, w, h, bits):
    """The LZW-compressed encoding of each spec pattern decodes to the
    same pixels as the uncompressed fixture — and is smaller."""
    from pdf_extract_spark.sources.media_corpus import make_gif_lzw

    a = decode_gif(make_gif(w, h, bits))
    b = decode_gif(make_gif_lzw(w, h, bits))
    assert (a == b).all(), name


def test_gif_lzw_kwkwk_run():
    """A constant-index image is the canonical KwKwK generator: the
    encoder emits a code the decoder has not yet inserted (code ==
    next_code), exercising the special-case branch."""
    from pdf_extract_spark.sources.media_corpus import make_gif_lzw

    for idx_val in (0, 1, 3):
        w, h = 37, 11
        img = decode_gif(make_gif_lzw(w, h, 2, indices=[idx_val] * (w * h)))
        assert (img == _palette_gray(2, idx_val)).all(), idx_val


def test_gif_lzw_dictionary_reset():
    """An 8-bit-palette image large enough to overflow the 4096-entry
    dictionary forces the encoder's CLEAR reset and the decoder's table
    rebuild mid-stream, with codes reaching the full 12-bit width."""
    from pdf_extract_spark.sources.media_corpus import make_gif_lzw

    rng = np.random.default_rng(99)
    w, h = 120, 80  # 9600 px of 256-color noise: > 4096 dictionary entries
    indices = rng.integers(0, 256, size=w * h).tolist()
    img = decode_gif(make_gif_lzw(w, h, 8, indices=indices))
    assert (img == _expect_img(w, h, 8, indices)).all()


@pytest.mark.parametrize("seed", range(30))
def test_gif_lzw_random_roundtrip(seed):
    """Randomized sweep: palette sizes 4-256, mixed noise/run content
    (runs breed dictionary hits and KwKwK; noise breeds growth)."""
    from pdf_extract_spark.sources.media_corpus import make_gif_lzw

    rng = np.random.default_rng(7700 + seed)
    bits = int(rng.choice([2, 3, 4, 8]))
    n = 1 << bits
    w, h = int(rng.integers(3, 60)), int(rng.integers(3, 40))
    total = w * h
    indices: list[int] = []
    while len(indices) < total:
        if rng.integers(0, 2):
            indices += [int(rng.integers(0, n))] * int(rng.integers(1, 20))
        else:
            indices += rng.integers(0, n, size=int(rng.integers(1, 15))).tolist()
    indices = indices[:total]
    img = decode_gif(make_gif_lzw(w, h, bits, indices=indices))
    assert (img == _expect_img(w, h, bits, indices)).all(), (seed, bits, w, h)


def test_gif_interlace_row_order_kat():
    """Hand-derived appendix-E order for h=10 (pass1: 0,8; pass2: 4;
    pass3: 2,6; pass4: 1,3,5,7,9) — pins the shared spec math
    independently of both encoder and decoder."""
    from pdf_extract_spark.operators.gif import _interlace_rows

    assert _interlace_rows(10).tolist() == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _interlace_rows(1).tolist() == [0]
    assert _interlace_rows(5).tolist() == [0, 4, 2, 1, 3]


@pytest.mark.parametrize("h", [1, 2, 3, 5, 8, 9, 16, 33])
def test_gif_interlaced_decodes_like_progressive(h):
    """An interlaced GIF must decode to the same pixels as its
    non-interlaced twin, for heights around every pass boundary."""
    from pdf_extract_spark.sources.media_corpus import make_gif_lzw

    w, bits = 11, 4
    rng = np.random.default_rng(h)
    indices = rng.integers(0, 16, size=w * h).tolist()
    plain = decode_gif(make_gif_lzw(w, h, bits, indices=indices))
    inter = decode_gif(make_gif_lzw(w, h, bits, indices=indices, interlace=True))
    assert (plain == inter).all()
    assert (plain == _expect_img(w, h, bits, indices)).all()
