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


def test_gif_interlaced_raises():
    data = bytearray(make_gif(6, 4, 2))
    i = data.find(b"\x2c")
    data[i + 9] |= 0x40  # set interlace flag in the image descriptor
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(data))


def test_gif_garbage_raises():
    with pytest.raises(Exception):
        decode_gif(b"GIF89a" + b"\x00" * 6)
