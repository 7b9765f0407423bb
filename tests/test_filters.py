"""Unit tests for PDF stream filters (pdfmini.filters).

Mirrors the reference's reliance on lopdf filter decode + the raw-bytes
fallback on error (/root/reference/src/lib.rs:1255-1261).
"""

import zlib

from pdf_extract_spark.pdfmini.filters import (
    apply_predictor,
    ascii85_decode,
    asciihex_decode,
    decode_stream,
    flate_decode,
    lzw_decode,
    runlength_decode,
)


def test_flate_roundtrip():
    data = b"BT (hello) Tj ET" * 10
    assert flate_decode(zlib.compress(data)) == data


def test_asciihex():
    assert asciihex_decode(b"48 65 6c 6C 6f>") == b"Hello"
    # odd digit count -> padded with 0
    assert asciihex_decode(b"486>") == b"H`"


def test_ascii85():
    import base64

    for payload in [b"Hello, World!", b"x", b"ab", b"abc", b"abcd", b"\0\0\0\0"]:
        enc = base64.a85encode(payload)
        assert ascii85_decode(enc) == payload
    assert ascii85_decode(b"<~87cUR~>") == b"Hell"


def test_runlength():
    # literal run of 3 bytes, then 4x 'a', then EOD
    assert runlength_decode(b"\x02abc" + bytes([253]) + b"a" + b"\x80") == b"abcaaaa"


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Minimal LZW encoder (test-only) per PDF spec."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits = []

    def emit(code):
        out_bits.append((code, width))

    emit(256)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w = w + c
        else:
            emit(table[w])
            table[w + c] = next_code
            next_code += 1
            if next_code + early - 1 >= (1 << width) and width < 12:
                width += 1
            w = c
    if w:
        emit(table[w])
    emit(257)
    buf = 0
    nbits = 0
    out = bytearray()
    for code, cw in out_bits:
        buf = (buf << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip():
    for payload in [b"TOBEORNOTTOBEORTOBEORNOT", b"aaaaaaaaaaaaaaaaaaaaa", b"BT (x) Tj ET" * 40]:
        assert lzw_decode(_lzw_encode(payload)) == payload


def test_png_predictor_up():
    # two rows of 4 bytes, Up filter: row2 = stored + row1
    raw = bytes([2, 1, 1, 1, 1, 2, 1, 1, 1, 1])
    out = apply_predictor(raw, {"Predictor": 12, "Columns": 4})
    assert out == bytes([1, 1, 1, 1, 2, 2, 2, 2])


def test_decode_stream_error_falls_back_to_raw():
    bad = b"not really compressed"
    assert decode_stream(bad, "FlateDecode", None) == bad


def test_decode_stream_chain():
    data = b"chained"
    enc = zlib.compress(data).hex().encode() + b">"
    assert decode_stream(enc, ["ASCIIHexDecode", "FlateDecode"], None) == data
