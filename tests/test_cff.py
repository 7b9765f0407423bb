"""CFF/Type1C parser (pdfmini.cff) — the FontFile3 encoding-extraction
path (lib.rs:406-442 via the cff-parser crate)."""

import pytest

from pdf_extract_spark.encodings_data import name_to_unicode
from pdf_extract_spark.fixtures import _build_type1c
from pdf_extract_spark.pdfmini.cff import (
    STANDARD_STRINGS,
    CffError,
    CffFont,
    type1c_unicode_map,
)


def test_standard_strings_shape():
    assert len(STANDARD_STRINGS) == 391
    assert STANDARD_STRINGS[0] == ".notdef"
    assert STANDARD_STRINGS[1] == "space"
    assert STANDARD_STRINGS[228] == "zcaron"
    assert STANDARD_STRINGS[229] == "exclamsmall"
    assert STANDARD_STRINGS[390] == "Semibold"
    # every real glyph name must resolve through the AGL (the synthetic
    # version/weight strings at the tail are not glyph names)
    synthetic = {".notdef", "001.000", "001.001", "001.002", "001.003",
                 "Black", "Bold", "Book", "Light", "Medium", "Regular",
                 "Roman", "Semibold"}
    for n in STANDARD_STRINGS:
        if n not in synthetic:
            assert name_to_unicode(n) is not None, n


def test_standard_strings_cover_standard_encoding():
    """Adobe StandardEncoding names (encodings.rs:776) all live in the
    first 229 standard strings — the CFF predefined-encoding contract."""
    from pdf_extract_spark.fontdata import ENCODING_NAMES

    first = set(STANDARD_STRINGS[:229])
    for g in ENCODING_NAMES["STANDARD_ENCODING"]:
        if g is not None:
            assert g in first, g


def test_parse_custom_charset_and_encoding():
    sid_b = STANDARD_STRINGS.index("b")
    cff = _build_type1c([(65, 391), (66, sid_b)], [b"Alpha"])
    font = CffFont(cff)
    assert font.n_glyphs == 3
    assert font.charset == [0, 391, sid_b]
    assert font.code_to_gid == {65: 1, 66: 2}
    assert font.code_to_sid_table() == {65: 391, 66: sid_b}
    assert font.string_by_id(391) == "Alpha"
    assert font.string_by_id(sid_b) == "b"
    m = type1c_unicode_map(cff)
    assert m == {65: "Α", 66: "b"}


def test_predefined_standard_encoding():
    """encoding offset 0 -> predefined Standard: codes resolve via the
    glyph NAMES present in the charset."""
    import struct

    sid_A = STANDARD_STRINGS.index("A")
    sid_q = STANDARD_STRINGS.index("quoteright")
    cff = _build_type1c([(0, sid_A), (0, sid_q)], [])
    # rewrite the Top DICT encoding operand to 0 (predefined Standard):
    # the builder wrote op29(enc_off) 0x10; find and zero it
    font0 = CffFont(cff)
    enc_off = int(font0.top[16][0])
    needle = b"\x1d" + struct.pack(">i", enc_off) + b"\x10"
    cff2 = cff.replace(needle, b"\x1d" + struct.pack(">i", 0) + b"\x10")
    font = CffFont(cff2)
    table = font.code_to_sid_table()
    assert table[ord("A")] == sid_A
    assert table[0x27] == sid_q  # quoteright at 0x27 in StandardEncoding
    m = type1c_unicode_map(cff2)
    assert m[ord("A")] == "A"
    assert m[0x27] == "’"


def test_cid_keyed_cff_rejected():
    sid_b = STANDARD_STRINGS.index("b")
    cff = _build_type1c([(65, sid_b)], [])
    # splice a ROS operator (12 30) into the Top DICT is intrusive; instead
    # check the error surface on garbage input
    with pytest.raises(CffError):
        CffFont(b"\x01\x00\x04\x01\x00")
    with pytest.raises(CffError):
        CffFont(b"")
    # valid font still parses
    assert CffFont(cff).n_glyphs == 2


def test_charset_format1_ranges():
    """Format-1 charset: consecutive SID runs."""
    import struct

    sid_a = STANDARD_STRINGS.index("a")
    cff = _build_type1c([(97, sid_a), (98, sid_a + 1), (99, sid_a + 2)], [])
    font0 = CffFont(cff)
    chs_off = int(font0.top[15][0])
    # replace format-0 charset (1 + 3*2 bytes) with format-1 (1 + 3 bytes)
    fmt0 = bytes([0]) + struct.pack(">HHH", sid_a, sid_a + 1, sid_a + 2)
    fmt1 = bytes([1]) + struct.pack(">H", sid_a) + bytes([2]) + b"\x00\x00\x00"
    assert cff[chs_off : chs_off + len(fmt0)] == fmt0
    assert len(fmt1) == len(fmt0)  # same length -> offsets unchanged
    cff2 = cff[:chs_off] + fmt1 + cff[chs_off + len(fmt0):]
    font = CffFont(cff2)
    assert font.charset == [0, sid_a, sid_a + 1, sid_a + 2]
    m = type1c_unicode_map(cff2)
    assert m == {97: "a", 98: "b", 99: "c"}


def test_cff_roundtrip_property():
    """Property: any (code, SID) assignment written by the builder parses
    back to the identical code->SID table and unicode map."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extract_spark.encodings_data import name_to_unicode

    # codes unique in [0,255]; SIDs drawn from real standard strings
    # (excluding .notdef) plus the custom-string range
    pairs_strategy = st.lists(
        st.tuples(st.integers(0, 255), st.integers(1, 390)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=30, deadline=None)
    @given(pairs_strategy)
    def check(pairs):
        cff = _build_type1c(pairs, [])
        font = CffFont(cff)
        assert font.n_glyphs == len(pairs) + 1
        assert font.code_to_sid_table() == dict(pairs)
        m = type1c_unicode_map(cff)
        for code, sid in pairs:
            uni = name_to_unicode(STANDARD_STRINGS[sid])
            if uni is not None:
                assert m[code] == chr(uni)

    check()
