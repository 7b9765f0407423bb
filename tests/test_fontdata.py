"""Full static font-data layer: AGL, ZapfDingbats names, encoding tables,
Base-14 AFM metrics (fontdata mirrors glyphnames.rs / zapfglyphnames.rs /
encodings.rs / core_fonts.rs — all public Adobe data)."""

from pdf_extract_spark.corefonts import CORE_FONT_NAMES, builtin_encoding_name, metrics
from pdf_extract_spark.encodings_data import (
    MAC_EXPERT_ENCODING,
    MAC_ROMAN_ENCODING,
    STANDARD_ENCODING,
    SYMBOL_ENCODING,
    WIN_ANSI_ENCODING,
    name_to_unicode,
    zapfdigbats_names_to_unicode,
)
from pdf_extract_spark.fontdata import AGL, ENCODING_NAMES, ZAPF_NAMES


def test_agl_is_complete():
    assert len(AGL) >= 4700
    # spot checks across script families the round-1 subset missed
    assert name_to_unicode("Alpha") == 0x0391
    assert name_to_unicode("omega") == 0x03C9
    assert name_to_unicode("afii10017") == 0x0410  # Cyrillic A
    assert name_to_unicode("afii57664") == 0x05D0  # Hebrew alef
    assert name_to_unicode("ffi") == 0xFB03
    assert name_to_unicode("Acircumflexdotbelow") == 0x1EAC
    assert name_to_unicode("nosuchglyphname") is None
    # algorithmic forms still work (AGL spec; reference table lacks them)
    assert name_to_unicode("uni0627") == 0x0627
    assert name_to_unicode("u1F600") == 0x1F600


def test_zapf_names_complete():
    assert len(ZAPF_NAMES) >= 200
    assert zapfdigbats_names_to_unicode("a1") == 0x2701
    assert zapfdigbats_names_to_unicode("a105") == 0x2710
    assert zapfdigbats_names_to_unicode("a191") == 0x27BE
    assert zapfdigbats_names_to_unicode("space") == 0x20
    assert zapfdigbats_names_to_unicode("a999") is None


def test_winansi_macroman_match_python_codecs():
    """The name-table-derived encodings must agree with Python's own codec
    data on the defined graphic range — two independent derivations of the
    same public data."""
    for i in range(256):
        try:
            cp = ord(bytes([i]).decode("cp1252"))
        except UnicodeDecodeError:
            continue
        if i < 0x20 or i in (0x7F, 0xA0, 0xAD):  # controls; nbsp->space,
            # soft-hyphen->hyphen in the reference table
            continue
        assert WIN_ANSI_ENCODING[i] == cp, hex(i)
    for i in range(0x20, 0xF0):  # 0xF0 = Apple logo (private use, not AGL)
        cp = ord(bytes([i]).decode("mac_roman"))
        if i in (0x7F, 0xBD, 0xDB) or cp == 0xA0:
            # DEL; nbsp -> 'space'; 0xBD: AGL canonicalizes Omega to OHM
            # SIGN U+2126; 0xDB: pre-1998 MacRoman 'currency' vs Euro
            continue
        got = MAC_ROMAN_ENCODING[i]
        if got != 0:
            assert got == cp, hex(i)


def test_encoding_tables_are_real():
    # MacExpert is no longer an all-zero stub
    assert MAC_EXPERT_ENCODING[0x30] == 0xF730  # zerooldstyle
    assert MAC_EXPERT_ENCODING[0x56] == 0xFB00  # ff
    assert sum(1 for v in MAC_EXPERT_ENCODING if v) > 100
    assert SYMBOL_ENCODING[0x61] == 0x03B1  # alpha
    assert STANDARD_ENCODING[0x27] == 0x2019  # quoteright
    assert STANDARD_ENCODING[0xAE] == 0xFB01  # fi
    assert len(ENCODING_NAMES) == 7


def test_afm_metrics_full():
    m = metrics()
    assert len(CORE_FONT_NAMES) == 14
    # full code ranges, not the ASCII subset
    assert len(m["Helvetica"]) >= 300
    assert len(m["Symbol"]) >= 180
    assert len(m["ZapfDingbats"]) >= 200
    helv = {c: (w, g) for c, w, g in m["Helvetica"]}
    assert helv[0x41] == (667.0, "A")  # Adobe Helvetica.afm
    # high-range WinAnsi-relevant glyphs present with code -1 (not encoded
    # in AdobeStandardEncoding) or real codes
    names = {g for _c, _w, g in m["Helvetica"]}
    assert "Euro" in names and "trademark" in names
    sym = {c: g for c, _w, g in m["Symbol"]}
    assert sym[0x61] == "alpha" and sym[0x22] == "universal"
    assert builtin_encoding_name("Symbol") == "FontSpecific"
    assert builtin_encoding_name("Helvetica") == "AdobeStandardEncoding"
    # every AFM glyph resolves through its name table — the reference
    # unwrap()s these (lib.rs:612/633), so a miss would be a crash
    for font, rows in m.items():
        for _c, _w, g in rows:
            if font == "ZapfDingbats":
                assert zapfdigbats_names_to_unicode(g) is not None, (font, g)
            else:
                assert name_to_unicode(g) is not None, (font, g)
