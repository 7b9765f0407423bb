"""Static encoding & glyph-name data (public Adobe PDF-spec data).

Mirrors the role of the reference's generated tables
(/root/reference/src/encodings.rs, glyphnames.rs, zapfglyphnames.rs) without
transcribing them: tables are built programmatically from Python's own
codec data (cp1252 == WinAnsiEncoding, mac-roman == MacRomanEncoding for
the defined range) plus a compact Adobe-Glyph-List subset.

Conventions (parity with the reference):
  * an encoding is a 256-entry list of unicode codepoints; 0 == unmapped,
    and unmapped codes decode to U+0000 (to_utf8, lib.rs:163-172).
  * glyph-name lookup returns None when unknown (name_to_unicode,
    glyphnames.rs:6-7).
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# PDFDocEncoding (PDF 1.7 Annex D.2; same values as lib.rs:121-150)
# --------------------------------------------------------------------------

PDF_DOC_ENCODING: list[int] = list(range(0x18)) + [
    0x02D8, 0x02C7, 0x02C6, 0x02D9, 0x02DD, 0x02DB, 0x02DA, 0x02DC,  # 18-1f
]
PDF_DOC_ENCODING += list(range(0x20, 0x7F))  # 20-7e ascii
PDF_DOC_ENCODING += [0x0000]  # 7f
PDF_DOC_ENCODING += [
    0x2022, 0x2020, 0x2021, 0x2026, 0x2014, 0x2013, 0x0192, 0x2044,  # 80-87
    0x2039, 0x203A, 0x2212, 0x2030, 0x201E, 0x201C, 0x201D, 0x2018,  # 88-8f
    0x2019, 0x201A, 0x2122, 0xFB01, 0xFB02, 0x0141, 0x0152, 0x0160,  # 90-97
    0x0178, 0x017D, 0x0131, 0x0142, 0x0153, 0x0161, 0x017E, 0x0000,  # 98-9f
    0x20AC,                                                          # a0
]
PDF_DOC_ENCODING += list(range(0xA1, 0xAD)) + [0x0000] + list(range(0xAE, 0x100))
assert len(PDF_DOC_ENCODING) == 256


def _codec_table(codec: str) -> list[int]:
    out = []
    for i in range(256):
        try:
            ch = bytes([i]).decode(codec)
            out.append(ord(ch))
        except UnicodeDecodeError:
            out.append(0)
    return out


# WinAnsiEncoding == Windows code page 1252 on the defined range.
WIN_ANSI_ENCODING: list[int] = _codec_table("cp1252")
# PDF readers conventionally treat undefined WinAnsi high codes as bullets;
# keep 0 (unmapped) to match the reference's encodings.rs (None -> 0).

# MacRomanEncoding == Mac OS Roman on the defined range.
MAC_ROMAN_ENCODING: list[int] = _codec_table("mac_roman")

# StandardEncoding (Adobe standard Latin; PDF 1.7 Annex D.2).
STANDARD_ENCODING: list[int] = [0] * 256
for _i in range(0x20, 0x7F):
    STANDARD_ENCODING[_i] = _i
STANDARD_ENCODING[0x27] = 0x2019  # quoteright
STANDARD_ENCODING[0x60] = 0x2018  # quoteleft
for _code, _cp in {
    0xA1: 0x00A1, 0xA2: 0x00A2, 0xA3: 0x00A3, 0xA4: 0x2044, 0xA5: 0x00A5,
    0xA6: 0x0192, 0xA7: 0x00A7, 0xA8: 0x00A4, 0xA9: 0x0027, 0xAA: 0x201C,
    0xAB: 0x00AB, 0xAC: 0x2039, 0xAD: 0x203A, 0xAE: 0xFB01, 0xAF: 0xFB02,
    0xB1: 0x2013, 0xB2: 0x2020, 0xB3: 0x2021, 0xB4: 0x00B7, 0xB6: 0x00B6,
    0xB7: 0x2022, 0xB8: 0x201A, 0xB9: 0x201E, 0xBA: 0x201D, 0xBB: 0x00BB,
    0xBC: 0x2026, 0xBD: 0x2030, 0xBF: 0x00BF, 0xC1: 0x0060, 0xC2: 0x00B4,
    0xC3: 0x02C6, 0xC4: 0x02DC, 0xC5: 0x00AF, 0xC6: 0x02D8, 0xC7: 0x02D9,
    0xC8: 0x00A8, 0xCA: 0x02DA, 0xCB: 0x00B8, 0xCD: 0x02DD, 0xCE: 0x02DB,
    0xCF: 0x02C7, 0xD0: 0x2014, 0xE1: 0x00C6, 0xE3: 0x00AA, 0xE8: 0x0141,
    0xE9: 0x00D8, 0xEA: 0x0152, 0xEB: 0x00BA, 0xF1: 0x00E6, 0xF5: 0x0131,
    0xF8: 0x0142, 0xF9: 0x00F8, 0xFA: 0x0153, 0xFB: 0x00DF,
}.items():
    STANDARD_ENCODING[_code] = _cp

# MacExpertEncoding: specialist glyphs (small caps, fractions) — rarely
# carries text semantics; expose an empty table like an all-None row.
MAC_EXPERT_ENCODING: list[int] = [0] * 256

NAMED_ENCODINGS = {
    "WinAnsiEncoding": WIN_ANSI_ENCODING,
    "MacRomanEncoding": MAC_ROMAN_ENCODING,
    "MacExpertEncoding": MAC_EXPERT_ENCODING,
    "StandardEncoding": STANDARD_ENCODING,
    "PDFDocEncoding": PDF_DOC_ENCODING,
}

# --------------------------------------------------------------------------
# Adobe Glyph List subset (public AGL data).  name_to_unicode() extends it
# with the algorithmic uniXXXX / uXXXX[XX] forms from the AGL specification.
# --------------------------------------------------------------------------

_ASCII_NAMES = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
    "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40,
    "bracketleft": 0x5B, "backslash": 0x5C, "bracketright": 0x5D,
    "asciicircum": 0x5E, "underscore": 0x5F, "grave": 0x60,
    "braceleft": 0x7B, "bar": 0x7C, "braceright": 0x7D, "asciitilde": 0x7E,
}

_EXTRA_NAMES = {
    "quoteright": 0x2019, "quoteleft": 0x2018, "quotedblleft": 0x201C,
    "quotedblright": 0x201D, "quotesinglbase": 0x201A, "quotedblbase": 0x201E,
    "endash": 0x2013, "emdash": 0x2014, "bullet": 0x2022, "dagger": 0x2020,
    "daggerdbl": 0x2021, "ellipsis": 0x2026, "perthousand": 0x2030,
    "guilsinglleft": 0x2039, "guilsinglright": 0x203A, "fraction": 0x2044,
    "florin": 0x0192, "fi": 0xFB01, "fl": 0xFB02, "minus": 0x2212,
    "trademark": 0x2122, "Euro": 0x20AC, "dotlessi": 0x0131,
    "Lslash": 0x0141, "lslash": 0x0142, "OE": 0x0152, "oe": 0x0153,
    "Scaron": 0x0160, "scaron": 0x0161, "Ydieresis": 0x0178,
    "Zcaron": 0x017D, "zcaron": 0x017E, "circumflex": 0x02C6,
    "caron": 0x02C7, "breve": 0x02D8, "dotaccent": 0x02D9, "ring": 0x02DA,
    "ogonek": 0x02DB, "tilde": 0x02DC, "hungarumlaut": 0x02DD,
    "exclamdown": 0x00A1, "cent": 0x00A2, "sterling": 0x00A3,
    "currency": 0x00A4, "yen": 0x00A5, "brokenbar": 0x00A6,
    "section": 0x00A7, "dieresis": 0x00A8, "copyright": 0x00A9,
    "ordfeminine": 0x00AA, "guillemotleft": 0x00AB, "logicalnot": 0x00AC,
    "registered": 0x00AE, "macron": 0x00AF, "degree": 0x00B0,
    "plusminus": 0x00B1, "acute": 0x00B4, "mu": 0x00B5,
    "paragraph": 0x00B6, "periodcentered": 0x00B7, "cedilla": 0x00B8,
    "ordmasculine": 0x00BA, "guillemotright": 0x00BB,
    "onequarter": 0x00BC, "onehalf": 0x00BD, "threequarters": 0x00BE,
    "questiondown": 0x00BF, "multiply": 0x00D7, "divide": 0x00F7,
    "AE": 0x00C6, "ae": 0x00E6, "Oslash": 0x00D8, "oslash": 0x00F8,
    "Thorn": 0x00DE, "thorn": 0x00FE, "Eth": 0x00D0, "eth": 0x00F0,
    "germandbls": 0x00DF, "onesuperior": 0x00B9, "twosuperior": 0x00B2,
    "threesuperior": 0x00B3,
}

# Latin letters with diacritics: generate from base+accent name pairs.
_ACCENTS = {
    "grave": {"A": 0xC0, "E": 0xC8, "I": 0xCC, "O": 0xD2, "U": 0xD9,
              "a": 0xE0, "e": 0xE8, "i": 0xEC, "o": 0xF2, "u": 0xF9},
    "acute": {"A": 0xC1, "E": 0xC9, "I": 0xCD, "O": 0xD3, "U": 0xDA,
              "Y": 0xDD, "a": 0xE1, "e": 0xE9, "i": 0xED, "o": 0xF3,
              "u": 0xFA, "y": 0xFD},
    "circumflex": {"A": 0xC2, "E": 0xCA, "I": 0xCE, "O": 0xD4, "U": 0xDB,
                   "a": 0xE2, "e": 0xEA, "i": 0xEE, "o": 0xF4, "u": 0xFB},
    "tilde": {"A": 0xC3, "N": 0xD1, "O": 0xD5,
              "a": 0xE3, "n": 0xF1, "o": 0xF5},
    "dieresis": {"A": 0xC4, "E": 0xCB, "I": 0xCF, "O": 0xD6, "U": 0xDC,
                 "a": 0xE4, "e": 0xEB, "i": 0xEF, "o": 0xF6, "u": 0xFC,
                 "y": 0xFF},
    "ring": {"A": 0xC5, "a": 0xE5},
    "cedilla": {"C": 0xC7, "c": 0xE7},
}

GLYPH_TO_UNICODE: dict[str, int] = {}
GLYPH_TO_UNICODE.update(_ASCII_NAMES)
GLYPH_TO_UNICODE.update(_EXTRA_NAMES)
for _c in range(ord("A"), ord("Z") + 1):
    GLYPH_TO_UNICODE[chr(_c)] = _c
for _c in range(ord("a"), ord("z") + 1):
    GLYPH_TO_UNICODE[chr(_c)] = _c
for _accent, _pairs in _ACCENTS.items():
    for _base, _cp in _pairs.items():
        GLYPH_TO_UNICODE[_base + _accent] = _cp
GLYPH_TO_UNICODE[".notdef"] = 0


def name_to_unicode(name: str) -> int | None:
    """Glyph name -> codepoint (glyphnames::name_to_unicode semantics:
    None when unknown).  Handles AGL algorithmic forms uniXXXX and uXXXX+."""
    hit = GLYPH_TO_UNICODE.get(name)
    if hit is not None:
        return hit
    base = name.split(".", 1)[0]  # glyph variants like 'a.sc'
    if base != name:
        hit = GLYPH_TO_UNICODE.get(base)
        if hit is not None:
            return hit
        name = base
    if name.startswith("uni") and len(name) >= 7:
        try:
            return int(name[3:7], 16)
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return int(name[1:], 16)
        except ValueError:
            return None
    if name.startswith("cid") and name[3:].isdigit():
        return None
    return None


# ZapfDingbats glyph names: 'a1'..'a191' map into U+2700 block (public
# zapfdingbats AGL list); algorithmic subset sufficient for the aN names.
_ZAPF_BASE = {
    "a1": 0x2701, "a2": 0x2702, "a3": 0x2703, "a4": 0x2704, "a5": 0x260E,
    "a6": 0x2706, "a7": 0x2707, "a8": 0x2708, "a9": 0x2709, "a10": 0x261B,
    "space": 0x20,
}


def zapfdigbats_names_to_unicode(name: str) -> int | None:
    return _ZAPF_BASE.get(name)


def encoding_to_unicode_table(name: str) -> list[int]:
    """Named base encoding -> 256-entry table (lib.rs:354-365)."""
    table = NAMED_ENCODINGS.get(name)
    if table is None:
        raise KeyError(f"unexpected encoding {name}")
    return list(table)


def to_utf8(encoding: list[int], s: bytes) -> str:
    """Decode a byte string through a 256-entry table; UTF-16BE when BOM'd
    (to_utf8, lib.rs:163-172). Unmapped codes become U+0000, as in the
    reference."""
    if len(s) > 2 and s[0] == 0xFE and s[1] == 0xFF:
        return s[2:].decode("utf-16-be", "replace")
    return "".join(chr(encoding[b]) for b in s)


def pdf_to_utf8(s: bytes) -> str:
    """PDFDocEncoding (or BOM'd UTF-16BE) byte string -> str
    (pdf_to_utf8, lib.rs:152-161)."""
    return to_utf8(PDF_DOC_ENCODING, s)
