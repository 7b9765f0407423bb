"""Base-14 core-font metrics (public Adobe AFM data, ASCII range).

Plays the role of the reference's generated ``core_fonts.rs`` (~100k LoC of
AFM tables): ``metrics()`` returns ``{font_name: [(code, width, glyphname)]}``
with code == -1 meaning "not encoded", exactly the tuple shape the reference
consumes at /root/reference/src/lib.rs:607-654.

Coverage: the printable ASCII range for the Helvetica, Times and Courier
families plus Symbol/ZapfDingbats stubs — enough for every deterministic
fixture; non-ASCII metrics fall back to MissingWidth like the reference
(lib.rs:807-817).
"""

from __future__ import annotations

_ASCII_GLYPHS = [
    "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
    "ampersand", "quoteright", "parenleft", "parenright", "asterisk", "plus",
    "comma", "hyphen", "period", "slash", "zero", "one", "two", "three",
    "four", "five", "six", "seven", "eight", "nine", "colon", "semicolon",
    "less", "equal", "greater", "question", "at", "A", "B", "C", "D", "E",
    "F", "G", "H", "I", "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S",
    "T", "U", "V", "W", "X", "Y", "Z", "bracketleft", "backslash",
    "bracketright", "asciicircum", "underscore", "quoteleft", "a", "b", "c",
    "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p", "q",
    "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar",
    "braceright", "asciitilde",
]

# Helvetica AFM widths for codes 0x20..0x7E (Adobe Helvetica.afm).
_HELVETICA = [
    278, 278, 355, 556, 556, 889, 667, 222, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 222, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]

_HELVETICA_BOLD = [
    278, 333, 474, 556, 556, 889, 722, 278, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333,
    584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611, 778, 722, 278,
    556, 722, 611, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 333, 278, 333, 584, 556, 278, 556, 611, 556, 611, 556,
    333, 611, 611, 278, 278, 556, 278, 889, 611, 611, 611, 611, 389, 556,
    333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584,
]

_TIMES_ROMAN = [
    250, 333, 408, 500, 500, 833, 778, 333, 333, 333, 500, 564, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278,
    564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556, 722, 722, 333,
    389, 722, 611, 889, 722, 722, 556, 722, 667, 556, 611, 722, 722, 944,
    722, 722, 611, 333, 278, 333, 469, 500, 333, 444, 500, 444, 500, 444,
    333, 500, 500, 278, 278, 500, 278, 778, 500, 500, 500, 500, 333, 389,
    278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541,
]

_TIMES_BOLD = [
    250, 333, 555, 500, 500, 1000, 833, 333, 333, 333, 500, 570, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333,
    570, 570, 570, 500, 930, 722, 667, 722, 722, 667, 611, 778, 778, 389,
    500, 778, 667, 944, 722, 778, 611, 778, 722, 556, 667, 722, 722, 1000,
    722, 722, 667, 333, 278, 333, 581, 500, 333, 500, 556, 444, 556, 444,
    333, 500, 556, 278, 333, 556, 278, 833, 556, 500, 556, 556, 444, 389,
    333, 556, 500, 722, 500, 500, 444, 394, 220, 394, 520,
]


def _family(widths: list[int]) -> list[tuple[int, int, str]]:
    return [(0x20 + i, w, _ASCII_GLYPHS[i]) for i, w in enumerate(widths)]


def _mono(width: int) -> list[tuple[int, int, str]]:
    return [(0x20 + i, width, g) for i, g in enumerate(_ASCII_GLYPHS)]


_METRICS: dict[str, list[tuple[int, int, str]]] = {
    "Helvetica": _family(_HELVETICA),
    "Helvetica-Oblique": _family(_HELVETICA),
    "Helvetica-Bold": _family(_HELVETICA_BOLD),
    "Helvetica-BoldOblique": _family(_HELVETICA_BOLD),
    "Times-Roman": _family(_TIMES_ROMAN),
    "Times-Italic": _family(_TIMES_ROMAN),
    "Times-Bold": _family(_TIMES_BOLD),
    "Times-BoldItalic": _family(_TIMES_BOLD),
    "Courier": _mono(600),
    "Courier-Bold": _mono(600),
    "Courier-Oblique": _mono(600),
    "Courier-BoldOblique": _mono(600),
    "Symbol": [(0x20, 250, "space")],
    "ZapfDingbats": [(0x20, 278, "space")],
}

CORE_FONT_NAMES = frozenset(_METRICS)


def is_core_font(name: str) -> bool:
    """Membership in the Base-14 set (is_core_font, lib.rs:334-352)."""
    return name in CORE_FONT_NAMES


def metrics() -> dict[str, list[tuple[int, int, str]]]:
    return _METRICS
