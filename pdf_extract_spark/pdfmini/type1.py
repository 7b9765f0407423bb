"""Type1 font program encoding extraction.

Replaces the reference's ``type1-encoding-parser`` crate (used at
/root/reference/src/lib.rs:386-393): the /Encoding of a Type1 font program
lives in the CLEARTEXT portion (before the eexec-encrypted private part) as
either

    /Encoding StandardEncoding def
or
    /Encoding 256 array ... dup <code> /<glyphname> put ... readonly def

``get_encoding_map`` returns None for StandardEncoding (caller applies the
standard table) or a {code: glyph_name} dict for custom encodings.
"""

from __future__ import annotations

import re

_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/]+)\s+put")


def get_encoding_map(font_program: bytes) -> dict[int, str] | None:
    """Parse the cleartext /Encoding section of a Type1 font program.
    Returns {code: glyph_name}, or None when the program declares
    StandardEncoding (or no encoding section is found)."""
    # only the cleartext header matters; stop at eexec
    end = font_program.find(b"eexec")
    head = font_program[: end if end != -1 else len(font_program)]
    enc_pos = head.find(b"/Encoding")
    if enc_pos == -1:
        return None
    section = head[enc_pos:]
    # terminate at 'def' that closes the encoding
    def_pos = section.find(b" def")
    if def_pos != -1:
        section = section[: def_pos + 4]
    if b"StandardEncoding" in section[:64]:
        return None
    out: dict[int, str] = {}
    for m in _DUP_RE.finditer(section):
        code = int(m.group(1))
        if 0 <= code < 256:
            out[code] = m.group(2).decode("latin-1")
    return out or None
