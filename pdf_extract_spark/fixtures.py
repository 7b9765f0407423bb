"""Deterministic synthetic PDF fixtures + golden outputs.

The reference's test corpus is remote (.pdf.link files,
/root/reference/tests/docs/) and unavailable offline; each fixture here
covers the same code path (FIXTURES.md §3) with a tiny valid PDF built
from scratch.  Goldens are hand-derived from the PlainTextOutput
heuristics (lib.rs:2161-2190) — NOT produced by running our engine — so
the span-equality tests are a real oracle.

All fixtures are pure functions of their arguments: seed-free, byte-stable.
"""

from __future__ import annotations

import zlib

# --------------------------------------------------------------------------
# Minimal PDF writer
# --------------------------------------------------------------------------


class PdfBuilder:
    def __init__(self):
        self.objects: list[bytes] = []  # 1-based object bodies

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def add_stream(self, dict_entries: str, data: bytes, compress: bool = False,
                   filt: str | None = None) -> int:
        if compress:
            data = zlib.compress(data)
            filt = "/FlateDecode"
        f = f" /Filter {filt}" if filt else ""
        body = (
            f"<< {dict_entries} /Length {len(data)}{f} >>\nstream\n".encode("latin-1")
            + data
            + b"\nendstream"
        )
        return self.add(body)

    def build(self, root: int, extra_trailer: str = "") -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xc7\xec\x8f\xa2\n")
        offsets = [0]
        for i, body in enumerate(self.objects, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.objects) + 1
        out += f"xref\n0 {n}\n".encode("latin-1")
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode("latin-1")
        out += (
            f"trailer\n<< /Size {n} /Root {root} 0 R {extra_trailer} >>\n"
            f"startxref\n{xref_pos}\n%%EOF"
        ).encode("latin-1")
        return bytes(out)


def _simple_doc(pages: list[tuple[bytes, str]], compress=False) -> bytes:
    """pages: list of (content_bytes, resources_dict_src). Shared catalog."""
    b = PdfBuilder()
    page_refs = []
    pages_obj_num = 2 * len(pages) + 1  # content+page per page, then Pages
    kids = " ".join(f"{2 * i + 2} 0 R" for i in range(len(pages)))
    for content, res in pages:
        c = b.add_stream("", content, compress=compress)
        p = b.add(
            (
                f"<< /Type /Page /Parent {pages_obj_num} 0 R /Resources {res} >>"
            ).encode("latin-1")
        )
        page_refs.append(p)
    pages_obj = b.add(
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} "
            f"/MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    assert pages_obj == pages_obj_num
    # wire Contents into pages (rebuild page bodies with content refs)
    for i, (content, res) in enumerate(pages):
        cref = 2 * i + 1
        pref = cref + 1
        b.objects[pref - 1] = (
            f"<< /Type /Page /Parent {pages_obj} 0 R /Contents {cref} 0 R "
            f"/Resources {res} >>"
        ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages_obj} 0 R >>".encode("latin-1"))
    return b.build(catalog)


_HELV = "<< /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >>"


# --------------------------------------------------------------------------
# Fixture families: each returns (pdf_bytes, expected_text)
# --------------------------------------------------------------------------


def fx_simple_tj() -> tuple[bytes, str]:
    content = b"BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 Td (Second line) Tj ET"
    # begin: |y-0|=72>18 -> \n ; x<100000 and 72>6 -> \n ; line 2: dy=14, not
    # >18; x back left and 14>6 -> \n
    return _simple_doc([(content, f"<< /Font {_HELV} >>")]), "\n\nHello World\nSecond line"


def fx_tj_kerning() -> tuple[bytes, str]:
    # kern -130 => tx=+1.56 > 0.1*12=1.2 -> heuristic space; -80 => 0.96 -> none
    content = b"BT /F1 12 Tf 72 720 Td [(AV) -130 (Word) -80 (Glue)] TJ ET"
    return _simple_doc([(content, f"<< /Font {_HELV} >>")]), "\n\nAV WordGlue"


def fx_multiline() -> tuple[bytes, str]:
    # TL/T* line stepping + a Tm reset; also a blank-ish big jump (> 1.5 tfs
    # fires once, plus moved-left rule) producing a double newline
    content = (
        b"BT /F1 10 Tf 14 TL 72 700 Td (alpha) Tj T* (beta) Tj "
        b"1 0 0 1 72 600 Tm (gamma) Tj ET"
    )
    # alpha: \n\n ; beta: dy=14<=15 no rule1, moved-left dy>5 -> \n ;
    # gamma: dy=86>15 -> \n, moved-left -> \n  (two newlines)
    return _simple_doc([(content, f"<< /Font {_HELV} >>")]), "\n\nalpha\nbeta\n\ngamma"


def fx_widths_custom() -> tuple[bytes, str]:
    # Widths override core metrics (lib.rs:575-584); widths=0 for 'V' makes
    # the next string NOT advance past it, then explicit Td gap -> space
    font = (
        "<< /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/FirstChar 65 /LastChar 90 /Widths [500 500 500 500 500 500 500 500 "
        "500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 "
        "500] >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (AB) Tj 20 0 Td (CD) Tj ET"
    # AB: advance 2*6 = 12; CD starts at 72+20=92 > 72+12+1.2 -> space
    return _simple_doc([(content, f"<< /Font {font} >>")]), "\n\nAB CD"


def fx_missing_widths() -> tuple[bytes, str]:
    # Non-core font, no Widths: width map empty, missing_width=0 (the
    # reference's Helvetica substitute name is computed but unused,
    # lib.rs:586-608) -> zero advances, no heuristic spaces
    font = "<< /F1 << /Type /Font /Subtype /TrueType /BaseFont /FooSans >> >>"
    content = b"BT /F1 12 Tf 72 720 Td (ABC) Tj ET"
    return _simple_doc([(content, f"<< /Font {font} >>")]), "\n\nABC"


def fx_embedded_core_font() -> tuple[bytes, str]:
    # Core font WITH explicit widths+descriptor (embeded-core-fonts.pdf.link
    # path): explicit Widths preferred over AFM (lib.rs:575-584)
    font = (
        "<< /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/FirstChar 32 /LastChar 122 /Widths ["
        + " ".join(["600"] * 91)
        + "] >> >>"
    )
    content = b"BT /F1 10 Tf 72 720 Td (mono ish) Tj ET"
    return _simple_doc([(content, f"<< /Font {font} >>")]), "\n\nmono ish"


def fx_encoding_differences() -> tuple[bytes, str]:
    font = (
        "<< /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/Encoding << /BaseEncoding /WinAnsiEncoding "
        "/Differences [65 /ydieresis 66 /emdash] >> >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (ABC) Tj ET"
    return _simple_doc([(content, f"<< /Font {font} >>")]), "\n\nÿ—C"


def fx_winansi_truetype() -> tuple[bytes, str]:
    font = "<< /F1 << /Type /Font /Subtype /TrueType /BaseFont /Arial >> >>"
    content = b"BT /F1 12 Tf 72 720 Td (A\x80B) Tj ET"  # 0x80 -> Euro in cp1252
    return _simple_doc([(content, f"<< /Font {font} >>")]), "\n\nA€B"


def fx_tounicode_cmap() -> tuple[bytes, str]:
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange <00> <ff> endcodespacerange\n"
        b"1 beginbfchar <41> <0048> endbfchar\n"
        b"1 beginbfrange <42> <43> <0065> endbfrange\n"
        b"endcmap end\n"
    )
    b = PdfBuilder()
    cm = b.add_stream("", cmap)
    c = b.add_stream("", b"BT /F1 12 Tf 72 720 Td (ABC) Tj ET")
    font = b.add(
        (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/ToUnicode {cm} 0 R >>"
        ).encode("latin-1")
    )
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    # A->H (bfchar), B->e, C->f (bfrange)
    return b.build(catalog), "\n\nHef"


def fx_cid_identity_h() -> tuple[bytes, str]:
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
        b"1 beginbfrange <0041> <005a> <0041> endbfrange\n"
        b"endcmap\n"
    )
    b = PdfBuilder()
    cm = b.add_stream("", cmap)
    desc = b.add(b"<< /Type /FontDescriptor /FontName /Fake /Flags 4 >>")
    cidfont = b.add(
        (
            f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
            f"/FontDescriptor {desc} 0 R /DW 500 "
            # W: array form for cids 65,66 = 600,700; range form 100..120
            # 800 is the reference's silently-dropped quirk (lib.rs:1026-28)
            f"/W [65 [600 700] 100 120 800] "
            f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            f"/Supplement 0 >> >>"
        ).encode("latin-1")
    )
    font = b.add(
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
            f"/Encoding /Identity-H /DescendantFonts [{cidfont} 0 R] "
            f"/ToUnicode {cm} 0 R >>"
        ).encode("latin-1")
    )
    # 2-byte codes: A B d (0x0064 -> cid 100: in the DROPPED range -> DW)
    content = b"BT /F1 12 Tf 72 720 Td <004100420064> Tj ET"
    c = b.add_stream("", content)
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    # bfrange maps 0x41..0x5a -> A..Z; 0x64 unmapped -> "" (silent drop,
    # lib.rs:1087)
    return b.build(catalog), "\n\nAB"


def fx_rotated_text() -> tuple[bytes, str]:
    # 90-degree Tm: transformed font size = sqrt(negative) = NaN -> every
    # heuristic comparison false -> no whitespace at all (lib.rs:2163-2177)
    content = b"BT /F1 12 Tf 0 1 -1 0 300 300 Tm (Rot) Tj ET"
    return _simple_doc([(content, f"<< /Font {_HELV} >>")]), "Rot"


def fx_xobject_form() -> tuple[bytes, tuple[str, list[str]]]:
    """Returns (pdf, (expected_text, expected_media_refs))."""
    b = PdfBuilder()
    img = b.add_stream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 2 /ColorSpace "
        "/DeviceGray /BitsPerComponent 8",
        b"\x00\x40\x80\xff",
    )
    inner = b"BT /F1 12 Tf 72 600 Td (inner) Tj ET"
    # the form's own /F1 resolves via ITS resources (lib.rs:1860-1869)
    form_res = (
        "<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        ">> >> >>"
    )
    form = b.add_stream(
        f"/Type /XObject /Subtype /Form /BBox [0 0 612 792] /Resources {form_res}",
        inner,
    )
    content = (
        b"BT /F1 12 Tf 72 720 Td (outer) Tj ET q 100 0 0 100 72 500 cm /Im1 Do Q /Fm1 Do"
    )
    c = b.add_stream("", content)
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    res = (
        "<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> "
        f"/XObject << /Im1 {img} 0 R /Fm1 {form} 0 R >> >>"
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R /Resources {res} >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    # outer at y'=72; inner at y'=192: dy=120>18 -> \n, moved-left -> \n
    return b.build(catalog), ("\n\nouter\n\ninner", ["Im1"])


def fx_flate_stream() -> tuple[bytes, str]:
    content = b"BT /F1 12 Tf 72 720 Td (compressed) Tj ET"
    return _simple_doc([(content, f"<< /Font {_HELV} >>")], compress=True), "\n\ncompressed"


def fx_asciihex_stream() -> tuple[bytes, str]:
    content = b"BT /F1 12 Tf 72 720 Td (hexed) Tj ET"
    hexed = content.hex().encode("ascii") + b">"
    b = PdfBuilder()
    c = b.add_stream("", hexed, filt="/ASCIIHexDecode")
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font {_HELV} >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\nhexed"


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Minimal LZW encoder (writer-side; PDF spec §7.4.4 semantics)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits = [(256, width)]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w = w + c
        else:
            out_bits.append((table[w], width))
            if next_code >= 4096:
                # 12-bit table full: emit a clear code and restart (spec
                # requires the encoder to clear before the table overflows).
                out_bits.append((256, width))
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            else:
                table[w + c] = next_code
                next_code += 1
                if next_code + early - 1 >= (1 << width) and width < 12:
                    width += 1
            w = c
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))
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


def fx_lzw_stream() -> tuple[bytes, str]:
    content = b"BT /F1 12 Tf 72 720 Td (lzw coded) Tj ET"
    b = PdfBuilder()
    c = b.add_stream("", lzw_encode(content), filt="/LZWDecode")
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font {_HELV} >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\nlzw coded"


def fx_cid_embedded_cmap() -> tuple[bytes, str]:
    """Type0 font with an EMBEDDED CMap stream (not Identity-H): 1-byte
    codespace, cidrange remap code+100 (the reference ADDS dst_CID_lo,
    lib.rs:1075), ToUnicode keyed by the remapped CID."""
    encoding_cmap = (
        b"begincmap\n"
        b"1 begincodespacerange <00> <ff> endcodespacerange\n"
        b"1 begincidrange <41> <5a> 100 endcidrange\n"
        b"endcmap\n"
    )
    # code 0x41 -> cid 0x41+100 = 165; ToUnicode: 165(<00a5>) -> 'Q'
    tounicode = (
        b"begincmap\n"
        b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
        b"1 beginbfchar <00a5> <0051> endbfchar\n"
        b"endcmap\n"
    )
    b = PdfBuilder()
    enc = b.add_stream("", encoding_cmap)
    tu = b.add_stream("", tounicode)
    desc = b.add(b"<< /Type /FontDescriptor /FontName /FakeCID /Flags 4 >>")
    cidfont = b.add(
        (
            f"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /FakeCID "
            f"/FontDescriptor {desc} 0 R /DW 600 /W [165 [500]] "
            f"/CIDSystemInfo << /Registry (T) /Ordering (T) /Supplement 0 >> >>"
        ).encode("latin-1")
    )
    font = b.add(
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /FakeCID "
            f"/Encoding {enc} 0 R /DescendantFonts [{cidfont} 0 R] "
            f"/ToUnicode {tu} 0 R >>"
        ).encode("latin-1")
    )
    c = b.add_stream("", b"BT /F1 12 Tf 72 720 Td (A) Tj ET")
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\nQ"


def fx_type3_font() -> tuple[bytes, str]:
    """Type3 font: Differences-only encoding, required Widths
    (lib.rs:693-765); glyph drawing procs are irrelevant to text."""
    b = PdfBuilder()
    proc = b.add_stream("", b"720 0 d0")
    font = b.add(
        (
            f"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 720 720] "
            f"/FontMatrix [0.001 0 0 0.001 0 0] "
            f"/CharProcs << /glyphA {proc} 0 R >> "
            f"/Encoding << /Differences [65 /A 66 /B] >> "
            f"/FirstChar 65 /LastChar 66 /Widths [720 680] >>"
        ).encode("latin-1")
    )
    c = b.add_stream("", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\nAB"


def fx_type1_embedded_encoding() -> tuple[bytes, str]:
    """Type1 font with NO /Encoding dict: the builtin encoding comes from
    the embedded font program's cleartext dup/put table (the
    type1-encoding-parser path, lib.rs:386-395 + 546-556)."""
    font_program = (
        b"%!PS-AdobeFont-1.0: TestFont\n"
        b"/FontName /TestFont def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        b"dup 65 /emdash put\n"
        b"dup 66 /B put\n"
        b"dup 67 /ydieresis put\n"
        b"readonly def\n"
        b"currentdict end\n"
        b"currentfile eexec\n" + b"\x00" * 32
    )
    b = PdfBuilder()
    ff = b.add_stream("/Length1 100 /Length2 32 /Length3 0", font_program)
    desc = b.add(
        (
            f"<< /Type /FontDescriptor /FontName /TestFont /Flags 4 "
            f"/FontFile {ff} 0 R >>"
        ).encode("latin-1")
    )
    font = b.add(
        (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /TestFont "
            f"/FontDescriptor {desc} 0 R "
            f"/FirstChar 65 /LastChar 67 /Widths [500 500 500] >>"
        ).encode("latin-1")
    )
    c = b.add_stream("", b"BT /F1 12 Tf 72 720 Td (ABC) Tj ET")
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    # 65->emdash, 66->B, 67->ydieresis via the font program's encoding
    return b.build(catalog), "\n\n—Bÿ"


def fx_multipage() -> tuple[bytes, str]:
    p1 = b"BT /F1 12 Tf 72 720 Td (page one) Tj ET"
    p2 = b"BT /F1 12 Tf 72 720 Td (page two) Tj ET"
    res = f"<< /Font {_HELV} >>"
    # page 2 starts at same position; last_y carries across pages (device
    # state persists, lib.rs:2140 object reused) -> dy=0, but x < last_end
    # fails rule2 (dy=0 < 6) -> NO newline between pages, and
    # x(72) > last_end? no -> chars run together
    return _simple_doc([(p1, res), (p2, res)]), "\n\npage onepage two"


def fx_word_spacing() -> tuple[bytes, str]:
    # Tw applies to byte 32 only (lib.rs:1306-1312): affects geometry not
    # content (space char still written once)
    content = b"BT /F1 12 Tf 72 720 Td 5 Tw (a b) Tj ET"
    return _simple_doc([(content, f"<< /Font {_HELV} >>")]), "\n\na b"


def fx_char_spacing_gap() -> tuple[bytes, str]:
    # Tc widens every advance; between two Tj strings the gap exceeds
    # 0.1*tfs so a heuristic space appears
    content = b"BT /F1 12 Tf 72 720 Td 2 Tc (ab) Tj (cd) Tj ET"
    # after (ab): last_end = x_b + w_b*12; next x starts at last advance
    # incl. +2pt spacing -> x - last_end = 2 > 1.2 -> space
    return _simple_doc([(content, f"<< /Font {_HELV} >>")]), "\n\nab cd"


def _encrypted_doc(cfm: str) -> tuple[bytes, str]:
    """One-page encrypted PDF (empty user password), RC4 (V2/R3) or
    AESV2 (V4/R4) — covers the reference's maybe_decrypt path
    (lib.rs:2230-2244)."""
    from .pdfmini.crypt import (
        aes_cbc_encrypt,
        compute_file_key,
        compute_owner_value,
        compute_user_value,
        rc4,
    )
    import hashlib
    import struct

    doc_id = bytes(range(16))
    p = -1
    r = 3 if cfm == "V2" else 4
    n = 16
    o = compute_owner_value(r=r, n=n)
    key = compute_file_key(b"", o, p, doc_id, r=r, n=n)
    u = compute_user_value(key, doc_id, r=r)

    def obj_key(num: int, gen: int = 0) -> bytes:
        h = hashlib.md5()
        h.update(key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if cfm == "AESV2":
            h.update(b"sAlT")
        return h.digest()[: min(n + 5, 16)]

    def enc(num: int, data: bytes) -> bytes:
        if cfm == "AESV2":
            return aes_cbc_encrypt(obj_key(num), bytes(range(16)), data)
        return rc4(obj_key(num), data)

    content = b"BT /F1 12 Tf 72 720 Td (secret text) Tj ET"
    b = PdfBuilder()
    c = b.add_stream("", enc(1, content))  # content stream = obj 1
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font {_HELV} >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    if cfm == "V2":
        enc_body = (
            f"<< /Filter /Standard /V 2 /R 3 /Length 128 /P {p} "
            f"/O <{o.hex()}> /U <{u.hex()}> >>"
        )
    else:
        enc_body = (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {p} "
            f"/O <{o.hex()}> /U <{u.hex()}> "
            f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            f"/StmF /StdCF /StrF /StdCF >>"
        )
    enc_obj = b.add(enc_body.encode("latin-1"))
    pdf = b.build(
        catalog,
        extra_trailer=f"/Encrypt {enc_obj} 0 R /ID [<{doc_id.hex()}> <{doc_id.hex()}>]",
    )
    return pdf, "\n\nsecret text"


def _build_type1c(code_gid_sids: list[tuple[int, int]], custom_strings: list[bytes]) -> bytes:
    """Minimal CFF/Type1C font program: header, Name INDEX, Top DICT,
    String INDEX, empty GSubr INDEX, then charset (format 0), encoding
    (format 0) and stub CharStrings.  code_gid_sids: [(code, sid)] for
    GIDs 1..n in order."""
    import struct as _struct

    def index(items: list[bytes]) -> bytes:
        if not items:
            return _struct.pack(">H", 0)
        offs = [1]
        for it in items:
            offs.append(offs[-1] + len(it))
        return (
            _struct.pack(">HB", len(items), 1)
            + bytes(offs)
            + b"".join(items)
        )

    n_glyphs = len(code_gid_sids) + 1
    charset = b"\x00" + b"".join(
        _struct.pack(">H", sid) for _c, sid in code_gid_sids
    )
    encoding = bytes([0, len(code_gid_sids)]) + bytes(c for c, _s in code_gid_sids)
    charstrings = index([b"\x0e"] * n_glyphs)  # endchar stubs

    def top_dict(cs_off: int, enc_off: int, chs_off: int) -> bytes:
        def op29(v: int) -> bytes:
            return b"\x1d" + _struct.pack(">i", v)

        return op29(chs_off) + b"\x0f" + op29(enc_off) + b"\x10" + op29(cs_off) + b"\x11"

    header = b"\x01\x00\x04\x01"
    name_idx = index([b"TestCFF"])
    strings_idx = index(custom_strings)
    gsubr_idx = index([])
    # fixed-width operands -> two-pass offset resolution converges at once
    td = index([top_dict(0, 0, 0)])
    base = len(header) + len(name_idx) + len(td) + len(strings_idx) + len(gsubr_idx)
    charset_off = base
    encoding_off = charset_off + len(charset)
    charstrings_off = encoding_off + len(encoding)
    td = index([top_dict(charstrings_off, encoding_off, charset_off)])
    return (
        header + name_idx + td + strings_idx + gsubr_idx
        + charset + encoding + charstrings
    )


def fx_type1c_fontfile3() -> tuple[bytes, str]:
    """Embedded Type1C (FontFile3) with NO ToUnicode: the unicode map must
    come from the CFF charset+encoding (lib.rs:406-442).  GID1 -> custom
    string 'Alpha' (SID 391), GID2 -> standard 'b', GID3 -> standard 'ffi'."""
    from .pdfmini.cff import STANDARD_STRINGS

    sid_b = STANDARD_STRINGS.index("b")
    sid_ffi = STANDARD_STRINGS.index("ffi")
    cff = _build_type1c(
        [(65, 391), (66, sid_b), (67, sid_ffi)], [b"Alpha"]
    )
    content = b"BT /F1 12 Tf 72 720 Td (ABC) Tj ET"
    b = PdfBuilder()
    ff3 = b.add_stream("/Subtype /Type1C", cff)
    desc = b.add(
        (
            f"<< /Type /FontDescriptor /FontName /TestCFF /Flags 4 "
            f"/FontFile3 {ff3} 0 R >>"
        ).encode("latin-1")
    )
    font = b.add(
        (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
            f"/FirstChar 65 /LastChar 67 /Widths [500 500 500] "
            f"/FontDescriptor {desc} 0 R >>"
        ).encode("latin-1")
    )
    c = b.add_stream("", content)
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\nΑbﬃ"


def fx_symbol_corefont() -> tuple[bytes, str]:
    """Non-embedded Symbol (the most common math-PDF core font): no
    /Widths and no /Encoding, so the encoding table AND widths both come
    from the full Symbol AFM (lib.rs:624-645; core_fonts.rs:2).  'a','b',
    'g' are alpha/beta/gamma in the Symbol builtin encoding."""
    content = b"BT /F1 12 Tf 72 720 Td (abg) Tj ET"
    res = "<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Symbol >> >> >>"
    return _simple_doc([(content, res)]), "\n\nαβγ"


def fx_zapf_corefont() -> tuple[bytes, str]:
    """Non-embedded ZapfDingbats: table built from the 202-entry dingbat
    name list (zapfglyphnames.rs:1), NOT the AGL — codes 97..99 are glyphs
    a60/a61/a62 (U+2741..U+2743)."""
    content = b"BT /F1 12 Tf 72 720 Td (abc) Tj ET"
    res = (
        "<< /Font << /F1 << /Type /Font /Subtype /Type1 "
        "/BaseFont /ZapfDingbats >> >> >>"
    )
    return _simple_doc([(content, res)]), "\n\n❁❂❃"


def fx_differences_nonascii() -> tuple[bytes, str]:
    """Differences array naming Greek, Cyrillic and ligature glyphs — all
    outside the round-1 AGL subset, resolvable only with the full 4,700-name
    glyph list (glyphnames.rs:6): Alpha=U+0391, Beta=U+0392,
    afii10017=U+0410 (Cyrillic A), ffi=U+FB03."""
    content = b"BT /F1 12 Tf 72 720 Td (ABCD) Tj ET"
    res = (
        "<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /NotACoreFont "
        "/FirstChar 65 /LastChar 68 /Widths [500 500 500 500] "
        "/Encoding << /Differences [65 /Alpha /Beta /afii10017 /ffi] >> >> >> >>"
    )
    return _simple_doc([(content, res)]), "\n\nΑΒАﬃ"


def fx_macexpert_encoding() -> tuple[bytes, str]:
    """/Encoding /MacExpertEncoding (real 256-entry table, encodings.rs:259):
    '0','1' are zerooldstyle/oneoldstyle (U+F730/U+F731), 'V' is ff
    (U+FB00)."""
    content = b"BT /F1 12 Tf 72 720 Td (01V) Tj ET"
    res = (
        "<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /ExpertFace "
        "/FirstChar 48 /LastChar 86 /Widths [" + "500 " * 39 + "] "
        "/Encoding /MacExpertEncoding >> >> >>"
    )
    return _simple_doc([(content, res)]), "\n\n\uf730\uf731\ufb00"


def fx_alternate_colorspace() -> tuple[bytes, str]:
    """Separation colorspace with a CalRGB alternate and a Type-2 tint
    function, selected via cs/scn around the text — mirrors the reference
    corpus doc alternate-color-space.pdf.link (tests/tests.rs:25-35): the
    colorspace layer must PARSE (make_colorspace, lib.rs:1449; Function::new,
    lib.rs:1158) and have zero effect on extracted text."""
    b = PdfBuilder()
    tint = b.add(
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] /C1 [1 0.5 0.2] /N 1 >>"
    )
    content = (
        b"/Sep1 cs 0.7 scn BT /F1 12 Tf 72 720 Td (tinted text) Tj ET"
    )
    c = b.add_stream("", content)
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    res = (
        f"<< /Font {_HELV} /ColorSpace << /Sep1 [/Separation /Spot1 "
        f"[/CalRGB << /WhitePoint [0.95 1 1.09] /Gamma [2.2 2.2 2.2] >>] "
        f"{tint} 0 R] >> >>"
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources {res} >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\ntinted text"


def fx_devicen_colorspace() -> tuple[bytes, str]:
    """DeviceN colorspace selected via cs/scn around the text — parity with
    the reference's unit-variant handling ("DeviceN" => ColorSpace::DeviceN,
    lib.rs:1553): the array's name-list/alternate/tint payload is NOT
    consumed, and extraction proceeds with zero effect on the text."""
    b = PdfBuilder()
    tint = b.add(
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] /C1 [0.9 0.1 0.1] /N 1 >>"
    )
    content = (
        b"/DN cs 0.4 0.6 scn BT /F1 12 Tf 72 720 Td (devicen text) Tj ET"
    )
    c = b.add_stream("", content)
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    res = (
        f"<< /Font {_HELV} /ColorSpace << /DN [/DeviceN [/Cyan /Spot9] "
        f"/DeviceRGB {tint} 0 R] >> >>"
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources {res} >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\ndevicen text"


def fx_xref_stream_objstm() -> tuple[bytes, str]:
    """PDF 1.5 modern layout: cross-reference STREAM (/Type /XRef, W [1 2 1],
    Flate) + catalog/pages/page packed in an object stream (/Type /ObjStm,
    type-2 xref entries) — the layout every post-2006 producer emits.
    Exercises xref-stream parse, ObjStm header/offset parse and type-2
    object resolution through the full Spark extraction path."""
    content = b"BT /F1 12 Tf 72 720 Td (xref stream text) Tj ET"
    objstm_payload = (
        b"<< /Type /Catalog /Pages 4 0 R >>"
        b"<< /Type /Pages /Kids [5 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        b"<< /Type /Page /Parent 4 0 R /Contents 1 0 R /Resources << /Font "
        b"<< /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >>"
    )
    off2 = objstm_payload.index(b"<< /Type /Pages")
    off3 = objstm_payload.index(b"<< /Type /Page /")
    header = f"3 0 4 {off2} 5 {off3} ".encode()
    stm_data = header + objstm_payload
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[1] = len(out)
    out += (
        b"1 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n"
    )
    offsets[2] = len(out)
    out += (
        b"2 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d >>\nstream\n"
        % (len(header), len(stm_data))
        + stm_data + b"\nendstream\nendobj\n"
    )
    xref_pos = len(out)
    rows = [
        (0, 0, 0),            # obj 0: free
        (1, offsets[1], 0),   # content stream
        (1, offsets[2], 0),   # the ObjStm container
        (2, 2, 0),            # catalog: in stream 2, index 0
        (2, 2, 1),            # pages
        (2, 2, 2),            # page
        (1, xref_pos, 0),     # obj 6: this xref stream
    ]
    xref_data = b"".join(
        bytes([t]) + o.to_bytes(2, "big") + bytes([g]) for t, o, g in rows
    )
    xref_data_z = zlib.compress(xref_data)
    out += (
        b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Root 3 0 R /Filter "
        b"/FlateDecode /Length %d >>\nstream\n" % len(xref_data_z)
        + xref_data_z + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF" % xref_pos
    return bytes(out), "\n\nxref stream text"


def fx_form_xobject() -> tuple[bytes, str]:
    """Do-operator family: an Image XObject (-> kind='media' span, the
    interleaved text+media data model) plus a Form XObject whose content
    runs recursively with the form's OWN resources (lib.rs:1860-1869).
    The image Do comes first so the media span precedes all text spans
    (the device flushes text lines lazily).  Expected text hand-derived:
    'inside form' at dy=20 > 1.5*12 fires rule 1 and the moved-left rule
    -> two newlines, exactly like the fx_multiline gamma case."""
    b = PdfBuilder()
    img = b.add_stream(
        "/Type /XObject /Subtype /Image /Width 2 /Height 2 "
        "/ColorSpace /DeviceGray /BitsPerComponent 8",
        b"\x00\x40\x80\xc0",
    )
    form_content = b"BT /F2 12 Tf 72 700 Td (inside form) Tj ET"
    form = b.add_stream(
        "/Type /XObject /Subtype /Form /BBox [0 0 612 792] /Resources "
        "<< /Font << /F2 << /Type /Font /Subtype /Type1 "
        "/BaseFont /Helvetica >> >> >>",
        form_content,
    )
    content = b"/Im1 Do BT /F1 12 Tf 72 720 Td (outside) Tj ET /Fm1 Do"
    c = b.add_stream("", content)
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    res = f"<< /Font {_HELV} /XObject << /Im1 {img} 0 R /Fm1 {form} 0 R >> >>"
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources {res} >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    return b.build(catalog), "\n\noutside\n\ninside form"


def fx_encrypted_identity_stmf() -> tuple[bytes, str]:
    """V4/R4 doc whose /StmF is Identity (spec default): stream bodies are
    NOT encrypted even though an AESV2 StdCF exists for strings.  Covers the
    per-class crypt-filter split (spec 7.6.5); a decryptor that applies the
    string filter to streams turns the content into garbage."""
    from .pdfmini.crypt import compute_file_key, compute_owner_value, compute_user_value

    doc_id = bytes(range(16))
    p = -1
    o = compute_owner_value(r=4, n=16)
    key = compute_file_key(b"", o, p, doc_id, r=4, n=16)
    u = compute_user_value(key, doc_id, r=4)

    content = b"BT /F1 12 Tf 72 720 Td (identity streams) Tj ET"
    b = PdfBuilder()
    c = b.add_stream("", content)  # plain — Identity StmF
    page = b.add(b"")
    pages = b.add(
        (
            f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        ).encode("latin-1")
    )
    b.objects[page - 1] = (
        f"<< /Type /Page /Parent {pages} 0 R /Contents {c} 0 R "
        f"/Resources << /Font {_HELV} >> >>"
    ).encode("latin-1")
    catalog = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode("latin-1"))
    enc_body = (
        f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {p} "
        f"/O <{o.hex()}> /U <{u.hex()}> "
        f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        f"/StmF /Identity /StrF /StdCF >>"
    )
    enc_obj = b.add(enc_body.encode("latin-1"))
    pdf = b.build(
        catalog,
        extra_trailer=f"/Encrypt {enc_obj} 0 R /ID [<{doc_id.hex()}> <{doc_id.hex()}>]",
    )
    return pdf, "\n\nidentity streams"


def fx_encrypted_rc4() -> tuple[bytes, str]:
    return _encrypted_doc("V2")


def fx_encrypted_aes() -> tuple[bytes, str]:
    return _encrypted_doc("AESV2")


def fx_large(pages: int = 30, lines: int = 40) -> tuple[bytes, str]:
    """Multi-page document for throughput/skew benchmarks: `pages` pages of
    `lines` Tj lines each, Flate-compressed.  Golden derived by the same
    hand-derivation rules as the small fixtures: 14pt leading at 10pt font
    -> rule-2 newline per line; page jumps fire rules 1+2 -> blank line."""
    page_list = []
    expected_pages = []
    for p in range(pages):
        ops = [b"BT /F1 10 Tf 72 760 Td"]
        texts = []
        for i in range(lines):
            t = f"page {p:03d} line {i:03d} of deterministic bench corpus"
            ops.append(b"(" + t.encode("latin-1") + b") Tj 0 -14 Td")
            texts.append(t)
        ops.append(b"ET")
        page_list.append((b" ".join(ops), f"<< /Font {_HELV} >>"))
        expected_pages.append("\n".join(texts))
    # doc start: rules 1+2 -> "\n\n"; between pages: rules 1+2 -> "\n\n"
    expected = "\n\n" + "\n\n".join(expected_pages)
    return _simple_doc(page_list, compress=True), expected


FIXTURES: dict[str, callable] = {
    "simple_tj": fx_simple_tj,
    "tj_kerning": fx_tj_kerning,
    "multiline": fx_multiline,
    "widths_custom": fx_widths_custom,
    "missing_widths": fx_missing_widths,
    "embedded_core_font": fx_embedded_core_font,
    "encoding_differences": fx_encoding_differences,
    "winansi_truetype": fx_winansi_truetype,
    "tounicode_cmap": fx_tounicode_cmap,
    "cid_identity_h": fx_cid_identity_h,
    "rotated_text": fx_rotated_text,
    "flate_stream": fx_flate_stream,
    "asciihex_stream": fx_asciihex_stream,
    "multipage": fx_multipage,
    "word_spacing": fx_word_spacing,
    "char_spacing_gap": fx_char_spacing_gap,
    "encrypted_rc4": fx_encrypted_rc4,
    "encrypted_aes": fx_encrypted_aes,
    "encrypted_identity_stmf": fx_encrypted_identity_stmf,
    "type1c_fontfile3": fx_type1c_fontfile3,
    "symbol_corefont": fx_symbol_corefont,
    "zapf_corefont": fx_zapf_corefont,
    "differences_nonascii": fx_differences_nonascii,
    "macexpert_encoding": fx_macexpert_encoding,
    "alternate_colorspace": fx_alternate_colorspace,
    "devicen_colorspace": fx_devicen_colorspace,
    "xref_stream_objstm": fx_xref_stream_objstm,
    "form_xobject": fx_form_xobject,
    "lzw_stream": fx_lzw_stream,
    "cid_embedded_cmap": fx_cid_embedded_cmap,
    "type3_font": fx_type3_font,
    "type1_embedded_encoding": fx_type1_embedded_encoding,
}


# Hand-known page counts per fixture family (default 1) — used by the
# golden-spans oracle derivation (tools/gen_golden_spans.py), never by the
# engine.
EXPECTED_PAGES: dict[str, int] = {"multipage": 2}

# media spans (kind='media', text '', offset 0) emitted BEFORE any text
# span — families whose content issues the Image-XObject Do before text
EXPECTED_MEDIA: dict[str, list[str]] = {"form_xobject": ["Im1"]}

# Hand-derived per-page expected text for multi-page families (by-pages
# semantics: a FRESH device per page, so each page opens with the rule-1+2
# "\n\n"; single-page families equal their whole-doc expected text).
EXPECTED_PAGE_TEXTS: dict[str, list[str]] = {
    "multipage": ["\n\npage one", "\n\npage two"],
}


def corpus(replicas: int = 1) -> list[tuple[str, bytes, str]]:
    """Deterministic (doc_id, pdf_bytes, expected_text) corpus; replicas
    replicate the fixture set with distinct doc_ids (byte-identical PDFs)."""
    out = []
    base = []
    for name, fn in sorted(FIXTURES.items()):
        pdf, expected = fn()
        if isinstance(expected, tuple):
            expected = expected[0]
        base.append((name, pdf, expected))
    for r in range(replicas):
        for name, pdf, expected in base:
            out.append((f"{name}-{r:06d}", pdf, expected))
    return out
