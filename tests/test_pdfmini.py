"""Unit tests for the object lexer and document structure layer."""

import zlib

from pdf_extract_spark.fixtures import PdfBuilder, fx_simple_tj
from pdf_extract_spark.pdfmini.content import decode_content
from pdf_extract_spark.pdfmini.document import load_mem
from pdf_extract_spark.pdfmini.objects import Lexer, Name, PdfString, Ref, Stream


def _parse(src: bytes):
    return Lexer(src).read_object()


def test_lexer_scalars():
    assert _parse(b"42") == 42
    assert _parse(b"-3.5") == -3.5
    assert _parse(b"+.5") == 0.5
    assert _parse(b"true") is True
    assert _parse(b"false") is False
    assert _parse(b"null") is None


def test_lexer_name_with_hex_escape():
    n = _parse(b"/A#20B")
    assert isinstance(n, Name) and str(n) == "A B"


def test_lexer_literal_string_escapes():
    s = _parse(rb"(a\(b\)c\\d\n\t\101)")
    assert bytes(s) == b"a(b)c\\d\n\tA"
    # nested parens
    assert bytes(_parse(b"(a(b)c)")) == b"a(b)c"
    # octal with fewer than 3 digits
    assert bytes(_parse(rb"(\53)")) == b"+"


def test_lexer_hex_string():
    assert bytes(_parse(b"<48 65 6C>")) == b"Hel"
    assert bytes(_parse(b"<486>")) == b"H`"


def test_lexer_dict_array_ref():
    d = _parse(b"<< /A [1 2 0 R 3] /B << /C (x) >> >>")
    assert d["A"][0] == 1
    assert d["A"][1] == Ref(2, 0)
    assert d["A"][2] == 3
    assert bytes(d["B"]["C"]) == b"x"


def test_lexer_number_pair_not_ref():
    arr = _parse(b"[1 2 3]")
    assert arr == [1, 2, 3]


def test_stream_parsing():
    src = b"<< /Length 5 >>\nstream\nhello\nendstream"
    obj = Lexer(src).read_object()
    assert isinstance(obj, Stream)
    assert obj.raw == b"hello"


def test_document_load_and_page_tree():
    pdf, _ = fx_simple_tj()
    doc = load_mem(pdf)
    pages = doc.get_pages()
    assert len(pages) == 1
    assert doc.page_count() == 1
    mb = doc.get_inherited(pages[0], "MediaBox")
    assert mb == [0, 0, 612, 792]
    content = doc.get_page_content(pages[0])
    assert b"Hello World" in content
    assert doc.version().startswith("1.")


def test_xref_stream_and_object_stream():
    """PDF 1.5 xref streams + object streams (type-2 entries)."""
    # hand-build: catalog+pages+page in an ObjStm, content classic,
    # xref as a stream
    content = b"BT /F1 12 Tf 72 720 Td (objstm) Tj ET"
    objstm_payload = (
        b"<< /Type /Catalog /Pages 4 0 R >>"
        b"<< /Type /Pages /Kids [5 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        b"<< /Type /Page /Parent 4 0 R /Contents 1 0 R /Resources << /Font "
        b"<< /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >>"
    )
    off1 = 0
    off2 = objstm_payload.index(b"<< /Type /Pages")
    off3 = objstm_payload.index(b"<< /Type /Page /")
    header = f"3 {off1} 4 {off2} 5 {off3} ".encode()
    stm_data = header + objstm_payload
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[1] = len(out)
    out += b"1 0 obj\n<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream\nendobj\n"
    offsets[2] = len(out)
    out += (
        b"2 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d >>\nstream\n"
        % (len(header), len(stm_data))
        + stm_data
        + b"\nendstream\nendobj\n"
    )
    # xref stream object (num 6): W [1 2 1]
    rows = [
        (0, 0, 0),        # obj 0: free
        (1, offsets[1], 0),
        (1, offsets[2], 0),
        (2, 2, 0),        # obj 3 in stream 2 idx 0
        (2, 2, 1),
        (2, 2, 2),
        (1, 0, 0),        # obj 6 = this xref stream (offset patched below)
    ]
    xref_pos = len(out)
    rows[6] = (1, xref_pos, 0)
    xref_data = b"".join(
        bytes([t]) + o.to_bytes(2, "big") + bytes([g]) for t, o, g in rows
    )
    xref_data_z = zlib.compress(xref_data)
    out += (
        b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Root 3 0 R /Filter "
        b"/FlateDecode /Length %d >>\nstream\n" % len(xref_data_z)
        + xref_data_z
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF" % xref_pos

    from pdf_extract_spark.extract import extract_text_from_mem

    assert extract_text_from_mem(bytes(out)) == "\n\nobjstm"


def test_content_tokenizer():
    ops = decode_content(b"BT /F1 12 Tf 72 720 Td [(a) -30 (b)] TJ ET")
    names = [op for op, _ in ops]
    assert names == ["BT", "Tf", "Td", "TJ", "ET"]
    tj = ops[3][1][0]
    assert bytes(tj[0]) == b"a"
    assert tj[1] == -30
    assert bytes(tj[2]) == b"b"


def test_lexer_scalar_fast_path_parity():
    """The one-match scalar classifier must keep the step-by-step parser's
    exact semantics: whole-token/lone-R reference test (with comments
    permitted between tokens, as skip_ws treated them), number fallback
    chain, keyword lone-token test, name #-escapes."""
    from pdf_extract_spark.pdfmini.objects import Lexer, Name, Ref

    cases = [
        (b"5 0 R", Ref(5, 0)),
        (b"5 % c\n0 % c\nR", Ref(5, 0)),  # comments between ref tokens
        (b"5 0 RT", 5),                   # R not a lone token
        (b"5 0R", 5),                     # '0R' is not an all-digits token
        (b"5 00 R", Ref(5, 0)),
        (b"-5 0 R", -5),                  # negative first: never a ref
        (b"+5 0 R", Ref(5, 0)),           # int('+5') == 5 — historic parity
        (b"5.0 0 R", 5.0),                # real first: never a ref
        (b"5 0.5 R", 5),                  # gen not all digits
        (b"true", True),
        (b"false", False),
        (b"null", None),
        (b"/Name#20x", Name("Name x")),
        (b"2. 1 R", 2.0),                 # '.'-bearing parses float
        # malformed number falls back to int 0, which (being a
        # non-negative int) still takes the ref tail — historic parity
        (b"5x 0 R", Ref(0, 0)),
    ]
    for data, want in cases:
        got = Lexer(data).read_object()
        assert got == want and type(got) is type(want), (data, got, want)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Lexer(b"trueish").read_object()


def test_content_stray_comma_is_unknown_operator():
    """',' sits between '+' (0x2B) and '.' (0x2E): an unescaped [+-.]
    range in the number pattern would swallow it as a malformed number.
    It must tokenize as an unknown operator that flushes operands, like
    the reference's lopdf Content::decode treats any non-keyword run."""
    ops = decode_content(b"BT 1 ,2 Td (x) Tj ET")
    names = [op for op, _ in ops]
    # ',2' is an (ignored-later) unknown operator carrying the stranded 1
    assert names == ["BT", ",2", "Td", "Tj", "ET"]
    assert ops[1][1] == [1]      # flushed by the unknown operator
    assert ops[2][1] == []       # ',2' swallowed the run; Td gets nothing
    # a comma INSIDE a numeric token still parses by read_number fallback
    # (whole regular token -> int fails -> float fails -> 0)
    assert decode_content(b"1,5 0 Td") == [("Td", [0, 0])]


def test_content_inline_image_skipped():
    data = b"BT ET BI /W 2 /H 2 ID \x00\xff\x01\x02 EI 1 0 0 1 0 0 cm"
    ops = decode_content(data)
    assert ("BI", []) in ops
    assert ops[-1][0] == "cm"


def test_builder_roundtrip_offsets():
    b = PdfBuilder()
    b.add(b"<< /Type /Catalog >>")
    pdf = b.build(1)
    doc = load_mem(pdf)
    assert doc.trailer["Size"] == 2
