"""ColorSpace + Function parse layer (pdfmini.colorspace / .function) —
parse-only parity with make_colorspace (lib.rs:1449) and Function::new
(lib.rs:1158)."""

import pytest

from pdf_extract_spark.extract import extract_text_from_mem
from pdf_extract_spark.fixtures import fx_alternate_colorspace
from pdf_extract_spark.pdfmini.colorspace import (
    CalRGB,
    ColorSpaceError,
    NamedDevice,
    Separation,
    make_colorspace,
)
from pdf_extract_spark.pdfmini.document import load_mem
from pdf_extract_spark.pdfmini.function import Type2Func, Type4Func, parse_function


def _doc_and_resources():
    pdf, _ = fx_alternate_colorspace()
    doc = load_mem(pdf)
    page = doc.get_pages()[0]
    res = doc.deref(page.get("Resources"))
    return doc, res


def test_extraction_unaffected_by_colorspace():
    pdf, expected = fx_alternate_colorspace()
    assert extract_text_from_mem(pdf) == expected


def test_separation_parse():
    doc, res = _doc_and_resources()
    cs = make_colorspace(doc, "Sep1", res)
    assert isinstance(cs, Separation)
    assert cs.name == "Spot1"
    assert isinstance(cs.alternate_space, CalRGB)
    assert cs.alternate_space.white_point == [0.95, 1.0, 1.09]
    assert cs.alternate_space.gamma == [2.2, 2.2, 2.2]
    # "BackPoint" typo parity: a /BlackPoint key is NOT read
    assert cs.alternate_space.black_point is None
    assert isinstance(cs.tint_transform, Type2Func)
    assert cs.tint_transform.n == 1.0
    assert cs.tint_transform.c1 == [1.0, 0.5, 0.2]


def test_device_spaces_and_errors():
    doc, res = _doc_and_resources()
    assert isinstance(make_colorspace(doc, "DeviceRGB", res), NamedDevice)
    with pytest.raises(ColorSpaceError):
        make_colorspace(doc, "NoSuchSpace", res)


def test_function_types():
    doc, res = _doc_and_resources()
    with pytest.raises(Exception):
        parse_function(doc, 42)
    # type 4 must be a stream
    from pdf_extract_spark.pdfmini.objects import Stream

    f4 = parse_function(doc, Stream({"FunctionType": 4}, b"{ dup mul }"))
    assert isinstance(f4, Type4Func)
    assert f4.contents == b"{ dup mul }"


def test_type0_defaults():
    """Encode defaults to [0, size_i - 1]*, Decode defaults to Range
    (lib.rs:1189-1199)."""
    doc, _ = _doc_and_resources()
    from pdf_extract_spark.pdfmini.objects import Stream

    f0 = parse_function(
        doc,
        Stream(
            {
                "FunctionType": 0,
                "Domain": [0, 1],
                "Range": [0, 1, 0, 1],
                "Size": [4, 2],
                "BitsPerSample": 8,
                "Length": 8,
            },
            bytes(8),
        ),
    )
    assert f0.encode == [0.0, 3.0, 0.0, 1.0]
    assert f0.decode == [0.0, 1.0, 0.0, 1.0]
    assert f0.bits_per_sample == 8
