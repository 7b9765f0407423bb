"""Top-level extraction API: PDF bytes -> ordered span array / plain text.

Mirrors the reference's public surface (extract_text_from_mem,
/root/reference/src/lib.rs:2259-2268; extract_text_by_pages, lib.rs:2295).
This module is deliberately Spark-free so it can be shipped to executors
via --py-files and invoked inside Arrow batches.
"""

from __future__ import annotations

from .device import PlainTextSpanDevice, spans_to_text
from .interpreter import Processor, output_doc
from .pdfmini.document import Document, EncryptedPdfError, PdfError, load_mem

__all__ = [
    "extract_spans_from_mem",
    "extract_text_from_mem",
    "extract_spans_by_pages",
    "ExtractResult",
    "EncryptedPdfError",
    "PdfError",
]


class ExtractResult:
    __slots__ = ("spans", "pages", "error")

    def __init__(self, spans, pages, error):
        self.spans = spans
        self.pages = pages
        self.error = error


def extract_spans_from_mem(data: bytes) -> ExtractResult:
    """Parse + interpret one PDF; never raises — failures are data
    (decode_failures metric), matching the pipeline's skip-not-crash
    contract (reference records Err, lib.rs:2230-2244)."""
    try:
        doc = load_mem(data)
        device = PlainTextSpanDevice()
        pages = output_doc(doc, device)
        return ExtractResult(device.finish(), pages, None)
    except Exception as e:  # noqa: BLE001 — per-doc fault isolation
        return ExtractResult([], 0, f"{type(e).__name__}: {e}")


def extract_spans_flat_from_mem(data: bytes):
    """Flat-array variant for the Arrow boundary: returns
    (kinds, texts, media_refs, offsets, pages, error) — no per-span dicts
    (the mapInPandas stage ships exactly these four lists)."""
    try:
        doc = load_mem(data)
        device = PlainTextSpanDevice()
        pages = output_doc(doc, device)
        kinds, texts, media_refs, offsets = device.finish_flat()
        return kinds, texts, media_refs, offsets, pages, None
    except Exception as e:  # noqa: BLE001 — per-doc fault isolation
        return [], [], [], [], 0, f"{type(e).__name__}: {e}"


def extract_text_from_mem(data: bytes) -> str:
    """bytes -> plain text (extract_text_from_mem, lib.rs:2259-2268).
    Raises on parse failure like the reference's Err."""
    doc = load_mem(data)
    device = PlainTextSpanDevice()
    output_doc(doc, device)
    return spans_to_text(device.finish())


def extract_text_from_mem_encrypted(data: bytes, password: str | bytes) -> str:
    """Password variant (extract_text_from_mem_encrypted, lib.rs:2270-2281)."""
    pw = password.encode("latin-1") if isinstance(password, str) else password
    doc = Document(data, password=pw)
    device = PlainTextSpanDevice()
    output_doc(doc, device)
    return spans_to_text(device.finish())


def extract_spans_page_range(data: bytes, lo: int, hi: int) -> list[tuple[int, list[dict]]]:
    """Extract pages lo..hi (1-based, inclusive) with a fresh device +
    Processor per page — by-pages semantics (extract_text_by_pages,
    lib.rs:2295-2307: fresh Processor per page, lib.rs:2396).  Used by the
    page-exploded path for giant documents."""
    doc = load_mem(data)
    pages = doc.get_pages()
    out = []
    for page_num in range(lo, min(hi, len(pages)) + 1):
        page = pages[page_num - 1]
        device = PlainTextSpanDevice()
        processor = Processor(doc)
        resources = doc.get_inherited(page, "Resources") or {}
        mb = doc.get_inherited(page, "MediaBox")
        if not isinstance(mb, list) or len(mb) != 4:
            raise ValueError("MediaBox required")
        media_box = tuple(float(doc.deref(v)) for v in mb)
        device.begin_page(page_num, media_box)
        processor.process_stream(doc.get_page_content(page), resources, media_box, device)
        device.end_page()
        out.append((page_num, device.finish()))
    return out


def page_count_of(data: bytes) -> int:
    """Cheap page count (xref + page tree only; no content interpretation)."""
    return len(load_mem(data).get_pages())


def doc_metadata(data: bytes) -> dict:
    """Document metadata (print_metadata, lib.rs:2203-2216): version, page
    count, and the Info dictionary's common string fields."""
    from .encodings_data import pdf_to_utf8
    from .pdfmini.objects import PdfString

    doc = load_mem(data)
    info = doc.info()
    out = {"version": doc.version(), "page_count": doc.page_count()}
    for k in ("Title", "Author", "Subject", "Producer", "Creator"):
        v = doc.deref(info.get(k))
        out[k.lower()] = pdf_to_utf8(bytes(v)) if isinstance(v, PdfString) else None
    return out


def extract_html_from_mem(data: bytes) -> str:
    """bytes -> positioned-div HTML (HTMLOutput parity, lib.rs:1891-1993)."""
    from .devices_html import HTMLDevice

    doc = load_mem(data)
    device = HTMLDevice()
    output_doc(doc, device)
    return device.finish()


def extract_svg_from_mem(data: bytes) -> str:
    """bytes -> per-page SVG with vector-path fills (SVGOutput parity,
    lib.rs:1995-2087)."""
    from .devices_html import SVGDevice

    doc = load_mem(data)
    device = SVGDevice()
    output_doc(doc, device)
    return device.finish()


def extract_spans_by_pages(data: bytes) -> list[list[dict]]:
    """Per-page span arrays (extract_text_by_pages, lib.rs:2295-2307).
    Parity quirk: the reference builds a fresh Processor per page
    (lib.rs:2396) so the font cache is not shared — output-identical,
    only a perf difference; we share one Document but fresh state."""
    doc = load_mem(data)
    out = []
    for page in doc.get_pages():
        device = PlainTextSpanDevice()
        processor = Processor(doc)
        resources = doc.get_inherited(page, "Resources") or {}
        mb = doc.get_inherited(page, "MediaBox")
        if not isinstance(mb, list) or len(mb) != 4:
            raise ValueError("MediaBox required")
        media_box = tuple(float(doc.deref(v)) for v in mb)
        device.begin_page(1, media_box)
        processor.process_stream(doc.get_page_content(page), resources, media_box, device)
        device.end_page()
        out.append(device.finish())
    return out
