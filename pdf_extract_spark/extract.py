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


def extract_text_from_mem(data: bytes) -> str:
    """bytes -> plain text (extract_text_from_mem, lib.rs:2259-2268).
    Raises on parse failure like the reference's Err."""
    doc = load_mem(data)
    device = PlainTextSpanDevice()
    output_doc(doc, device)
    return spans_to_text(device.finish())


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
