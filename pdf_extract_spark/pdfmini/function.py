"""PDF Function objects — parse-only, mirroring the reference exactly
(Function::new, /root/reference/src/lib.rs:1158-1231).

The reference parses Type 0/2/3/4 functions into data structures and never
evaluates them (no eval exists; type 4 just logs a warning) — functions
only appear as Separation tint transforms, which have zero effect on text
output.  This module keeps that parse surface (so colorspace-bearing
documents parse cleanly) with the same defaulting rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class FunctionError(Exception):
    pass


@dataclass
class Type0Func:
    """Sampled function (the 'Order' key is ignored like pdfium/poppler/
    pdf.js — lib.rs:1188)."""

    domain: list[float]
    range: list[float]
    size: list[int]
    bits_per_sample: int
    encode: list[float]
    decode: list[float]
    contents: bytes = field(repr=False, default=b"")


@dataclass
class Type2Func:
    """Exponential interpolation."""

    c0: list[float] | None
    c1: list[float] | None
    n: float


@dataclass
class Type3Func:
    """Stitching function — the reference keeps no fields (lib.rs:1211)."""


@dataclass
class Type4Func:
    """PostScript calculator — unparsed program bytes (lib.rs:1215-1224)."""

    contents: bytes = field(repr=False, default=b"")


def parse_function(doc, obj):
    """Function::new parity: dispatch on /FunctionType; raises
    FunctionError where the reference panics."""
    from .objects import Stream

    obj = doc.deref(obj)
    if isinstance(obj, Stream):
        d = obj.dict
    elif isinstance(obj, dict):
        d = obj
    else:
        raise FunctionError(f"function must be dict or stream, got {type(obj)}")

    ftype = doc.deref(d.get("FunctionType"))
    if ftype == 0:
        if not isinstance(obj, Stream):
            raise FunctionError("type 0 functions must be streams")
        rng = [float(x) for x in doc.deref(d.get("Range"))]
        domain = [float(x) for x in doc.deref(d.get("Domain"))]
        size = [int(x) for x in doc.deref(d.get("Size"))]
        bps = int(doc.deref(d.get("BitsPerSample")))
        encode = doc.deref(d.get("Encode"))
        if encode is None:
            encode = []
            for s in size:
                encode.extend([0.0, float(s - 1)])
        else:
            encode = [float(x) for x in encode]
        decode = doc.deref(d.get("Decode"))
        decode = list(rng) if decode is None else [float(x) for x in decode]
        return Type0Func(
            domain=domain,
            range=rng,
            size=size,
            bits_per_sample=bps,
            encode=encode,
            decode=decode,
            contents=doc.get_stream_content(obj),
        )
    if ftype == 2:
        c0 = doc.deref(d.get("C0"))
        c1 = doc.deref(d.get("C1"))
        return Type2Func(
            c0=None if c0 is None else [float(x) for x in c0],
            c1=None if c1 is None else [float(x) for x in c1],
            n=float(doc.deref(d.get("N"))),
        )
    if ftype == 3:
        return Type3Func()
    if ftype == 4:
        if not isinstance(obj, Stream):
            raise FunctionError("type 4 functions should be streams")
        return Type4Func(contents=doc.get_stream_content(obj))
    raise FunctionError(f"unhandled function type {ftype}")
