"""ColorSpace layer — parse-only, mirroring make_colorspace
(/root/reference/src/lib.rs:1449-1540).

Color has no effect on extracted text; the reference builds these
structures for the CS/cs operators so colorspace-bearing documents (e.g.
its alternate-color-space.pdf corpus doc) parse without error, and so do
we.  Bug-for-bug parity notes:
  * the reference reads the black point from the key "BackPoint" (a typo
    for "BlackPoint", lib.rs:1486/1494/1503) — mirrored here;
  * unknown named colorspaces / malformed arrays raise (the reference
    panics; our per-document isolation records a decode_failure row).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


class ColorSpaceError(Exception):
    pass


@dataclass
class CalGray:
    white_point: list[float]
    black_point: list[float] | None
    gamma: float | None


@dataclass
class CalRGB:
    white_point: list[float]
    black_point: list[float] | None
    gamma: list[float] | None
    matrix: list[float] | None


@dataclass
class Lab:
    white_point: list[float]
    black_point: list[float] | None
    range: list[float] | None


@dataclass
class ICCBased:
    profile: bytes = field(repr=False, default=b"")


@dataclass
class Separation:
    name: str
    alternate_space: Any
    tint_transform: Any


@dataclass
class NamedDevice:
    """DeviceGray / DeviceRGB / DeviceCMYK / Pattern."""

    name: str


def _floats(v) -> list[float] | None:
    return None if v is None else [float(x) for x in v]


def _cal_args(doc, d: dict) -> dict:
    return {
        "white_point": _floats(doc.deref(d.get("WhitePoint"))),
        # reference reads "BackPoint" (typo for BlackPoint) — parity
        "black_point": _floats(doc.deref(d.get("BackPoint"))),
    }


def _alternate(doc, obj):
    from .objects import Name, Stream

    obj = doc.deref(obj)
    if isinstance(obj, (Name, str)):
        name = str(obj)
        if name in ("DeviceGray", "DeviceRGB", "DeviceCMYK"):
            return NamedDevice(name)
        raise ColorSpaceError(f"unexpected color space name {name}")
    if isinstance(obj, list):
        kind = str(doc.deref(obj[0]))
        if kind == "ICCBased":
            stream = doc.deref(obj[1])
            if not isinstance(stream, Stream):
                raise ColorSpaceError("ICCBased wants a stream")
            return ICCBased(doc.get_stream_content(stream))
        if kind == "CalGray":
            d = doc.deref(obj[1])
            return CalGray(**_cal_args(doc, d), gamma=doc.deref(d.get("Gamma")))
        if kind == "CalRGB":
            d = doc.deref(obj[1])
            return CalRGB(
                **_cal_args(doc, d),
                gamma=_floats(doc.deref(d.get("Gamma"))),
                matrix=_floats(doc.deref(d.get("Matrix"))),
            )
        if kind == "Lab":
            d = doc.deref(obj[1])
            return Lab(**_cal_args(doc, d), range=_floats(doc.deref(d.get("Range"))))
        raise ColorSpaceError(f"unexpected alternate color space {kind}")
    raise ColorSpaceError("alternate space should be name or array")


def make_colorspace(doc, name: str, resources: dict):
    """make_colorspace parity (lib.rs:1449): device spaces by name, anything
    else resolved through the page's /ColorSpace resource dict."""
    from .objects import Stream

    if name in ("DeviceGray", "DeviceRGB", "DeviceCMYK", "Pattern"):
        return NamedDevice(name)
    colorspaces = doc.deref(resources.get("ColorSpace")) or {}
    cs = doc.deref(colorspaces.get(name))
    if cs is None:
        raise ColorSpaceError(f"missing colorspace {name!r}")
    if not isinstance(cs, list):
        # name-valued resource entry (lib.rs:1558-1563): the reference's
        # name branch matches ONLY DeviceRGB/DeviceGray and panics on
        # anything else (incl. DeviceCMYK/Pattern) — our raise surfaces as
        # a decode_failure row, the graceful analogue of that panic
        from .objects import Name

        if isinstance(cs, (Name, str)) and str(cs) in ("DeviceRGB", "DeviceGray"):
            return NamedDevice(str(cs))
        raise ColorSpaceError(f"expected colorspace array for {name!r}")
    kind = str(doc.deref(cs[0]))
    if kind in ("DeviceGray", "DeviceRGB", "DeviceCMYK", "Pattern", "DeviceN"):
        # array-form device spaces + the DeviceN unit variant
        # (lib.rs:1547-1553: "DeviceN" => ColorSpace::DeviceN — no payload)
        return NamedDevice(kind)
    if kind == "Separation":
        from .function import parse_function

        sep_name = str(doc.deref(cs[1]))
        alternate = _alternate(doc, cs[2])
        tint = parse_function(doc, cs[3])
        return Separation(sep_name, alternate, tint)
    if kind == "ICCBased":
        stream = doc.deref(cs[1])
        if not isinstance(stream, Stream):
            raise ColorSpaceError("ICCBased wants a stream")
        return ICCBased(doc.get_stream_content(stream))
    if kind in ("CalGray", "CalRGB", "Lab"):
        return _alternate(doc, cs)
    raise ColorSpaceError(f"unexpected colorspace kind {kind}")
