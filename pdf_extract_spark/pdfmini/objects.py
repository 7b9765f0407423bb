"""PDF object model + lexer, written from the PDF 1.7 spec (ISO 32000-1 §7.3).

The reference engine gets this layer from the ``lopdf`` crate
(/root/reference/src/lib.rs:6); we re-implement it in pure Python so it can
run inside vectorized Arrow batches on Spark executors.

Python-native representation (kept deliberately simple so per-batch work is
dict/list slinging, never a class hierarchy walk):

    null        -> None
    boolean     -> bool
    integer     -> int
    real        -> float
    name        -> Name (str subclass)
    string      -> PdfString (bytes subclass; .hexform flag)
    array       -> list
    dictionary  -> dict[str(name) -> obj]
    stream      -> Stream(dict, raw_bytes)
    reference   -> Ref(num, gen)
"""

from __future__ import annotations

import re

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"

# lexer hot-path scanners (C-speed spans instead of per-byte Python loops;
# the lexer is the top profile entry of whole-document extraction)
_RE_REGULAR = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_RE_WS = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_RE_LITERAL_PLAIN = re.compile(rb"[^\\()]*")


class Name(str):
    __slots__ = ()


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int = 0):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, other):
        return isinstance(other, Ref) and (self.num, self.gen) == (other.num, other.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


class PdfString(bytes):
    """Byte string; interpretation is font/encoding dependent
    (mirrors lopdf's String(bytes, format))."""

    __slots__ = ()


class Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw

    def __repr__(self):
        return f"Stream({self.dict!r}, {len(self.raw)} bytes)"


def _is_regular(b: int) -> bool:
    return b not in WHITESPACE and b not in DELIMITERS


class Lexer:
    """Single-pass tokenizer/parser over a PDF byte buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    # -- low-level ---------------------------------------------------------

    def skip_ws(self):
        m = _RE_WS.match(self.data, self.pos)
        if m:
            self.pos = m.end()

    def peek(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    def read_regular(self) -> bytes:
        m = _RE_REGULAR.match(self.data, self.pos)
        self.pos = m.end()
        return m.group()

    # -- tokens ------------------------------------------------------------

    def read_name(self) -> Name:
        assert self.data[self.pos] == 0x2F  # '/'
        self.pos += 1
        raw = self.read_regular()
        # #xx hex escapes in names
        if b"#" in raw:
            out = bytearray()
            i = 0
            while i < len(raw):
                if raw[i] == 0x23 and i + 2 < len(raw):
                    try:
                        out.append(int(raw[i + 1 : i + 3], 16))
                        i += 3
                        continue
                    except ValueError:
                        pass  # malformed #-escape: keep the literal '#'
                out.append(raw[i])
                i += 1
            raw = bytes(out)
        return Name(raw.decode("latin-1"))

    def read_literal_string(self) -> PdfString:
        assert self.data[self.pos] == 0x28  # '('
        self.pos += 1
        data, n = self.data, len(self.data)
        # fast path: no escapes, no nesting — one C-speed span + slice
        m = _RE_LITERAL_PLAIN.match(data, self.pos)
        e = m.end()
        if e < n and data[e] == 0x29:
            self.pos = e + 1
            return PdfString(m.group())
        out = bytearray()
        depth = 1
        while self.pos < n:
            b = data[self.pos]
            self.pos += 1
            if b == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = data[self.pos]
                self.pos += 1
                if e == ord("n"):
                    out.append(10)
                elif e == ord("r"):
                    out.append(13)
                elif e == ord("t"):
                    out.append(9)
                elif e == ord("b"):
                    out.append(8)
                elif e == ord("f"):
                    out.append(12)
                elif e in b"()\\":
                    out.append(e)
                elif e in b"01234567":
                    oct_digits = [e]
                    while len(oct_digits) < 3 and self.pos < n and data[self.pos] in b"01234567":
                        oct_digits.append(data[self.pos])
                        self.pos += 1
                    out.append(int(bytes(oct_digits), 8) & 0xFF)
                elif e == 0x0A:
                    pass  # line continuation
                elif e == 0x0D:
                    if self.pos < n and data[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif b == 0x28:
                depth += 1
                out.append(b)
            elif b == 0x29:
                depth -= 1
                if depth == 0:
                    break
                out.append(b)
            else:
                out.append(b)
        return PdfString(bytes(out))

    def read_hex_string(self) -> PdfString:
        assert self.data[self.pos] == 0x3C  # '<'
        self.pos += 1
        digits = []
        data, n = self.data, len(self.data)
        while self.pos < n:
            b = data[self.pos]
            self.pos += 1
            if b == 0x3E:  # '>'
                break
            c = chr(b)
            if c in "0123456789abcdefABCDEF":
                digits.append(c)
        if len(digits) % 2:
            digits.append("0")
        return PdfString(bytes(int(digits[i] + digits[i + 1], 16) for i in range(0, len(digits), 2)))

    def read_number(self):
        raw = self.read_regular()
        s = raw.decode("latin-1")
        if "." in s:
            try:
                return float(s)
            except ValueError:
                return 0.0
        try:
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return 0

    # -- objects -----------------------------------------------------------

    def read_object(self, resolve_streams: bool = True):
        """Parse one object at the cursor.  Detects ``R`` references and
        ``stream`` bodies (when ``resolve_streams``)."""
        self.skip_ws()
        b = self.peek()
        if b == -1:
            raise EOFError("unexpected end of PDF data")
        if b == 0x2F:
            return self.read_name()
        if b == 0x28:
            return self.read_literal_string()
        if b == 0x3C:
            if self.data[self.pos : self.pos + 2] == b"<<":
                return self._read_dict_or_stream(resolve_streams)
            return self.read_hex_string()
        if b == 0x5B:  # '['
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.peek() == 0x5D:
                    self.pos += 1
                    return arr
                if self.peek() == -1:
                    return arr
                arr.append(self.read_object(resolve_streams))
        if b in b"+-.0123456789":
            return self._read_number_or_ref()
        word = self.read_regular()
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        if not word:
            # delimiter we don't handle; skip a byte to guarantee progress
            self.pos += 1
            return None
        raise ValueError(f"unexpected token {word!r} at {self.pos}")

    def _read_number_or_ref(self):
        save = self.pos
        first = self.read_number()
        if isinstance(first, int) and first >= 0:
            save2 = self.pos
            self.skip_ws()
            if self.peek() >= 0 and self.peek() in b"0123456789":
                second = self.read_regular()
                if second.isdigit():
                    self.skip_ws()
                    if self.peek() == ord("R"):
                        nxt = self.pos
                        self.pos += 1
                        # 'R' must be a lone token
                        if self.pos >= len(self.data) or not _is_regular(self.data[self.pos]):
                            return Ref(first, int(second))
                        self.pos = nxt
            self.pos = save2
        return first

    def _read_dict_or_stream(self, resolve_streams: bool):
        self.pos += 2  # '<<'
        d: dict = {}
        while True:
            self.skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            if self.peek() == -1:
                break
            if self.peek() != 0x2F:
                # tolerate junk keys: skip one object
                self.read_object(resolve_streams)
                continue
            key = self.read_name()
            val = self.read_object(resolve_streams)
            d[str(key)] = val
        if resolve_streams:
            save = self.pos
            self.skip_ws()
            if self.data[self.pos : self.pos + 6] == b"stream":
                self.pos += 6
                if self.data[self.pos : self.pos + 2] == b"\r\n":
                    self.pos += 2
                elif self.pos < len(self.data) and self.data[self.pos] in b"\r\n":
                    self.pos += 1
                length = d.get("Length")
                if isinstance(length, int):
                    raw = self.data[self.pos : self.pos + length]
                    self.pos += length
                    self.skip_ws()
                    if self.data[self.pos : self.pos + 9] == b"endstream":
                        self.pos += 9
                else:
                    # Length is an indirect ref or missing: scan for endstream
                    end = self.data.find(b"endstream", self.pos)
                    if end == -1:
                        end = len(self.data)
                    raw = self.data[self.pos : end]
                    if raw.endswith(b"\r\n"):
                        raw = raw[:-2]
                    elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                        raw = raw[:-1]
                    self.pos = min(end + 9, len(self.data))
                return Stream(d, raw)
            self.pos = save
        return d

    def read_indirect_object(self):
        """Parse ``N G obj ... endobj`` at cursor; returns (num, gen, obj)."""
        self.skip_ws()
        num = int(self.read_regular())
        self.skip_ws()
        gen = int(self.read_regular())
        self.skip_ws()
        kw = self.read_regular()
        if kw != b"obj":
            raise ValueError(f"expected 'obj', got {kw!r}")
        obj = self.read_object()
        self.skip_ws()
        if self.data[self.pos : self.pos + 6] == b"endobj":
            self.pos += 6
        return num, gen, obj
