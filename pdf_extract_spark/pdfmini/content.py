"""Content-stream tokenizer: bytes -> ordered [(operator, operands)].

Re-implements lopdf's ``Content::decode`` (used by the reference at
/root/reference/src/lib.rs:1582).  Postfix form: operands accumulate until
an operator keyword flushes them.  Inline images (BI..ID..EI) are skipped
as a single ``BI`` op carrying no operands (the reference ignores unknown
ops, lib.rs:1870).
"""

from __future__ import annotations

from .objects import DELIMITERS, WHITESPACE, Lexer


def decode_content(data: bytes) -> list[tuple[str, list]]:
    ops: list[tuple[str, list]] = []
    operands: list = []
    lex = Lexer(data)
    n = len(data)
    while True:
        lex.skip_ws()
        if lex.pos >= n:
            break
        b = lex.peek()
        if b in b"+-.0123456789":
            # content streams cannot contain indirect references, so skip
            # read_object's "<int> <int> R" lookahead entirely — numbers are
            # the dominant operand kind (the Td/TJ/cm hot path)
            operands.append(lex.read_number())
            continue
        if b == 0x28:
            operands.append(lex.read_literal_string())
            continue
        if b == 0x2F or b == 0x3C or b == 0x5B:
            try:
                operands.append(lex.read_object(resolve_streams=False))
            except Exception:
                lex.pos += 1
            continue
        if b in DELIMITERS:
            lex.pos += 1  # stray delimiter: skip
            continue
        word = lex.read_regular()
        if not word:
            lex.pos += 1
            continue
        op = word.decode("latin-1")
        if op == "true":
            operands.append(True)
            continue
        if op == "false":
            operands.append(False)
            continue
        if op == "null":
            operands.append(None)
            continue
        if op == "BI":
            # inline image: skip to EI (whitespace-delimited)
            p = lex.pos
            while True:
                idx = data.find(b"EI", p)
                if idx == -1:
                    lex.pos = n
                    break
                before_ok = idx == 0 or data[idx - 1] in WHITESPACE
                after_ok = idx + 2 >= n or data[idx + 2] in WHITESPACE or data[idx + 2] in DELIMITERS
                if before_ok and after_ok:
                    lex.pos = idx + 2
                    break
                p = idx + 2
            ops.append(("BI", []))
            operands = []
            continue
        ops.append((op, operands))
        operands = []
    return ops
