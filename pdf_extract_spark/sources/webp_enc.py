"""From-scratch VP8L (WebP lossless) *encoder* for fixture generation.

Counterpart to operators/webp.py (the decoder) in the repo's
encoder-verified media strategy: fixtures are built from closed-form
pixel formulas, and because VP8L is lossless the golden expectation for
the decoder is the input pixel array itself — never the decoder's own
output.  To avoid shared-bug cancellation, this module implements its
own scalar predictor / color-transform / palette / cache math rather
than importing the decoder's kernels; the only shared artifact is the
120-entry short-distance map, imported as data from operators.webp
where it is GENERATED from the RFC 9649 ordering rule (and anchored to
known spec values in tests/test_webp.py).

Feature coverage is configuration-driven so individual fixtures can
exercise each decoder path: normal and simple (1/2-symbol) prefix
codes, code-length runs (16/17/18), color cache, LZ77 copies through
both mapped (<=120) and direct distance codes, meta prefix codes
(entropy-image tiling), and all four transforms.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from ..operators.webp import _DIST_MAP, CODE_LENGTH_ORDER


class _LsbWriter:
    """LSB-first bit packer (VP8L bit order, RFC 9649 §3.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        assert 0 <= value < (1 << nbits) or nbits == 0
        self.acc |= value << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _huff_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths from symbol frequencies (plain Huffman; fixtures are
    small enough that the depth bound is asserted, not enforced)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 0}  # written as a simple 1-symbol (0-bit) code
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    lengths = dict.fromkeys(syms, 0)
    tie = len(syms)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, g1 + g2))
        tie += 1
    assert max(lengths.values()) <= max_len, "fixture exceeds code-length bound"
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE-style canonical assignment: symbol -> (code, length), codes
    ordered by (length, symbol)."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _put_code(bw: _LsbWriter, code: int, length: int) -> None:
    """Prefix codes go to the stream MSB-of-code-first, i.e. bit-reversed
    for an LSB-first writer."""
    rev = 0
    for i in range(length):
        rev |= ((code >> i) & 1) << (length - 1 - i)
    bw.put(rev, length)


class _Code:
    """A written prefix code: knows how to emit symbols."""

    def __init__(self, lengths: dict[int, int], zero_bit_sym: int | None = None):
        self.zero = zero_bit_sym
        self.codes = _canonical_codes(lengths) if zero_bit_sym is None else {}

    def emit(self, bw: _LsbWriter, sym: int) -> None:
        if self.zero is not None:
            assert sym == self.zero
            return
        code, ln = self.codes[sym]
        _put_code(bw, code, ln)


def _write_prefix_code(bw: _LsbWriter, freqs: dict[int, int],
                       alphabet_size: int) -> _Code:
    """Emit one prefix code (§3.7.1) and return its emitter.  Uses the
    simple form for <=2 distinct symbols, else the full code-length-coded
    form with 16/17/18 runs."""
    syms = sorted(freqs)
    if not syms:
        syms = [0]
        freqs = {0: 1}
    # simple form: 1-2 symbols, each expressible in 8 bits
    if len(syms) == 1 and syms[0] < 256:
        bw.put(1, 1)  # simple
        bw.put(0, 1)  # num_symbols - 1 = 0
        s = syms[0]
        if s < 2:
            bw.put(0, 1)  # 1-bit symbol
            bw.put(s, 1)
        else:
            bw.put(1, 1)  # 8-bit symbol
            bw.put(s, 8)
        return _Code({}, zero_bit_sym=s)
    if len(syms) == 2 and syms[1] < 256:
        bw.put(1, 1)  # simple
        bw.put(1, 1)  # two symbols
        first, second = syms
        if first < 2:
            bw.put(0, 1)
            bw.put(first, 1)
        else:
            bw.put(1, 1)
            bw.put(first, 8)
        bw.put(second, 8)
        return _Code({first: 1, second: 1})
    if len(syms) == 1:
        # single symbol >= 256 (e.g. one length code): the simple form
        # can't express it; transmit a degenerate normal code instead —
        # exactly one non-zero code length => the decoder's 0-bit path
        lengths = {syms[0]: 1}
    elif len(syms) == 2:
        lengths = {syms[0]: 1, syms[1]: 1}
    else:
        lengths = _huff_lengths(freqs, 15)
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    trailing = 0
    while seq and seq[-1] == 0:
        seq.pop()
        trailing += 1
    # run-length the length sequence with 16 (repeat prev non-zero),
    # 17/18 (zero runs)
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i = 0
    prev_nz = 8
    while i < len(seq):
        v = seq[i]
        run = 1
        while i + run < len(seq) and seq[i + run] == v:
            run += 1
        if v == 0:
            left = run
            while left >= 11:
                rep = min(left, 138)
                tokens.append((18, rep - 11, 7))
                left -= rep
            while left >= 3:
                rep = min(left, 10)
                tokens.append((17, rep - 3, 3))
                left -= rep
            tokens.extend([(0, 0, 0)] * left)
        else:
            left = run
            if v != prev_nz:
                tokens.append((v, 0, 0))
                left -= 1
            prev_nz = v
            while left >= 3:
                rep = min(left, 6)
                tokens.append((16, rep - 3, 2))
                left -= rep
            tokens.extend([(v, 0, 0)] * left)
        i += run
    cl_freqs: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freqs[sym] = cl_freqs.get(sym, 0) + 1
    cl_lengths = _huff_lengths(cl_freqs, 7)
    if len(cl_lengths) == 1:
        # exactly one non-zero 3-bit length => the decoder's 0-bit path
        cl_lengths = {next(iter(cl_lengths)): 1}
    bw.put(0, 1)  # normal (not simple)
    # 3-bit lengths in CODE_LENGTH_ORDER, trimmed to the last used slot
    order_pos = {s: i for i, s in enumerate(CODE_LENGTH_ORDER)}
    max_pos = max(order_pos[s] for s in cl_lengths)
    num_codes = max(4, max_pos + 1)
    bw.put(num_codes - 4, 4)
    for i in range(num_codes):
        bw.put(cl_lengths.get(CODE_LENGTH_ORDER[i], 0), 3)
    cl_code = (_Code({}, zero_bit_sym=next(iter(cl_lengths)))
               if len(cl_lengths) == 1 else _Code(cl_lengths))
    if trailing:
        # the decoder reads cl codes until the alphabet is filled OR the
        # transmitted token budget (max_symbol) runs out — trailing zeros
        # are cheapest declared via the short-circuit
        budget = len(tokens)
        assert budget >= 2
        nbits = 2
        while (1 << nbits) - 1 < budget - 2:
            nbits += 2
        bw.put(1, 1)
        bw.put((nbits - 2) // 2, 3)
        bw.put(budget - 2, nbits)
    else:
        bw.put(0, 1)  # token stream fills the alphabet exactly
    for sym, extra, extra_bits in tokens:
        cl_code.emit(bw, sym)
        if extra_bits:
            bw.put(extra, extra_bits)
    if len(lengths) == 1:
        return _Code({}, zero_bit_sym=next(iter(lengths)))
    return _Code(lengths)


def _lz77_prefix(value: int) -> tuple[int, int, int]:
    """Inverse of the LZ77 prefix-value decode: value -> (prefix_code,
    extra_value, extra_bits)."""
    assert value >= 1
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    if rest < (1 << (nbits - 1)):
        return 2 * nbits, rest, nbits - 1
    return 2 * nbits + 1, rest - (1 << (nbits - 1)), nbits - 1


# tokens: ("lit", a, r, g, b) | ("cache", idx) | ("copy", length, dist, direct)
def _tokenize(argb: np.ndarray, w: int, cache_bits: int,
              lz77: bool) -> list[tuple]:
    """Greedy token stream over the (possibly transformed) ARGB pixels.
    LZ77 matching is deliberately simple: whole-row repeats and short
    left-runs, enough to exercise every decoder path."""
    n = len(argb)
    tokens: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    pos = 0
    mapped = {}
    if lz77:
        for i, (dx, dy) in enumerate(_DIST_MAP):
            d = dy * w + dx
            if d >= 1 and d not in mapped:
                mapped[d] = i + 1
    use_direct = True  # alternate mapped/direct distance codes
    while pos < n:
        if lz77 and pos >= w and pos % w == 0:
            # whole-row copy if identical to the previous row
            if np.array_equal(argb[pos:pos + w], argb[pos - w:pos]):
                dist = w
                if dist in mapped and not use_direct:
                    tokens.append(("copy", w, dist, False))
                else:
                    tokens.append(("copy", w, dist, True))
                use_direct = not use_direct
                if cache is not None:
                    for px in argb[pos:pos + w]:
                        px = int(px)
                        cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += w
                continue
        if lz77 and pos % w >= 4:
            # left-run: pixel repeats previous (distance 1, mapped code)
            run = 0
            while (pos + run < n and (pos + run) % w != 0
                   and argb[pos + run] == argb[pos + run - 1] and run < 12):
                run += 1
            if run >= 4:
                tokens.append(("copy", run, 1, False))
                if cache is not None:
                    px = int(argb[pos])
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += run
                continue
        px = int(argb[pos])
        if cache is not None:
            slot = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == px:
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = px
        tokens.append(("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF,
                       (px >> 8) & 0xFF, px & 0xFF))
        pos += 1
    return tokens


def make_vp8l(pixels: np.ndarray, *, cache_bits: int = 0, lz77: bool = False,
              subtract_green: bool = False, predictor_bits: int = 0,
              predictor_modes: np.ndarray | None = None,
              color_bits: int = 0, ctes: np.ndarray | None = None,
              palette: np.ndarray | None = None,
              meta_bits: int = 0, meta_index: np.ndarray | None = None,
              ) -> bytes:
    """pixels HxWx3 (or HxWx4 ARGB-order channels a,r,g,b) uint8 ->
    VP8L chunk payload."""
    h, w = pixels.shape[:2]
    if pixels.shape[2] == 3:
        argb = (np.full((h, w), 0xFF000000, dtype=np.uint64)
                | (pixels[:, :, 0].astype(np.uint64) << 16)
                | (pixels[:, :, 1].astype(np.uint64) << 8)
                | pixels[:, :, 2].astype(np.uint64)).reshape(-1)
    else:
        argb = ((pixels[:, :, 0].astype(np.uint64) << 24)
                | (pixels[:, :, 1].astype(np.uint64) << 16)
                | (pixels[:, :, 2].astype(np.uint64) << 8)
                | pixels[:, :, 3].astype(np.uint64)).reshape(-1)
    bw = _LsbWriter()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version

    xsize = w
    # ---- transforms, in write order; residuals computed with this
    # module's own scalar math (independent of the decoder kernels)
    if predictor_bits:
        bw.put(1, 1)
        bw.put(0, 2)  # PREDICTOR
        bw.put(predictor_bits - 2, 3)
        tw = (xsize + (1 << predictor_bits) - 1) >> predictor_bits
        th = (h + (1 << predictor_bits) - 1) >> predictor_bits
        assert predictor_modes is not None and predictor_modes.size == tw * th
        argb = _forward_predictor(argb, w, h, predictor_modes, predictor_bits)
        tile_px = (np.uint64(0xFF000000)
                   | (predictor_modes.astype(np.uint64) << 8)).reshape(-1)
        _write_helper_image(bw, tile_px, tw, th)
    if color_bits:
        bw.put(1, 1)
        bw.put(1, 2)  # COLOR
        bw.put(color_bits - 2, 3)
        tw = (xsize + (1 << color_bits) - 1) >> color_bits
        th = (h + (1 << color_bits) - 1) >> color_bits
        assert ctes is not None and ctes.size == tw * th
        argb = _forward_color_transform(argb, w, h, ctes, color_bits)
        tile_px = (np.uint64(0xFF000000) | ctes.astype(np.uint64)).reshape(-1)
        _write_helper_image(bw, tile_px, tw, th)
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)  # SUBTRACT_GREEN
        g = (argb >> np.uint64(8)) & np.uint64(0xFF)
        r = ((argb >> np.uint64(16)) - g) & np.uint64(0xFF)
        b = (argb - g) & np.uint64(0xFF)
        argb = (argb & np.uint64(0xFF00FF00)) | (r << np.uint64(16)) | b
    if palette is not None:
        bw.put(1, 1)
        bw.put(3, 2)  # COLOR_INDEXING
        pal_size = len(palette)
        bw.put(pal_size - 1, 8)
        # palette as component-wise deltas
        deltas = np.zeros(pal_size, dtype=np.uint64)
        prev = 0
        for i, px in enumerate(int(p) for p in palette):
            d = 0
            for shift in (24, 16, 8, 0):
                dc = ((px >> shift) - (prev >> shift)) & 0xFF
                d |= dc << shift
            deltas[i] = d
            prev = px
        _write_helper_image(bw, deltas, pal_size, 1)
        # index + bundle
        lut = {int(p): i for i, p in enumerate(palette)}
        idx = np.array([lut[int(p)] for p in argb], dtype=np.uint64).reshape(h, w)
        width_bits = (3 if pal_size <= 2 else 2 if pal_size <= 4
                      else 1 if pal_size <= 16 else 0)
        if width_bits:
            per = 1 << width_bits
            idx_bits = 8 >> width_bits
            pw = (w + per - 1) // per
            packed = np.zeros((h, pw), dtype=np.uint64)
            for sub in range(per):
                cols = np.arange(sub, w, per)
                packed[:, cols // per] |= idx[:, cols] << np.uint64(sub * idx_bits)
            green = packed
            xsize = pw
        else:
            green = idx
            xsize = w
        argb = (np.uint64(0xFF000000) | (green << np.uint64(8))).reshape(-1)
    bw.put(0, 1)  # end of transforms

    # ---- main image: cache info, meta bit, groups, tokens
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    n_groups = 1
    if meta_bits:
        assert meta_index is not None
        bw.put(1, 1)
        bw.put(meta_bits - 2, 3)
        ew = (xsize + (1 << meta_bits) - 1) >> meta_bits
        eh = (h + (1 << meta_bits) - 1) >> meta_bits
        assert meta_index.size == ew * eh
        entropy_px = (np.uint64(0xFF000000)
                      | ((meta_index.astype(np.uint64) & np.uint64(0xFF)) << 8)
                      | ((meta_index.astype(np.uint64) >> 8) << 16)
                      ).reshape(-1)
        _write_helper_image(bw, entropy_px, ew, eh)
        n_groups = int(meta_index.max()) + 1
    else:
        bw.put(0, 1)

    tokens = _tokenize(argb, xsize, cache_bits, lz77)
    mapped = {}
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * xsize + dx
        if d >= 1 and d not in mapped:
            mapped[d] = i + 1

    # split tokens by huffman group (pixel-position walk)
    def tile_of(pos: int) -> int:
        if not meta_bits:
            return 0
        x, y = pos % xsize, pos // xsize
        ew = (xsize + (1 << meta_bits) - 1) >> meta_bits
        return int(meta_index.reshape(-1)[(y >> meta_bits) * ew + (x >> meta_bits)])

    # per-group frequencies
    freqs = [[dict() for _ in range(5)] for _ in range(n_groups)]

    def bump(gi: int, fi: int, s: int) -> None:
        freqs[gi][fi][s] = freqs[gi][fi].get(s, 0) + 1

    pos = 0
    for t in tokens:
        gi = tile_of(pos)
        if t[0] == "lit":
            _, a, r, g, b = t
            bump(gi, 0, g)
            bump(gi, 1, r)
            bump(gi, 2, b)
            bump(gi, 3, a)
            pos += 1
        elif t[0] == "cache":
            bump(gi, 0, 256 + 24 + t[1])
            pos += 1
        else:
            _, length, dist, direct = t
            lcode, _, _ = _lz77_prefix(length)
            bump(gi, 0, 256 + lcode)
            dist_code = dist + 120 if direct else mapped[dist]
            dcode, _, _ = _lz77_prefix(dist_code)
            bump(gi, 4, dcode)
            pos += length
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = (256 + 24 + cache_size, 256, 256, 256, 40)
    group_codes = []
    for gi in range(n_groups):
        group_codes.append([_write_prefix_code(bw, freqs[gi][i], sizes[i])
                            for i in range(5)])
    pos = 0
    for t in tokens:
        codes = group_codes[tile_of(pos)]
        if t[0] == "lit":
            _, a, r, g, b = t
            codes[0].emit(bw, g)
            codes[1].emit(bw, r)
            codes[2].emit(bw, b)
            codes[3].emit(bw, a)
            pos += 1
        elif t[0] == "cache":
            codes[0].emit(bw, 256 + 24 + t[1])
            pos += 1
        else:
            _, length, dist, direct = t
            lcode, lx, lxb = _lz77_prefix(length)
            codes[0].emit(bw, 256 + lcode)
            if lxb:
                bw.put(lx, lxb)
            dist_code = dist + 120 if direct else mapped[dist]
            dcode, dx_, dxb = _lz77_prefix(dist_code)
            codes[4].emit(bw, dcode)
            if dxb:
                bw.put(dx_, dxb)
            pos += length
    return bw.bytes()


def _write_helper_image(bw: _LsbWriter, argb: np.ndarray, w: int, h: int) -> None:
    """Helper (entropy/predictor/color/palette) image: no meta bit, no
    cache, literal tokens with fresh prefix codes."""
    bw.put(0, 1)  # no color cache
    tokens = _tokenize(argb, w, 0, False)
    freqs = [dict() for _ in range(5)]
    for t in tokens:
        _, a, r, g, b = t
        for fi, s in ((0, g), (1, r), (2, b), (3, a)):
            freqs[fi][s] = freqs[fi].get(s, 0) + 1
    sizes = (256 + 24, 256, 256, 256, 40)
    codes = [_write_prefix_code(bw, freqs[i], sizes[i]) for i in range(5)]
    for t in tokens:
        _, a, r, g, b = t
        codes[0].emit(bw, g)
        codes[1].emit(bw, r)
        codes[2].emit(bw, b)
        codes[3].emit(bw, a)


# ---- independent scalar transform math (encoder side) ----------------------


def _ch(p: int) -> tuple[int, int, int, int]:
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)


def _mk(a: int, r: int, g: int, b: int) -> int:
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _enc_avg2(a: int, b: int) -> int:
    return _mk(*((x + y) >> 1 for x, y in zip(_ch(a), _ch(b))))


def _enc_clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _enc_predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _enc_avg2(_enc_avg2(left, tr), top)
    if mode == 6:
        return _enc_avg2(left, tl)
    if mode == 7:
        return _enc_avg2(left, top)
    if mode == 8:
        return _enc_avg2(tl, top)
    if mode == 9:
        return _enc_avg2(top, tr)
    if mode == 10:
        return _enc_avg2(_enc_avg2(left, tl), _enc_avg2(top, tr))
    if mode == 11:
        lc, tc, tlc = _ch(left), _ch(top), _ch(tl)
        p = [a + b - c for a, b, c in zip(lc, tc, tlc)]
        pl = sum(abs(x - y) for x, y in zip(p, lc))
        pt = sum(abs(x - y) for x, y in zip(p, tc))
        return left if pl < pt else top
    if mode == 12:
        lc, tc, tlc = _ch(left), _ch(top), _ch(tl)
        return _mk(*(_enc_clamp(a + b - c) for a, b, c in zip(lc, tc, tlc)))
    if mode == 13:
        av = _ch(_enc_avg2(left, top))
        tlc = _ch(tl)
        return _mk(*(_enc_clamp(a + int((a - c) / 2)) for a, c in zip(av, tlc)))
    raise ValueError(mode)


def _forward_predictor(argb: np.ndarray, w: int, h: int,
                       modes: np.ndarray, bits: int) -> np.ndarray:
    tiles_w = (w + (1 << bits) - 1) >> bits
    flat = modes.reshape(-1)
    out = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[pos - 1])
            elif x == 0:
                pred = int(argb[pos - w])
            else:
                mode = int(flat[(y >> bits) * tiles_w + (x >> bits)])
                pred = _enc_predict(mode, int(argb[pos - 1]), int(argb[pos - w]),
                                    int(argb[pos - w - 1]), int(argb[pos - w + 1]))
            pc, cc = _ch(pred), _ch(int(argb[pos]))
            out[pos] = _mk(*(((c - p) & 0xFF) for c, p in zip(cc, pc)))
    return out


def _enc_ct_delta(t: int, c: int) -> int:
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _forward_color_transform(argb: np.ndarray, w: int, h: int,
                             ctes: np.ndarray, bits: int) -> np.ndarray:
    tiles_w = (w + (1 << bits) - 1) >> bits
    flat = ctes.reshape(-1)
    out = argb.copy()
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            cte = int(flat[(y >> bits) * tiles_w + (x >> bits)])
            g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
            px = int(argb[pos])
            a, r, g, b = _ch(px)
            nr = (r - _enc_ct_delta(g2r, g)) & 0xFF
            nb = (b - _enc_ct_delta(g2b, g) - _enc_ct_delta(r2b, r)) & 0xFF
            out[pos] = _mk(a, nr, g, nb)
    return out


def make_webp(pixels: np.ndarray, **config) -> bytes:
    """RIFF/WEBP container around a VP8L chunk."""
    payload = make_vp8l(pixels, **config)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
