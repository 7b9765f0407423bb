"""WebP lossless (VP8L) decoder — pure Python/numpy, no PIL.

Implements the complete VP8L still-image bitstream per RFC 9649
("WebP Image Format") §3: the RIFF/WEBP container, LSB-first bit
reading, canonical prefix codes (DEFLATE-style code assignment with
reversed-bit lookup, simple 1/2-symbol codes, the 19-symbol
code-length code with 16/17/18 repeats and the max_symbol short
circuit), color cache, LZ77 backward references with the
120-entry short-distance neighbor map, meta prefix codes (entropy
image tiling), and all four transforms — PREDICTOR (14 modes),
COLOR (ColorTransformElement deltas), SUBTRACT_GREEN, and
COLOR_INDEXING (palette with sub-byte pixel bundling).

Lossy VP8 ("VP8 " chunk) is NOT implemented — it is a full video
intra-frame codec (boolean arithmetic decoder, mode prediction, loop
filter) and stays in the tagged stub tier.

The short-distance map is GENERATED, not transcribed: RFC 9649 defines
it as the 120 neighbor offsets (x, y) with y in [0,7], x in [-7,8]
(x >= 1 when y == 0), ordered by ascending squared Euclidean distance,
ties broken by larger y first, then positive x before negative — see
_short_distance_map() and the property test asserting the rule yields
exactly 120 unique decoded-pixel-referencing offsets.

Fixtures come from sources/media_corpus.py:make_webp — a from-scratch
VP8L *encoder* over formula-generated pixel arrays; expectations are
the input arrays themselves (the format is lossless), never this
decoder's output.  The encoder computes prediction/color-transform
residuals with its own scalar code so shared-bug round-trip
cancellation can't hide a kernel error.
"""

from __future__ import annotations

import struct

import numpy as np

# Code-length-code symbol transmission order (RFC 9649 §3.7.1.2,
# identical role to DEFLATE's but a different permutation).
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# Transform types (§3.6)
# decode-size cap for untrusted payloads (16M pixels ~ 64 MiB decoded);
# crawl-scale fixtures are tiny, and anything larger belongs in the stub tier
_MAX_PIXELS = 1 << 24

_PREDICTOR_TRANSFORM = 0
_COLOR_TRANSFORM = 1
_SUBTRACT_GREEN = 2
_COLOR_INDEXING = 3


def _short_distance_map() -> list[tuple[int, int]]:
    """The 120 (x, y) short-distance offsets, generated from the
    documented ordering rule rather than transcribed from the RFC's
    table: all offsets with y in [0, 7], x in [-7, 8], (x, y) != (0, 0),
    x >= 1 when y == 0, sorted by (x*x + y*y, -y, |x| sign: + first)."""
    offs = []
    for y in range(8):
        for x in range(-7, 9):
            if y == 0 and x < 1:
                continue
            offs.append((x, y))
    offs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] >= 0 else 1))
    assert len(offs) == 120
    return offs


_DIST_MAP = _short_distance_map()


class _Bits:
    """LSB-first bit reader over a bytes payload (§3.3)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        p = self.pos
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


class _Prefix:
    """Canonical prefix code: DEFLATE-style length-ordered code
    assignment, looked up by accumulating stream bits LSB-first (i.e.
    the table is keyed on the bit-reversed canonical code)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        self.single = None
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            # 0-bit code: decoding consumes nothing (§3.7.1.1)
            self.single = nz[0][0]
            self.table = {}
            return
        if not nz:
            raise ValueError("empty prefix code")
        max_len = max(ln for _, ln in nz)
        bl_count = [0] * (max_len + 1)
        for _, ln in nz:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table = {}
        for sym, ln in nz:  # nz is in symbol order == canonical order
            c = next_code[ln]
            next_code[ln] += 1
            rev = 0
            for i in range(ln):
                rev |= ((c >> i) & 1) << (ln - 1 - i)
            table[(ln, rev)] = sym
        if sum(1 << (max_len - ln) for _, ln in nz) != 1 << max_len:
            raise ValueError("prefix code over/under-subscribed")
        self.table = table

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        n = 0
        while n < 16:
            acc |= br.read(1) << n
            n += 1
            sym = self.table.get((n, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """§3.7.1: simple (1-2 symbol) or normal (code-length-coded)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[first] = 1  # placeholder; _Prefix treats it as 0-bit
            return _Prefix(lengths)
        second = br.read(8)
        if first == second or max(first, second) >= alphabet_size:
            raise ValueError("invalid simple prefix code")
        lengths[first] = 1
        lengths[second] = 1
        return _Prefix(lengths)
    # normal: 19-symbol code-length code
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # max_symbol short circuit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code = cl_code.decode(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_len = code
        elif code == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("code length repeat overflow")
                lengths[sym] = prev_len
                sym += 1
        elif code == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("code length run overflow")
    return _Prefix(lengths)


def _lz77_value(br: _Bits, prefix_code: int) -> int:
    """§3.7.2.2 prefix-coded LZ77 length/distance value."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


def _read_code_group(br: _Bits, cache_size: int) -> list[_Prefix]:
    sizes = (256 + 24 + cache_size, 256, 256, 256, 40)
    return [_read_prefix_code(br, n) for n in sizes]


def _decode_pixels(br: _Bits, w: int, h: int, groups, meta, meta_bits: int,
                   cache_bits: int) -> np.ndarray:
    """Spatially-coded ARGB image body -> uint32[h*w] (§3.7.2)."""
    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    tiles_w = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta is not None else 0
    pos = 0
    group = groups[0]
    last_tile = -1
    while pos < n:
        if meta is not None:
            x = pos % w
            y = pos // w
            tile = (y >> meta_bits) * tiles_w + (x >> meta_bits)
            if tile != last_tile:
                group = groups[meta[tile]]
                last_tile = tile
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(br)
        if s < 256:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, d_code.decode(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of bounds")
            for i in range(length):
                px = int(out[pos - dist + i])
                out[pos + i] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += length
            last_tile = -1  # force tile re-check after a copy span
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _decode_image_stream(br: _Bits, w: int, h: int) -> np.ndarray:
    """Main (spatially-coded) image body, read after the transform list:
    color-cache info, then the meta-prefix bit (entropy-image tiling),
    then the code groups and pixels.  Returns uint32[h*w] ARGB."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("invalid color cache size")
    # meta prefix codes (main image only; helper images are read via
    # _decode_helper which skips this bit)
    meta = None
    meta_bits = 0
    groups_count = 1
    if br.read(1):  # use meta prefix codes
        meta_bits = 2 + br.read(3)
        ew = (w + (1 << meta_bits) - 1) >> meta_bits
        eh = (h + (1 << meta_bits) - 1) >> meta_bits
        entropy = _decode_helper(br, ew, eh)
        meta = [((int(p) >> 8) & 0xFFFF) for p in entropy]
        groups_count = max(meta) + 1
    groups = [_read_code_group(br, (1 << cache_bits) if cache_bits else 0)
              for _ in range(groups_count)]
    return _decode_pixels(br, w, h, groups, meta, meta_bits, cache_bits)


def _decode_helper(br: _Bits, w: int, h: int) -> np.ndarray:
    """Helper (entropy/predictor/color/palette) image: single implicit
    tile structure — own color cache allowed, no meta prefix codes."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("invalid color cache size")
    groups = [_read_code_group(br, (1 << cache_bits) if cache_bits else 0)]
    return _decode_pixels(br, w, h, groups, None, 0, cache_bits)


# ---------------------------------------------------------------- transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _avg2_px(a: int, b: int) -> tuple[int, int, int, int]:
    return tuple(_avg2((a >> s) & 0xFF, (b >> s) & 0xFF) for s in (24, 16, 8, 0))


def _channels(p: int) -> tuple[int, int, int, int]:
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)


def _pack(ch) -> int:
    a, r, g, b = ch
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l_px: int, t_px: int, tl_px: int) -> int:
    lch, tch, tlch = _channels(l_px), _channels(t_px), _channels(tl_px)
    p = [lc + tc - tlc for lc, tc, tlc in zip(lch, tch, tlch)]
    p_l = sum(abs(pc - lc) for pc, lc in zip(p, lch))
    p_t = sum(abs(pc - tc) for pc, tc in zip(p, tch))
    return l_px if p_l < p_t else t_px


def _predict(mode: int, l_px: int, t_px: int, tl_px: int, tr_px: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l_px
    if mode == 2:
        return t_px
    if mode == 3:
        return tr_px
    if mode == 4:
        return tl_px
    if mode == 5:
        return _pack(_avg2_px(_pack(_avg2_px(l_px, tr_px)), t_px))
    if mode == 6:
        return _pack(_avg2_px(l_px, tl_px))
    if mode == 7:
        return _pack(_avg2_px(l_px, t_px))
    if mode == 8:
        return _pack(_avg2_px(tl_px, t_px))
    if mode == 9:
        return _pack(_avg2_px(t_px, tr_px))
    if mode == 10:
        return _pack(_avg2_px(_pack(_avg2_px(l_px, tl_px)), _pack(_avg2_px(t_px, tr_px))))
    if mode == 11:
        return _select(l_px, t_px, tl_px)
    if mode == 12:  # ClampAddSubtractFull
        lch, tch, tlch = _channels(l_px), _channels(t_px), _channels(tl_px)
        return _pack(tuple(_clamp255(lc + tc - tlc)
                           for lc, tc, tlc in zip(lch, tch, tlch)))
    if mode == 13:  # ClampAddSubtractHalf (C-style trunc-toward-zero halve)
        ave = _avg2_px(l_px, t_px)
        tlch = _channels(tl_px)
        return _pack(tuple(_clamp255(av + int((av - tlc) / 2))
                           for av, tlc in zip(ave, tlch)))
    raise ValueError(f"invalid predictor mode {mode}")


def _apply_predictor_inverse(argb: np.ndarray, w: int, h: int,
                             modes: np.ndarray, size_bits: int) -> None:
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[pos - 1])  # L
            elif x == 0:
                pred = int(argb[pos - w])  # T
            else:
                mode = int(modes[(y >> size_bits) * tiles_w + (x >> size_bits)]) >> 8 & 0xFF
                l_px = int(argb[pos - 1])
                t_px = int(argb[pos - w])
                tl_px = int(argb[pos - w - 1])
                # top-right of the rightmost column = first pixel of the
                # current row (RFC 9649 §3.6.2 border rule)
                tr_px = int(argb[pos - w + 1])
                pred = _predict(mode, l_px, t_px, tl_px, tr_px)
            res = int(argb[pos])
            a = ((res >> 24) + (pred >> 24)) & 0xFF
            r = (((res >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF
            g = (((res >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF
            b = ((res & 0xFF) + (pred & 0xFF)) & 0xFF
            argb[pos] = (a << 24) | (r << 16) | (g << 8) | b


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (§3.6.3)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_color_transform_inverse(argb: np.ndarray, w: int, h: int,
                                   ctes: np.ndarray, size_bits: int) -> None:
    tiles_w = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            cte = int(ctes[(y >> size_bits) * tiles_w + (x >> size_bits)])
            red_to_blue = (cte >> 16) & 0xFF
            green_to_blue = (cte >> 8) & 0xFF
            green_to_red = cte & 0xFF
            px = int(argb[pos])
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(green_to_red, g)) & 0xFF
            b = (b + _ct_delta(green_to_blue, g) + _ct_delta(red_to_blue, r)) & 0xFF
            argb[pos] = (px & 0xFF00FF00) | (r << 16) | b


def _apply_subtract_green_inverse(argb: np.ndarray) -> None:
    g = (argb >> np.uint32(8)) & np.uint32(0xFF)
    r = ((argb >> np.uint32(16)) + g) & np.uint32(0xFF)
    b = (argb + g) & np.uint32(0xFF)
    argb[:] = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> HxWx4 uint8 ARGB-order (a, r, g, b)."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _Bits(data)
    br.read(8)  # signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    # the 14-bit header fields admit up to 16383x16383 = 268M pixels from a
    # tiny payload (0-bit single-symbol prefix codes consume no stream bits
    # per pixel), which would spin the per-pixel Python loop for hours on
    # untrusted crawl bytes; cap decoded size so a crafted header lands in
    # the tagged stub/quarantine tier instead of stalling an executor task
    if w * h > _MAX_PIXELS:
        raise ValueError(f"VP8L dimensions {w}x{h} exceed decode cap")
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")

    # transforms (§3.6) — each type at most once, applied inverse in
    # reverse order after pixel decoding
    transforms = []
    xsize = w  # effective coded width (color indexing may pack pixels)
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate transform")
        seen.add(ttype)
        if ttype == _PREDICTOR_TRANSFORM or ttype == _COLOR_TRANSFORM:
            size_bits = 2 + br.read(3)
            tw = (xsize + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            tile_img = _decode_helper(br, tw, th)
            transforms.append((ttype, size_bits, tile_img))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype, 0, None))
        else:  # COLOR_INDEXING
            pal_size = br.read(8) + 1
            pal = _decode_helper(br, pal_size, 1)
            # palette entries are delta-coded component-wise (§3.6.4)
            acc = np.zeros(4, dtype=np.uint32)
            palette = np.zeros(pal_size, dtype=np.uint32)
            for i in range(pal_size):
                ch = np.array(_channels(int(pal[i])), dtype=np.uint32)
                acc = (acc + ch) & np.uint32(0xFF)
                palette[i] = _pack(tuple(int(v) for v in acc))
            width_bits = (3 if pal_size <= 2 else 2 if pal_size <= 4
                          else 1 if pal_size <= 16 else 0)
            transforms.append((ttype, width_bits, palette))
            xsize = (xsize + (1 << width_bits) - 1) >> width_bits

    argb = _decode_image_stream(br, xsize, h)

    for ttype, bits, aux in reversed(transforms):
        if ttype == _COLOR_INDEXING:
            palette = aux
            width_bits = bits
            if width_bits:
                per = 1 << width_bits
                idx_bits = 8 >> width_bits
                mask = (1 << idx_bits) - 1
                packed = argb.reshape(h, xsize)
                full = np.zeros((h, w), dtype=np.uint32)
                for sub in range(per):
                    cols = np.arange(sub, w, per)
                    src = (packed[:, (cols // per)] >> np.uint32(8))
                    vals = (src >> np.uint32((sub % per) * idx_bits)) & np.uint32(mask)
                    full[:, cols] = vals
                idx = full.reshape(-1)
            else:
                idx = (argb >> np.uint32(8)) & np.uint32(0xFF)
            safe = np.where(idx < len(palette), idx, 0)
            argb = palette[safe.astype(np.int64)]
            argb[idx >= len(palette)] = 0
            xsize = w
        elif ttype == _SUBTRACT_GREEN:
            _apply_subtract_green_inverse(argb)
        elif ttype == _COLOR_TRANSFORM:
            _apply_color_transform_inverse(argb, w, h, aux, bits)
        else:
            _apply_predictor_inverse(argb, w, h, aux, bits)

    out = np.zeros((h * w, 4), dtype=np.uint8)
    out[:, 0] = (argb >> np.uint32(24)) & np.uint32(0xFF)
    out[:, 1] = (argb >> np.uint32(16)) & np.uint32(0xFF)
    out[:, 2] = (argb >> np.uint32(8)) & np.uint32(0xFF)
    out[:, 3] = argb & np.uint32(0xFF)
    return out.reshape(h, w, 4)


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container -> HxWx3 uint8 RGB (alpha dropped, matching
    the other image decoders).  Only the lossless 'VP8L ' chunk decodes;
    lossy 'VP8 ' and extended 'VP8X' raise NotImplementedError into the
    tagged stub tier."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            if len(data) != size:
                raise ValueError("truncated VP8L chunk")
            argb = decode_vp8l(data)
            return argb[:, :, 1:4]  # -> RGB
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP (VP8/VP8X) requires a full video "
                "intra-frame codec; only VP8L decodes natively"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP without an image chunk")
