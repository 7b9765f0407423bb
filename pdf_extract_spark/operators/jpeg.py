"""JPEG decoder (baseline + progressive) — pure stdlib + numpy, no
PIL/libjpeg.

Implements the DCT processes of ITU-T T.81 that cover essentially all web
JPEGs: baseline sequential (SOF0/1, interleaved or per-component scans)
and progressive (SOF2: spectral selection + successive approximation for
both DC and AC, EOB runs).  Marker parse, canonical Huffman entropy
decode with byte-stuffing and restart markers, a per-frame coefficient
store filled scan by scan, then one batched dequantize + 8x8 IDCT (two
dense matrix products over all blocks at once), nearest-neighbor chroma
upsampling, and the JFIF YCbCr->RGB transform.  Arithmetic coding,
hierarchical, and 12-bit precision raise NotImplementedError and fall to
the multimodal stub tier.

The entropy loop is per-symbol Python — correct first, and fast enough
for thumbnail-feature extraction of typical web images; a numpy batch
Huffman pass is the known upgrade path if JPEG decode ever becomes a
pipeline bottleneck rather than a capability.

Upstream of this engine the reference has no media decoding at all; this
module exists for the LLM-data-pipeline multimodal tier
(operators/multimodal.py), where its correctness is oracled against
closed-form expectations on handcrafted fixtures
(sources/media_corpus.py:make_jpeg) — coefficients are chosen so pixel
expectations derive from the T.81 IDCT math, never from this code.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
# flat (row*8 + col) index per zigzag position, for vectorized scatter
_ZIG_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG])

# IDCT basis: f = T.T @ F @ T with T[u, x] = c(u) cos((2x+1) u pi / 16) / 2
_IDCT_T = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            / 2.0
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _Huff:
    """Canonical Huffman table: (length, code) -> symbol."""

    __slots__ = ("lut", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
                self.max_len = length
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any non-RST marker (pos stays AT the
    marker's 0xFF, so the caller resumes the marker loop there)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad with zeros past the end (spec allows)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                else:
                    # a real marker: pad; caller handles RST via align()
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, table.max_len + 1):
            code = (code << 1) | self.bits(1)
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_to_marker(self) -> int | None:
        """Skip to the next marker (for RST handling); returns marker byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t low bits to the signed coefficient value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "bw_pad", "bh_pad", "bw", "bh", "coef")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq


def decode_jpeg(payload: bytes):
    """Baseline or progressive JPEG -> HxWx3 uint8 RGB array."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[_Component] | None = None
    w = h = None
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    progressive = False
    restart_interval = 0
    saw_scan = False
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1  # tolerate fill bytes
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(
                    seg[i : i + 64], dtype=np.uint8
                ).astype(np.float64)  # zigzag order
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                syms = seg[i + 17 : i + 17 + nsym]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, syms)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 15, tq))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c.bw_pad = mcus_x * c.h
                c.bh_pad = mcus_y * c.v
                # non-interleaved scans cover only the component's own
                # ceil-dims block grid (T.81 A.2.2), not the MCU padding
                comp_w = -(-(w * c.h) // hmax)
                comp_h = -(-(h * c.v) // vmax)
                c.bw = -(-comp_w // 8)
                c.bh = -(-comp_h // 8)
                c.coef = np.zeros((c.bh_pad, c.bw_pad, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("lossless/arithmetic/hierarchical JPEG")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            by_id = {c.cid: c for c in comps}
            for s in range(ns):
                cid, tt = seg[1 + 2 * s : 3 + 2 * s]
                scan_comps.append((by_id[cid], tt >> 4, tt & 15))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                payload, pos + seglen, scan_comps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, mcus_x, mcus_y,
            )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan:
        raise ValueError("no SOS marker found")
    return _finish(comps, qt, w, h, hmax, vmax)


def _decode_scan(payload, pos, scan_comps, ss, se, ah, al,
                 huff_dc, huff_ac, restart_interval, mcus_x, mcus_y):
    """Decode one entropy-coded scan into the components' coefficient
    stores; returns the byte position of the next marker.  Handles all
    four progressive scan kinds (DC/AC x first/refine) plus sequential
    full-band scans; a multi-component scan iterates MCUs, a
    single-component scan iterates that component's own block raster."""
    br = _BitReader(payload, pos)
    interleaved = len(scan_comps) > 1
    pred = {c.cid: 0 for c, _, _ in scan_comps}
    eobrun = 0
    p1 = 1 << al

    def dc_first(c, td, by, bx):
        t = br.huff(huff_dc[td])
        pred[c.cid] += _extend(br.bits(t), t)
        c.coef[by, bx, 0] = pred[c.cid] << al

    def dc_refine(c, by, bx):
        if br.bits(1):
            c.coef[by, bx, 0] |= p1

    def seq_block(c, td, ta, by, bx):
        dc_first(c, td, by, bx)
        blk = c.coef[by, bx]
        ac = huff_ac[ta]
        k = 1
        while k < 64:
            rs = br.huff(ac)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                break
            s = rs & 15
            blk[k] = _extend(br.bits(s), s)
            k += 1

    def ac_first(c, ta, by, bx):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        blk = c.coef[by, bx]
        ac = huff_ac[ta]
        k = ss
        while k <= se:
            rs = br.huff(ac)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn: run of (1<<r)+bits(r) all-done blocks
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                return
            blk[k] = _extend(br.bits(s), s) << al
            k += 1

    def ac_refine(c, ta, by, bx):
        # T.81 G.1.2.3 AC successive-approximation refinement: newly
        # nonzero coefficients arrive as +-p1; every already-nonzero
        # coefficient visited costs one correction bit.  Python's
        # infinite two's-complement & matches the C bit test exactly.
        nonlocal eobrun
        m1 = -p1
        blk = c.coef[by, bx]
        ac = huff_ac[ta]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.huff(ac)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += br.bits(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    # s must be 1 in a refinement scan; sign bit follows
                    val = p1 if br.bits(1) else m1
                while k <= se:
                    if blk[k] != 0:
                        if br.bits(1) and (int(blk[k]) & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0 and br.bits(1) and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            eobrun -= 1

    def do_unit(c, td, ta, by, bx):
        if ss == 0 and se == 63:  # sequential full band
            seq_block(c, td, ta, by, bx)
        elif ss == 0:  # progressive DC scan (se == 0 per spec)
            if ah == 0:
                dc_first(c, td, by, bx)
            else:
                dc_refine(c, by, bx)
        elif ah == 0:
            ac_first(c, ta, by, bx)
        else:
            ac_refine(c, ta, by, bx)

    def restart(count):
        nonlocal eobrun
        if restart_interval and count and count % restart_interval == 0:
            m = br.align_to_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError("expected restart marker")
            for cid in pred:
                pred[cid] = 0
            eobrun = 0

    if interleaved:
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                restart(unit)
                for c, td, ta in scan_comps:
                    for by in range(c.v):
                        for bx in range(c.h):
                            do_unit(c, td, ta, my * c.v + by, mx * c.h + bx)
                unit += 1
    else:
        c, td, ta = scan_comps[0]
        unit = 0
        for by in range(c.bh):
            for bx in range(c.bw):
                restart(unit)
                do_unit(c, td, ta, by, bx)
                unit += 1

    # consume any padding bits; pos already rests at the next marker's 0xFF
    return br.pos


def _finish(comps, qt, w, h, hmax, vmax):
    """Dequantize + batched IDCT + upsample + color transform."""
    T = _IDCT_T
    out = []
    for c in comps:
        deq = c.coef.reshape(-1, 64).astype(np.float64) * qt[c.tq]
        F = np.zeros((deq.shape[0], 64))
        F[:, _ZIG_FLAT] = deq
        F = F.reshape(-1, 8, 8)
        blocks = np.einsum("ux,nuv,vy->nxy", T, F, T) + 128.0
        plane = (
            blocks.reshape(c.bh_pad, c.bw_pad, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh_pad * 8, c.bw_pad * 8)
        )
        if c.h != hmax or c.v != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1
            )
        out.append(plane[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(out) == 3:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(out)}-component JPEG")
