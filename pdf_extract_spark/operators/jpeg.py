"""Baseline JPEG decoder — pure stdlib + numpy, no PIL/libjpeg.

Implements the baseline sequential DCT process of ITU-T T.81 (the format
of essentially all web JPEGs that are not progressive): marker parse,
canonical Huffman entropy decode with byte-stuffing and restart markers,
dequantization, 8x8 IDCT as two dense matrix products, nearest-neighbor
chroma upsampling, and the JFIF YCbCr->RGB transform.  Progressive
(SOF2), arithmetic coding, and 12-bit precision raise NotImplementedError
and fall to the multimodal stub tier.

The entropy loop is per-symbol Python — correct first, and fast enough
for thumbnail-feature extraction of typical web images; a numpy batch
Huffman pass is the known upgrade path if JPEG decode ever becomes a
pipeline bottleneck rather than a capability.

Upstream of this engine the reference has no media decoding at all; this
module exists for the LLM-data-pipeline multimodal tier
(operators/multimodal.py), where its correctness is oracled against
closed-form expectations on handcrafted DC-only fixtures
(sources/media_corpus.py:make_jpeg_gray) — a flat block decodes to
exactly F(0,0)/8 + 128, so golden features derive from the spec, never
from this code.
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
    byte-unstuffing; stops at any non-RST marker."""

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


def decode_jpeg(payload: bytes):
    """Baseline JPEG -> HxWx3 uint8 RGB array."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps = None  # [(id, H, V, Tq)]
    w = h = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1  # tolerate fill bytes
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
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
                tbl = np.zeros((8, 8), dtype=np.float64)
                for k in range(64):
                    tbl[_ZIGZAG[k]] = seg[i + k]
                qt[tq] = tbl
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/extended JPEG process")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_map = {}
            for s in range(ns):
                cid, tt = seg[1 + 2 * s : 3 + 2 * s]
                scan_map[cid] = (tt >> 4, tt & 15)
            if set(scan_map) != {c[0] for c in comps}:
                # spec-legal but rare: multiple single-component scans
                raise NotImplementedError("non-interleaved multi-scan JPEG")
            data_start = pos + seglen
            return _decode_scan(
                payload, data_start, w, h, comps, scan_map, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, w, h, comps, scan_map, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
    br = _BitReader(payload, pos)
    pred = {c[0]: 0 for c in comps}
    T = _IDCT_T
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected restart marker")
                pred = {c[0]: 0 for c in comps}
            for cid, ch, cv, tq in comps:
                dc_tbl = huff_dc[scan_map[cid][0]]
                ac_tbl = huff_ac[scan_map[cid][1]]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        F = np.zeros((8, 8), dtype=np.float64)
                        t = br.huff(dc_tbl)
                        diff = _extend(br.bits(t), t)
                        pred[cid] += diff
                        F[0, 0] = pred[cid] * q[0, 0]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tbl)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                break
                            s = rs & 15
                            F[_ZIGZAG[k]] = _extend(br.bits(s), s) * q[_ZIGZAG[k]]
                            k += 1
                        block = T.T @ F @ T + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample each plane to full padded resolution (nearest), crop, stack
    full_h, full_w = mcus_y * vmax * 8, mcus_x * hmax * 8
    out = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:full_h, :full_w][:h, :w])
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
