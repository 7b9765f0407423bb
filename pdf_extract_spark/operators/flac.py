"""FLAC decoder — pure stdlib + numpy, no libFLAC.

Implements the FLAC format (RFC 9639): metadata-block parse (STREAMINFO),
frame sync with CRC-8-verified headers, all four subframe types
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC with quantized coefficients),
Rice/Rice2 partitioned residuals with escape-to-raw partitions, wasted
bits, stereo decorrelation (left/side, right/side, mid/side), and the
frame-level CRC-16 check.  FLAC is fully algorithmic — no tabulated
psycho-acoustics — which is why it can be exact here, and it is the
compressed audio format speech training corpora actually ship
(LibriSpeech et al.), so the multimodal tier decodes it natively.

Correctness strategy mirrors the other media decoders: a from-scratch
encoder (sources/media_corpus.py:make_flac) builds streams whose sample
expectations are the spec values we put in, and golden features derive
from those values — never from this code.
"""

from __future__ import annotations

import struct

import numpy as np

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
BITS_PER_SAMPLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (frame footer CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos")  # pos in BITS

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        pos = self.pos
        d = self.data
        while n > 0:
            byte = d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 7 bytes)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_more = 0
    mask = 0x40
    while first & mask:
        n_more += 1
        mask >>= 1
    if n_more == 0 or n_more > 6:
        raise ValueError("invalid coded number")
    v = first & (mask - 1)
    for _ in range(n_more):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _residual(bits: _Bits, blocksize: int, pred_order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = bits.read(param_bits)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))  # unzigzag
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        out = [bits.read_signed(bps)] * blocksize
    elif t == 1:  # VERBATIM
        out = [bits.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        coefs = FIXED_COEFS[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif t & 0x20:  # LPC, order (t & 0x1F) + 1
        order = (t & 0x1F) + 1
        warm = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """FLAC bytes -> (sample_rate, n_channels, bits_per_sample, samples
    int32 ndarray of shape (n_samples, n_channels)).  bps is returned so
    callers can normalize by the correct full-scale (2^(bps-1)) — the
    decoder itself supports 8..32-bit streams."""
    if not payload.startswith(b"fLaC"):
        raise ValueError("not a FLAC stream")
    pos = 4
    si_rate = si_bps = si_nch = None
    total_samples = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen < 34:
                raise ValueError("short STREAMINFO")
            b = _Bits(body)
            b.read(16); b.read(16); b.read(24); b.read(24)
            si_rate = b.read(20)
            si_nch = b.read(3) + 1
            si_bps = b.read(5) + 1
            total_samples = b.read(36)
            if total_samples == 0:
                total_samples = None  # spec: 0 == unknown; decode to EOF
        pos += 4 + blen
    if si_rate is None:
        raise ValueError("missing STREAMINFO")

    bits = _Bits(payload, pos * 8)
    channels_out: list[list[int]] = [[] for _ in range(si_nch)]
    got = 0
    while total_samples is None or got < total_samples:
        if bits.pos >= len(payload) * 8 - 15:
            break
        frame_start_byte = bits.pos >> 3
        sync = bits.read(14)
        if sync != 0b11111111111110:
            if total_samples is None and got:
                # unknown-length stream with at least one decoded frame:
                # trailing non-frame bytes (padding, tags) end the stream
                # rather than discarding an otherwise fully decoded signal
                break
            raise ValueError("lost frame sync")
        if bits.read(1):
            raise ValueError("reserved sync bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved header bit set")
        _utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in SAMPLE_RATES:
            rate = SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = bits.read(8) * 1000
        elif sr_code == 13:
            rate = bits.read(16)
        elif sr_code == 14:
            rate = bits.read(16) * 10
        else:
            raise ValueError("invalid sample-rate code")
        bps = si_bps if ss_code == 0 else BITS_PER_SAMPLE.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample-size code")
        header_end_byte = bits.pos >> 3
        if crc8(payload[frame_start_byte:header_end_byte]) != bits.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_subframe(bits, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the side channel carries one extra bit
            if ch_code == 8:    # left/side
                left = _subframe(bits, blocksize, bps)
                side = _subframe(bits, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _subframe(bits, blocksize, bps + 1)
                right = _subframe(bits, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:               # mid/side
                mid = _subframe(bits, blocksize, bps)
                side = _subframe(bits, blocksize, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError("reserved channel assignment")
        if nch != si_nch:
            raise ValueError("frame channel count != STREAMINFO")
        bits.align()
        frame_bytes = payload[frame_start_byte : bits.pos >> 3]
        if crc16(frame_bytes) != bits.read(16):
            raise ValueError("frame CRC-16 mismatch")
        for c in range(nch):
            channels_out[c].extend(subs[c])
        got += blocksize

    samples = np.array(channels_out, dtype=np.int64).T
    if total_samples:
        samples = samples[:total_samples]
    return si_rate, si_nch, si_bps, samples.astype(np.int32)
