"""Deterministic synthetic media corpus for the multimodal operator family.

Every asset is built from a closed-form SPEC (gradient/solid images, known
per-window-amplitude audio, a fake compressed blob), so its expected
features (width/height, 4x4 thumbnail, RMS windows, decoder tag) are
derivable WITHOUT running the decoders — `tools/gen_golden_media.py` turns
the same specs into `dist/golden_media.parquet`, giving `media_features`
a true independent oracle.

Amplitudes/values are chosen so the float math is EXACT (powers of two for
audio, integer/255 for images): the spec-side float64 expectations equal
the decoder-side results bit-for-bit after the float32 column cast.
"""

from __future__ import annotations

import io
import struct
import wave

# (name, w, h) gradient PPMs: pixel value at x = x * 255 // (w - 1)
PPM_SPECS = [("ppm-grad-16x8", 16, 8), ("ppm-grad-7x5", 7, 5), ("ppm-grad-64x64", 64, 64)]
# (name, w, h, value) solid BMPs
BMP_SPECS = [("bmp-solid-10x6", 10, 6, 128), ("bmp-solid-5x9", 5, 9, 32)]
# (name, rate, n_channels, amplitudes[16]) WAVs: 64 samples per window,
# constant int16 amplitude per window — all from {0, +-4096, +-8192, +-16384}
# (x/32768 a power of two => RMS == |x|/32768 exactly in float64)
WAV_SPECS = [
    ("wav-steps-mono", 8000, 1,
     [0, 4096, 8192, 16384, 0, -4096, -8192, -16384,
      16384, 8192, 4096, 0, 4096, 4096, 8192, 0]),
    ("wav-steps-stereo", 16000, 2,
     [8192, 8192, 0, 0, 16384, 4096, 0, 8192,
      4096, 0, 16384, 16384, 0, 8192, 4096, 0]),
]
# (name, w, h, color_type) PNGs: pixel value v(x, y) = (x*7 + y*13) % 256,
# identical across color channels (alpha 255 where present); row y uses
# scanline filter type y % 5, so one image exercises every RFC 2083 filter
PNG_SPECS = [
    ("png-gray-11x7", 11, 7, 0),
    ("png-rgb-16x16", 16, 16, 2),
    ("png-rgba-5x13", 5, 13, 6),
]
# fake compressed payloads -> deterministic stub tier (the fake PNG carries
# a real signature but garbage chunks: exercises the decode-failure -> stub
# fallback path of the REAL png decoder)
STUB_SPECS = [
    ("stub-fake-png", b"\x89PNG\r\n\x1a\nnot-actually-a-png-payload-0001"),
    ("stub-fake-jpeg", b"\xff\xd8\xffnot-actually-a-jpeg-payload-0002"),
]


def png_pixel(x: int, y: int) -> int:
    """The PNG spec's closed-form pixel value (shared with the golden)."""
    return (x * 7 + y * 13) % 256


def make_ppm(w: int, h: int) -> bytes:
    body = bytearray()
    for _y in range(h):
        for x in range(w):
            v = x * 255 // (w - 1)
            body += bytes([v, v, v])
    return b"P6\n# synthetic gradient\n%d %d\n255\n" % (w, h) + bytes(body)


def make_bmp(w: int, h: int, value: int) -> bytes:
    stride = (w * 3 + 3) & ~3
    img = bytes([value, value, value] * w + [0] * (stride - w * 3)) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(img), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return header + img


def make_png(w: int, h: int, color_type: int = 0) -> bytes:
    """Spec-correct PNG encoder (RFC 2083): 8-bit depth, non-interlaced,
    row y filtered with type y % 5 so decoding exercises None/Sub/Up/
    Average/Paeth.  Pixels come from png_pixel — the golden derives
    features from that formula, never from the decoder."""
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    nch = {0: 1, 2: 3, 6: 4}[color_type]

    def px(x: int, y: int) -> tuple:
        v = png_pixel(x, y)
        if color_type == 0:
            return (v,)
        if color_type == 2:
            return (v, v, v)
        return (v, v, v, 255)

    raw = bytearray()
    prev = [0] * (w * nch)
    for y in range(h):
        row = [c for x in range(w) for c in px(x, y)]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = [
                (row[i] - (row[i - nch] if i >= nch else 0)) & 255
                for i in range(len(row))
            ]
        elif ft == 2:  # Up
            filt = [(row[i] - prev[i]) & 255 for i in range(len(row))]
        elif ft == 3:  # Average
            filt = [
                (row[i] - (((row[i - nch] if i >= nch else 0) + prev[i]) >> 1)) & 255
                for i in range(len(row))
            ]
        else:  # Paeth
            filt = []
            for i in range(len(row)):
                a = row[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt.append((row[i] - pr) & 255)
        raw += bytes(filt)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# Baseline-JPEG handcrafting (ITU-T T.81): DC-only flat 8x8 blocks with an
# all-ones quant table decode to EXACTLY pixel = F(0,0)/8 + 128, so fixture
# expectations are closed-form.  DC Huffman table = the public Annex K.3.3.1
# luminance table (exercises multi-length canonical decode); AC table is a
# minimal one-symbol (EOB) table since flat blocks emit no AC coefficients.
_JPEG_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_SYMBOLS = list(range(12))
_JPEG_AC_COUNTS = [1] + [0] * 15
_JPEG_AC_SYMBOLS = [0x00]  # EOB


def _huff_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (same construction the decoder
    reverses)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def make_jpeg(block_vals: list[list[int]], color: bool = False,
              subsample420: bool = False) -> bytes:
    """Baseline JFIF bytes for a grid of flat 8x8 blocks: pixel value of
    block (r, c) = block_vals[r][c] (0..255 integers).  With `color`, a
    3-component image with Cb = Cr = 128 (decodes to gray RGB exactly);
    with `subsample420` (implies color), Y is 2x2-sampled vs 1x1 chroma —
    the dominant web-JPEG layout — and the block grid must be even."""
    rows, cols = len(block_vals), len(block_vals[0])
    w, h = cols * 8, rows * 8
    if subsample420:
        color = True
        assert rows % 2 == 0 and cols % 2 == 0, "4:2:0 needs an even grid"
    dc = _huff_codes(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac = _huff_codes(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, all ones
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    y_hv = 0x22 if subsample420 else 0x11
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, y_hv if cid == 1 else 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(
        0xC4, bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMBOLS)
    )
    out += seg(
        0xC4, bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMBOLS)
    )
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    pred = {cid: 0 for cid in range(1, ncomp + 1)}

    def put_block(cid: int, coeff: int):
        diff = coeff - pred[cid]
        pred[cid] = coeff
        mag = abs(diff)
        t = mag.bit_length()
        code, length = dc[t]
        bw.put(code, length)
        if t:
            bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
        code, length = ac[0x00]  # EOB: no AC coefficients
        bw.put(code, length)

    if subsample420:
        for mr in range(rows // 2):
            for mc in range(cols // 2):
                # MCU: 4 Y blocks (2x2, raster) then one Cb, one Cr
                for by in range(2):
                    for bx in range(2):
                        put_block(1, (block_vals[mr * 2 + by][mc * 2 + bx] - 128) * 8)
                put_block(2, 0)
                put_block(3, 0)
    else:
        for r in range(rows):
            for c in range(cols):
                # MCU order (4:4:4 / gray): Y block then Cb, Cr
                put_block(1, (block_vals[r][c] - 128) * 8)
                if color:
                    put_block(2, 0)  # Cb = 128
                    put_block(3, 0)  # Cr = 128
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# (name, block grid, color, subsample420) — values chosen to cover
# positive/negative/zero DC diffs across blocks; expectations are the grid
# values themselves
JPEG_SPECS = [
    ("jpeg-gray-1blk", [[200]], False, False),
    ("jpeg-gray-4x2", [[0, 64, 128, 255], [255, 128, 64, 0]], False, False),
    ("jpeg-color-2x2", [[32, 224], [224, 32]], True, False),
    ("jpeg-420-4x4", [[16, 48, 80, 112], [144, 176, 208, 240],
                      [240, 208, 176, 144], [112, 80, 48, 16]], True, True),
]


def jpeg_pixel(block_vals: list[list[int]], x: int, y: int) -> int:
    return block_vals[y // 8][x // 8]


# (name, w, h, palette_bits) GIFs: palette entry i is gray
# i * 255 // (2^bits - 1); pixel index at (x, y) = (x + y) % 2^bits
GIF_SPECS = [
    ("gif-2bit-13x9", 13, 9, 2),
    ("gif-4bit-20x11", 20, 11, 4),
]


def gif_gray(bits: int, x: int, y: int) -> int:
    """Closed-form gray value of the GIF spec pattern (shared with the
    golden generator)."""
    n = 1 << bits
    return ((x + y) % n) * 255 // (n - 1)


def make_gif(w: int, h: int, bits: int = 2) -> bytes:
    """GIF89a bytes via the classic 'uncompressed GIF' technique: every
    pixel index is emitted as a literal LZW code, with a CLEAR code every
    2^bits - 2 literals so the decoder's dictionary (which inserts one
    entry per literal after the first, and widens the code size the
    moment next_code reaches 2^width) never leaves width bits+1 — the
    encoder stays fixed there.  Exercises the decoder's variable-width
    reader, CLEAR handling, and palette map."""
    n = 1 << bits
    palette = b"".join(bytes([i * 255 // (n - 1)] * 3) for i in range(n))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([bits])  # LZW minimum code size
    clear, eoi = n, n + 1
    width = bits + 1
    acc = nb = 0
    coded = bytearray()

    def put(code: int):
        nonlocal acc, nb
        acc |= code << nb
        nb += width
        while nb >= 8:
            coded.append(acc & 0xFF)
            acc >>= 8
            nb -= 8

    put(clear)
    since_clear = 0
    for y in range(h):
        for x in range(w):
            if since_clear == n - 2:
                put(clear)
                since_clear = 0
            put((x + y) % n)
            since_clear += 1
    put(eoi)
    if nb:
        coded.append(acc & 0xFF)
    for i in range(0, len(coded), 255):
        chunk = coded[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def make_wav(rate: int, n_channels: int, amplitudes: list[int],
             samples_per_window: int = 64) -> bytes:
    frames = bytearray()
    for amp in amplitudes:
        frames += struct.pack("<h", amp) * (samples_per_window * n_channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(bytes(frames))
    return buf.getvalue()


def synthetic_media_rows() -> list[tuple[str, str, bytes]]:
    """(media_id, media_kind, payload) for every spec — deterministic."""
    rows: list[tuple[str, str, bytes]] = []
    for name, w, h in PPM_SPECS:
        rows.append((name, "image", make_ppm(w, h)))
    for name, w, h, v in BMP_SPECS:
        rows.append((name, "image", make_bmp(w, h, v)))
    for name, w, h, ct in PNG_SPECS:
        rows.append((name, "image", make_png(w, h, ct)))
    for name, grid, color, sub in JPEG_SPECS:
        rows.append((name, "image", make_jpeg(grid, color, sub)))
    for name, w, h, bits in GIF_SPECS:
        rows.append((name, "image", make_gif(w, h, bits)))
    for name, rate, nch, amps in WAV_SPECS:
        rows.append((name, "audio", make_wav(rate, nch, amps)))
    for name, payload in STUB_SPECS:
        rows.append((name, "image", payload))
    return rows
