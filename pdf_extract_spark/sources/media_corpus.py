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
    for name, rate, nch, amps in WAV_SPECS:
        rows.append((name, "audio", make_wav(rate, nch, amps)))
    for name, payload in STUB_SPECS:
        rows.append((name, "image", payload))
    return rows
