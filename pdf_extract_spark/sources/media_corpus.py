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
# fake compressed payloads -> deterministic stub tier
STUB_SPECS = [
    ("stub-fake-png", b"\x89PNG\r\n\x1a\nnot-actually-a-png-payload-0001"),
    ("stub-fake-jpeg", b"\xff\xd8\xffnot-actually-a-jpeg-payload-0002"),
]


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
    for name, rate, nch, amps in WAV_SPECS:
        rows.append((name, "audio", make_wav(rate, nch, amps)))
    for name, payload in STUB_SPECS:
        rows.append((name, "image", payload))
    return rows
