"""FLAC decoder (operators/flac.py) vs the closed-form fixture spec
(sources/media_corpus.py:make_flac): every sample in window i equals
amplitudes[i] on every channel, so expectations are the spec values we
encoded — across CONSTANT/VERBATIM/FIXED/LPC subframes and independent
vs mid/side stereo — never the decoder's own output."""

import numpy as np
import pytest

from pdf_extract_spark.operators.flac import crc8, crc16, decode_flac
from pdf_extract_spark.sources.media_corpus import FLAC_SPECS, make_flac


@pytest.mark.parametrize("name,rate,nch,ms,amps", FLAC_SPECS)
def test_flac_specs_decode_exactly(name, rate, nch, ms, amps):
    r, c, bps, samples = decode_flac(make_flac(rate, nch, amps, mid_side=ms))
    assert (r, c, bps) == (rate, nch, 16)
    assert samples.shape == (len(amps) * 64, nch)
    for i, amp in enumerate(amps):
        win = samples[i * 64 : (i + 1) * 64]
        assert (win == amp).all(), (name, i, np.unique(win), amp)


def test_flac_subframe_kinds_all_hit():
    """16 windows cycle CONSTANT/VERBATIM/FIXED/LPC (i % 4) — every
    decoder subframe path runs; negative amplitudes exercise sign
    extension through each."""
    amps = [100, -100, 3000, -3000] * 4
    _, _, _, samples = decode_flac(make_flac(8000, 1, amps))
    for i, amp in enumerate(amps):
        assert (samples[i * 64 : (i + 1) * 64, 0] == amp).all(), i


def test_flac_crc_tamper_detected():
    payload = bytearray(make_flac(8000, 1, [1000] * 16))
    # flip one bit inside the last frame's audio data
    payload[-5] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))


def test_flac_crc_kats():
    """CRC known-answer values derived by hand from the generator
    polynomial definitions (poly 0x07 / 0x8005, init 0, MSB-first) —
    independent of this module's implementation."""
    assert crc8(b"") == 0 and crc8(b"\x00") == 0
    assert crc8(b"\x01") == 0x07
    # 0x80 -> 0x07 after the first shift, then 7 more shifts
    # (0x0E 0x1C 0x38 0x70 0xE0 0xC7 0x89)
    assert crc8(b"\x80") == 0x89
    assert crc16(b"") == 0 and crc16(b"\x00") == 0
    assert crc16(b"\x01") == 0x8005


def test_flac_truncation_and_garbage_never_hang():
    """Truncations either raise cleanly or yield a consistent shorter
    decode (a cut landing exactly on a frame boundary); garbage raises."""
    payload = make_flac(8000, 2, [0, 4096, -8192, 16384] * 4, mid_side=True)
    for cut in range(4, len(payload), 31):
        try:
            samples = decode_flac(payload[:cut])[3]
        except Exception:
            continue
        # asserts OUTSIDE the try: a malformed-shape decode must fail the
        # test, not be swallowed by the truncation except
        assert samples.shape[0] <= 16 * 64 and samples.shape[1] == 2
    with pytest.raises(ValueError):
        decode_flac(b"not a flac stream at all")


def test_flac_rice_nonzero_residuals_roundtrip():
    """Real Rice entropy: random-walk samples produce nonzero quotients
    and remainders across two partitions; with escape_last the final
    partition decodes through the raw-bits path.  Seeded determinism."""
    import random

    from pdf_extract_spark.sources.media_corpus import make_flac_rice

    rng = random.Random(7)
    for trial in range(6):
        samples = [0]
        for _ in range(63):
            samples.append(max(-30000, min(30000, samples[-1] + rng.randint(-500, 500))))
        for escape in (False, True):
            payload = make_flac_rice(8000, samples, partition_order=1,
                                     escape_last=escape)
            rate, nch, _bps, got = decode_flac(payload)
            assert rate == 8000 and nch == 1
            assert got[:, 0].tolist() == samples, (trial, escape)
