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


# ---------------------------------------------------------------------------
# Randomized property sweep over the general encoder (make_flac_stream):
# every knob is a spec feature, so the expectation is always the input
# samples verbatim.  60 seeded cases sweep bps x stereo decorrelation x
# block size x predictor order x partition order x Rice/Rice2 x escapes x
# wasted bits x unknown-length streams with trailing bytes.
# ---------------------------------------------------------------------------

def _random_case(seed: int):
    rng = np.random.default_rng(1000 + seed)
    bps = int(rng.choice([8, 12, 16, 20, 24]))
    nch = int(rng.choice([1, 2]))
    stereo = (
        "independent" if nch == 1
        else str(rng.choice(["independent", "left_side", "right_side", "mid_side"]))
    )
    block = int(rng.choice([16, 32, 48, 64, 100, 192]))
    total = block * int(rng.integers(1, 4)) + int(rng.choice([0, block // 2]))
    order = int(rng.integers(0, 5))
    po = int(rng.integers(0, 4))
    rice2 = bool(rng.integers(0, 2))
    wasted = int(rng.choice([0, 0, 1, 3]))
    esc = {0} if rng.integers(0, 3) == 0 else set()
    known = seed % 5 != 0
    trailing = b"" if known else b"\x00\x00ID3TAGPAD"
    lim = 1 << (bps - 1)
    channels = []
    for _ in range(nch):
        steps = rng.integers(-max(lim >> 6, 2), max(lim >> 6, 2), size=total)
        sig = np.cumsum(steps)
        sig = np.clip(sig, -(lim >> 1), (lim >> 1) - 1)
        sig = (sig >> wasted) << wasted
        channels.append([int(v) for v in sig])
    kwargs = dict(
        bps=bps, block_size=block, order=order, partition_order=po,
        rice2=rice2, escape_parts=esc, wasted=wasted, stereo_mode=stereo,
        known_total=known, trailing=trailing,
    )
    return channels, kwargs


@pytest.mark.parametrize("seed", range(60))
def test_flac_random_roundtrip(seed):
    from pdf_extract_spark.sources.media_corpus import make_flac_stream

    channels, kwargs = _random_case(seed)
    payload = make_flac_stream(44100, channels, **kwargs)
    rate, nch, bps, samples = decode_flac(payload)
    assert rate == 44100 and nch == len(channels) and bps == kwargs["bps"]
    assert samples.shape == (len(channels[0]), nch), kwargs
    for c, expect in enumerate(channels):
        assert samples[:, c].tolist() == expect, (seed, c, kwargs)


@pytest.mark.parametrize("stereo", ["left_side", "right_side", "mid_side"])
def test_flac_stereo_decorrelation_modes(stereo):
    """All three decorrelation modes reconstruct both channels exactly,
    including odd L+R parity (the mid/side low-bit path)."""
    from pdf_extract_spark.sources.media_corpus import make_flac_stream

    L = [0, 7, -3, 100, -101, 32000, -32001 + 32768, 1, 2, 3, -4, 5, 6, -7, 8, 9]
    R = [1, -7, 3, 99, 101, -32000, 12345, 0, 2, -3, 4, -5, 6, 7, -8, 10]
    payload = make_flac_stream(8000, [L, R], block_size=16, order=2,
                               stereo_mode=stereo)
    _, _, _, samples = decode_flac(payload)
    assert samples[:, 0].tolist() == L and samples[:, 1].tolist() == R


def test_flac_wasted_bits_roundtrip():
    """Subframes whose samples share trailing zero bits are encoded
    shifted with the wasted-bits flag; the decoder must shift them back."""
    from pdf_extract_spark.sources.media_corpus import make_flac_stream

    sig = [v * 8 for v in [0, 1, -2, 3, 500, -500, 1000, -1000] * 4]
    payload = make_flac_stream(8000, [sig], block_size=32, order=1, wasted=3)
    _, _, _, samples = decode_flac(payload)
    assert samples[:, 0].tolist() == sig
    # the encoding really used the wasted path: a 16-bit stream of
    # multiples of 8 must be smaller than the same stream un-shifted
    fat = make_flac_stream(8000, [sig], block_size=32, order=1, wasted=0)
    assert len(payload) < len(fat)


def test_flac_rice2_and_nonstandard_bps():
    """Residual method 1 (5-bit Rice parameters) and 12/20/24-bit sample
    sizes decode exactly."""
    from pdf_extract_spark.sources.media_corpus import make_flac_stream

    for bps in (12, 20, 24):
        lim = 1 << (bps - 2)
        sig = [int(x) for x in np.linspace(-lim, lim - 1, 48).astype(int)]
        payload = make_flac_stream(16000, [sig], bps=bps, block_size=48,
                                   order=3, partition_order=2, rice2=True)
        rate, nch, got_bps, samples = decode_flac(payload)
        assert got_bps == bps
        assert samples[:, 0].tolist() == sig


def test_flac_unknown_length_trailing_bytes():
    """STREAMINFO total_samples == 0 (unknown) with trailing non-frame
    bytes after the last frame: the decoder returns the decoded samples
    instead of raising 'lost frame sync'."""
    from pdf_extract_spark.sources.media_corpus import make_flac_stream

    sig = list(range(-50, 50))
    payload = make_flac_stream(8000, [sig], block_size=50, known_total=False,
                               trailing=b"\x00" * 17 + b"VORBISCOMMENTPAD")
    _, _, _, samples = decode_flac(payload)
    assert samples[:, 0].tolist() == sig
