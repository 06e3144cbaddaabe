"""Unit tests for the stdlib WAV codec (functions/wav.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from map2db_spark.functions.wav import (
    SAMPLE_RATE,
    decode_wav,
    encode_wav,
    synth_samples,
)


def test_round_trip_exact():
    s = synth_samples(seed=17, n=257)
    payload = encode_wav(s)
    out, rate = decode_wav(payload)
    assert rate == SAMPLE_RATE
    assert np.array_equal(out, s)


def test_riff_container_shape():
    payload = encode_wav(synth_samples(3, 64))
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    declared = struct.unpack("<I", payload[4:8])[0]
    assert declared + 8 == len(payload)


def test_corrupt_magic_rejected():
    payload = bytearray(encode_wav(synth_samples(5, 40)))
    payload[0:4] = b"JUNK"
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(bytes(payload))


def test_truncated_payload_rejected():
    payload = encode_wav(synth_samples(9, 100))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_wav(payload[:-10])


def test_synth_matches_closed_form():
    # the oracle's arithmetic, re-derived independently
    s = synth_samples(seed=42, n=5)
    expect = [((42 * 7919 + i * 104729) % 65536) - 32768 for i in range(5)]
    assert s.tolist() == expect


def test_wrong_dtype_rejected():
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.zeros(4, dtype=np.float32))


def test_wav_fuzz_corruption_typed_errors_only():
    """r4 fuzz distillation (found a real hole): bit flips and
    truncation of a valid WAV must raise ValueError or decode — the
    stdlib wave module's wave.Error/EOFError/struct.error/RuntimeError
    zoo is now wrapped into the one typed error."""
    import random

    import numpy as np

    from map2db_spark.functions.wav import decode_wav, encode_wav

    pyr = random.Random(5)
    rng = np.random.default_rng(5)
    enc = encode_wav(rng.integers(-3000, 3000, 500).astype("int16"), 16000)
    for _ in range(800):
        e = bytearray(enc)
        if pyr.random() < 0.5:
            for _k in range(pyr.randint(1, 3)):
                i = pyr.randrange(0, len(e))
                e[i] ^= 1 << pyr.randrange(8)
            data = bytes(e)
        else:
            data = bytes(e[: pyr.randrange(1, len(e))])
        try:
            decode_wav(data)
        except ValueError:
            pass
