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
