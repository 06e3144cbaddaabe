"""Stdlib WAV (RIFF/PCM) audio codec for the multimodal audio path.

Parity with the reference: the reference has no audio surface at all
(map2db.py decodes map tiles); this module exists for the
training-data-pipeline extension — audio as an opaque binary column
whose decode step must be REAL, not a stub.  PNG got the same
treatment in functions/png.py; WAV is the audio analog: the container
is written and parsed with ``wave`` + ``struct`` from the standard
library, so the decode path exercises a genuine binary media format
without any third-party dependency.

Feature extraction is integer-exact (sums/peaks over int16 samples),
so a SQL oracle that knows the closed-form sample generator can verify
the decode byte-for-byte without being able to read WAV itself.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

SAMPLE_RATE = 8000


def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """Encode int16 mono samples as a real RIFF/WAVE PCM payload."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit PCM WAV payload -> (int16 samples, rate).

    Validates the RIFF header explicitly (magic, format tags) before
    handing the stream to ``wave`` — corrupt payloads raise instead of
    producing silent garbage features.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 != len(payload):
        raise ValueError(
            f"RIFF length mismatch: header says {declared + 8}, got {len(payload)}"
        )
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise ValueError("expected mono 16-bit PCM")
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error, RuntimeError) as ex:
        # the stdlib wave module raises a zoo of exception types on
        # corrupt streams; the quarantine contract is one typed error
        raise ValueError(f"malformed WAV stream ({type(ex).__name__})") from ex
    return np.frombuffer(frames, dtype="<i2"), rate


def synth_samples(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 samples: closed-form in (seed, i) so a SQL
    oracle can recompute every sample with integer arithmetic."""
    i = np.arange(n, dtype=np.int64)
    return (((seed * 7919 + i * 104729) % 65536) - 32768).astype(np.int16)
