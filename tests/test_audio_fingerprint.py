"""Spectral-landmark audio fingerprint (d_audio_fingerprint's kernel):
the two invariances the closed-form oracle rests on are pinned as
PROPERTIES over random signals, not just the 16 fixture groups —
(a) hop-aligned time shift with a one-hop silent lead-in leaves the
landmark set exactly equal; (b) power-of-two amplitude scaling leaves
it exactly equal (float FFT magnitudes scale exactly, ties and strict
inequalities preserved).  A non-hop-aligned shift is NOT claimed
invariant and the negative control documents that."""

from __future__ import annotations

import numpy as np
import pytest

from map2db_spark.functions.wav import decode_wav, encode_wav

W, HOP = 256, 128


def landmarks(sig: np.ndarray) -> set[int]:
    """Mirror of the d_audio_fingerprint kernel (queries_round9.py)."""
    x = sig.astype(np.float64)
    if len(x) < W:
        return set()
    frames = np.lib.stride_tricks.sliding_window_view(x, W)[::HOP]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    peaks_by_frame: dict[int, list[int]] = {}
    for t in range(mag.shape[0]):
        m = mag[t]
        if not m.any():
            continue
        interior = m[1:-1]
        loc = np.flatnonzero((interior > m[:-2]) & (interior > m[2:])) + 1
        if loc.size == 0:
            continue
        order = np.argsort(-m[loc], kind="stable")
        peaks_by_frame[t] = sorted(int(loc[i]) for i in order[:5])
    hashes: set[int] = set()
    for t, fs in peaks_by_frame.items():
        for f1 in fs:
            n = 0
            for dt in range(1, 5):
                if n >= 3:
                    break
                for f2 in peaks_by_frame.get(t + dt, []):
                    hashes.add((f1 << 16) | (f2 << 8) | dt)
                    n += 1
                    if n >= 3:
                        break
    return hashes


def _base(seed: int, n_frames: int = 16, amp: int = 1000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    content = rng.integers(-amp, amp + 1, n_frames * HOP).astype(np.int64)
    return np.concatenate([np.zeros(HOP, np.int64), content])


@pytest.mark.parametrize("seed", range(25))
@pytest.mark.parametrize("shift_hops", [1, 2, 3, 5])
def test_hop_aligned_shift_invariance(seed, shift_hops):
    base = _base(seed)
    shifted = np.concatenate([np.zeros(shift_hops * HOP, np.int64), base])
    a = landmarks(base.astype(np.int16))
    b = landmarks(shifted.astype(np.int16))
    assert a == b, (seed, shift_hops, len(a ^ b))


@pytest.mark.parametrize("seed", range(25))
@pytest.mark.parametrize("scale", [2, 4, 8])
def test_power_of_two_scale_invariance(seed, scale):
    # amp * 8 = 8000 < 32767: no clipping at any tested scale
    base = _base(seed)
    a = landmarks(base.astype(np.int16))
    b = landmarks((base * scale).astype(np.int16))
    assert a == b, (seed, scale, len(a ^ b))


def test_combined_shift_and_scale_through_the_codec():
    # the graded kernel's exact path: synth -> WAV encode -> decode
    for seed in range(10):
        base = _base(seed)
        variant = np.concatenate([np.zeros(2 * HOP, np.int64), base * 4])
        a = landmarks(decode_wav(encode_wav(base.astype(np.int16)))[0])
        b = landmarks(decode_wav(encode_wav(variant.astype(np.int16)))[0])
        assert a == b, seed


def test_non_hop_aligned_shift_is_not_claimed():
    """Negative control: a half-hop shift changes frame contents, so
    sets may legitimately differ — the operator's robustness claim is
    hop-aligned edits only (real ingest quantizes alignment by
    anchoring on detected onsets; out of scope here)."""
    diffs = 0
    for seed in range(10):
        base = _base(seed)
        shifted = np.concatenate([np.zeros(HOP // 2, np.int64), base])
        if landmarks(base.astype(np.int16)) != landmarks(
            shifted.astype(np.int16)
        ):
            diffs += 1
    assert diffs > 0  # at least one differs: the invariance is not free


def test_different_content_has_small_overlap():
    a = landmarks(_base(1).astype(np.int16))
    b = landmarks(_base(2).astype(np.int16))
    assert len(a) > 100 and len(b) > 100
    assert len(a & b) < min(len(a), len(b)) // 4
