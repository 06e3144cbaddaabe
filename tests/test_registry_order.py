"""The round driver hard-grades only the FIRST ~50 registry entries
(CORRECTNESS_r01.json == first 50, verified by the r1 judge).  These
assertions pin the window composition so adding a query can never
silently evict one that needs grading.

Round-7 structure: tier 0 is the graded window (48 backlog names in
registration order + the two r7 verdict-ask queries = exactly 50),
tier 1 is _DEFERRED_TO_R8 (the 37-name remainder of the never-checked
backlog), tier 2 is _DRIVER_VERIFIED (every green hard row r01-r06).
"""

from __future__ import annotations

from map2db_spark.registry import (
    _DEFERRED_TO_R8,
    _DRIVER_VERIFIED,
    QUERIES,
    _ensure_loaded,
)

_ensure_loaded()
NAMES = list(QUERIES)


def test_r1_protocol_fixed_fails_were_regraded():
    # the 3 r1 driver FAILs (array cells / no_oracle) were fixed in r2,
    # re-graded green in CORRECTNESS_r02.json, and are now demoted to
    # the driver-verified tier so they never waste a graded slot again
    for name in ("r_array_agg_roundtrip", "x_approx_distinct", "x_approx_quantiles"):
        assert name in _DRIVER_VERIFIED, name
        assert NAMES.index(name) >= 50, (name, NAMES.index(name))


def test_round7_verdict_queries_in_graded_window():
    # VERDICT r6 #1 and #2 require same-round driver rows for the
    # native-first dispatch and the multimodal bench query
    for name in ("m_decode_native_dispatch", "m_decode_corpus_bench"):
        assert NAMES.index(name) < 50, (name, NAMES.index(name))


def test_r6_greens_retired_from_the_window():
    # every CORRECTNESS_r06 green row is in the verified tier so it
    # never wastes a graded slot again (VERDICT r6 #3)
    for name in (
        "m_jpeg_progressive", "m_vp8_pixels", "m_zstd_parity",
        "x_group_linreg", "x_gini_concentration", "w_cusum_changepoint",
        "g_random_walk", "s_stream_append_emission",
    ):
        assert name in _DRIVER_VERIFIED, name
        assert NAMES.index(name) >= 50, (name, NAMES.index(name))


def test_graded_window_holds_no_already_verified_queries():
    # wasting a graded slot on an already-green query costs a round of
    # hard signal for an ungraded one
    head = set(NAMES[:50])
    assert not (head & _DRIVER_VERIFIED), head & _DRIVER_VERIFIED


def test_window_is_exactly_the_unverified_head():
    # positions 0-49: never-checked names only (the graded window);
    # position 50: the late-r7 streaming-decode addition (first in the
    # r8 window, ahead of the deferred set it was registered after);
    # then the deferred remainder; everything after: driver-verified
    assert not (set(NAMES[:50]) & _DEFERRED_TO_R8)
    assert NAMES[50:52] == ["s_stream_media_decode", "m_exif_orientation"]
    assert set(NAMES[52 : 52 + len(_DEFERRED_TO_R8)]) == _DEFERRED_TO_R8
    assert all(n in _DRIVER_VERIFIED
               for n in NAMES[52 + len(_DEFERRED_TO_R8):])


def test_every_query_is_classified_unambiguously():
    # a name in two sets would make the tiering ambiguous
    assert not (_DRIVER_VERIFIED & _DEFERRED_TO_R8)
    # tier-0 (window + late additions) names are in neither set
    tier0 = NAMES[:52]
    for n in tier0:
        assert n not in _DRIVER_VERIFIED and n not in _DEFERRED_TO_R8, n
    # and the three tiers cover the whole registry
    assert len(tier0) + len(_DEFERRED_TO_R8) + len(
        set(NAMES) & _DRIVER_VERIFIED
    ) == len(NAMES)


def test_deferred_set_matches_its_documented_size():
    # the r7 arithmetic in registry.py: 85-name backlog - 48 graded
    # this round = 37 deferred; r8's window then drains them all
    assert len(_DEFERRED_TO_R8) == 37
