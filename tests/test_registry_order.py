"""The round driver hard-grades only the FIRST ~50 registry entries
(CORRECTNESS_r01.json == first 50, verified by the r1 judge).  These
assertions pin the window composition so adding a query can never
silently evict one that needs grading.

Round-8 structure: the never-hard-checked backlog is FULLY DRAINED —
tier 0 holds every name without a binding green row (the 37 names
deferred from r7, the two late-r7 registrations, the two
semantics-changed decode re-grades, the five pipeline-module
re-grades, and the new r8 queries); _DEFERRED_TO_R8 is empty; tier 2
is _DRIVER_VERIFIED (every green hard row r01-r07 still binding).
The graded 50 = all of tier 0 + verified refills in registration
order.
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
TIER0 = [n for n in NAMES if n not in _DRIVER_VERIFIED]


def test_r1_protocol_fixed_fails_were_regraded():
    # the 3 r1 driver FAILs (array cells / no_oracle) were fixed in r2,
    # re-graded green in CORRECTNESS_r02.json, and are now demoted to
    # the driver-verified tier so they never waste a graded slot again
    for name in ("r_array_agg_roundtrip", "x_approx_distinct", "x_approx_quantiles"):
        assert name in _DRIVER_VERIFIED, name
        assert NAMES.index(name) >= 50, (name, NAMES.index(name))


def test_backlog_fully_drained_into_the_window():
    # VERDICT r7 #2: the 37 deferred names + the two late-r7
    # registrations all get their first hard row in r8; nothing
    # unverified remains outside the graded 50
    assert _DEFERRED_TO_R8 == frozenset()
    assert len(TIER0) <= 50, (len(TIER0), TIER0[50:])
    for name in TIER0:
        assert NAMES.index(name) < 50, (name, NAMES.index(name))
    for name in ("s_stream_media_decode", "m_exif_orientation",
                 "t_heaps_law", "g_betweenness"):
        assert name in TIER0, name


def test_semantics_changed_queries_are_regraded():
    # r8 added JPEG to the dispatch cycle and the decode corpus, and
    # changed pipeline.py (sink split r7 + parquet counts r8): those
    # queries must NOT sit in the verified tier (registry rule: a
    # green row binds only while the semantics under it are unchanged)
    for name in (
        "m_decode_native_dispatch", "m_decode_corpus_bench",
        "m2db_pipeline_throughput", "m2db_decode_sightings",
        "m2db_geometry_stats", "m2db_sql_over_features",
        "m2db_validation_violations",
    ):
        assert name not in _DRIVER_VERIFIED, name
        assert NAMES.index(name) < 50, (name, NAMES.index(name))


def test_new_r8_queries_in_graded_window():
    # a fresh operator gets its hard row the same round it ships
    assert NAMES.index("m_jpeg_libjpeg_parity") < 50


def test_r7_greens_retired_from_the_window():
    # every CORRECTNESS_r07 green row (except the two deliberate
    # re-grades above) is in the verified tier so it never wastes a
    # graded slot again
    for name in (
        "s_stream_checkpoint_resume", "c_dsir_importance",
        "m_jpeg_dims", "x_gini_split", "u_arrow_python_udf",
        "x_ipw_ate", "m_media_dispatch", "f_text_source",
    ):
        assert name in _DRIVER_VERIFIED, name
        assert NAMES.index(name) >= 50, (name, NAMES.index(name))


def test_window_is_tier0_then_verified_refill_only():
    # positions 0..len(TIER0)-1 are exactly the unverified names in
    # registration order; every later position is driver-verified
    # (the refill re-grades are harmless, but an unverified name after
    # the window would silently never get a hard row)
    k = len(TIER0)
    assert NAMES[:k] == TIER0
    assert all(n in _DRIVER_VERIFIED for n in NAMES[k:])


def test_every_query_is_classified_unambiguously():
    # a name in two sets would make the tiering ambiguous
    assert not (_DRIVER_VERIFIED & _DEFERRED_TO_R8)
    # and the tiers cover the whole registry
    assert len(TIER0) + len(set(NAMES) & _DRIVER_VERIFIED) == len(NAMES)
