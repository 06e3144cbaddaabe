"""The round driver hard-grades only the FIRST ~50 registry entries
(CORRECTNESS_r01.json == first 50, verified by the r1 judge).  These
assertions pin the window COMPOSITION RULE (VERDICT r8 #4) so adding a
query can never silently evict one that needs grading:

1. tier 0 — every name without a binding green hard row (new queries
   + module-touched re-grades) sits at the very front, inside the
   window, in registration order;
2. rotation — the remaining window slots hold verified names in
   ascending order of their latest-green round (oldest rows re-check
   first against the moving codebase), registration order within a
   round;
3. everything else (verified, newer greens) sits behind the window.
"""

from __future__ import annotations

import itertools

from map2db_spark.registry import (
    _DRIVER_VERIFIED,
    _VERIFIED_BY_ROUND,
    _WINDOW,
    QUERIES,
    _ensure_loaded,
)

_ensure_loaded()
NAMES = list(QUERIES)
TIER0 = [n for n in NAMES if n not in _DRIVER_VERIFIED]
ROUND_OF = {n: r for r, ns in _VERIFIED_BY_ROUND.items() for n in ns}


def test_round_sets_partition_the_verified_names():
    # a name in two round sets would make its rotation age ambiguous
    for a, b in itertools.combinations(sorted(_VERIFIED_BY_ROUND), 2):
        assert not (_VERIFIED_BY_ROUND[a] & _VERIFIED_BY_ROUND[b]), (a, b)
    # and every verified name is attributable to a round
    assert _DRIVER_VERIFIED == frozenset(ROUND_OF)
    # every round-set name is a real registered query (a typo here
    # would silently promote the misspelled real query to tier 0)
    missing = _DRIVER_VERIFIED - set(NAMES)
    assert not missing, missing


def test_unverified_names_lead_the_window():
    # rule 1: all unverified names first, in registration order,
    # strictly inside the window
    assert len(TIER0) <= _WINDOW, (len(TIER0), TIER0[_WINDOW:])
    assert NAMES[: len(TIER0)] == TIER0


def test_rotation_fills_the_window_oldest_green_first():
    # rule 2: the window's remaining slots hold verified names whose
    # latest-green round is minimal; no name behind the window may be
    # OLDER than any rotation name (ordering within the same round is
    # registration order, which the partition preserves)
    window_rot = NAMES[len(TIER0):_WINDOW]
    behind = NAMES[_WINDOW:]
    assert all(n in _DRIVER_VERIFIED for n in window_rot)
    if window_rot and behind:
        oldest_behind = min(ROUND_OF[n] for n in behind)
        newest_rotated = max(ROUND_OF[n] for n in window_rot)
        assert newest_rotated <= oldest_behind, (
            newest_rotated,
            oldest_behind,
        )


def test_r15_greens_recorded_and_retired():
    # the r15 window's 50 green rows (CORRECTNESS_r15.json: all 50
    # hash-match, zero errors — VERDICT r15) carry round-15 age and
    # sit behind the window, EXCEPT the names round 16's optimization
    # work re-touches (those leave the r15 set per the registry rule
    # and are pinned unverified in test_r16_regrades_are_in_the_window)
    for name in (
        "x_tost_equivalence", "x_obrien_fleming",
        "c_kcenter_coreset", "c_semdedup", "d_semdedup_recall_hotcell",
        "v_ivf_seed_robustness", "v_kmeans_clusters", "v_pca_power",
        "v_ann_ivf_nprobe", "r_cdc_merge_upsert",
    ):
        assert ROUND_OF[name] == 15, name
        assert NAMES.index(name) >= _WINDOW, (name, NAMES.index(name))


def test_r14_greens_retired_and_r4_drains():
    # the r14 window's greens (new registrations, ADVICE re-grades,
    # guard-fix re-grades, and the rotated r3/r4 re-greens) carry
    # round-14 age and sit behind the window
    for name in (
        "t_good_turing", "x_page_hinkley", "g_label_propagation",
        "x_hll_sparse", "t_textrank_keywords", "x_tdigest_quantiles",
        "f_tar_shard_ingest", "f_zip_shard_ingest", "g_pagerank",
        "t_heaps_law", "r_values_inline", "f_map_surface",
        "v_ann_ivf_topk", "x_salted_join",
    ):
        assert ROUND_OF[name] == 14, name
        assert NAMES.index(name) >= _WINDOW, (name, NAMES.index(name))
    # r3 is fully drained; the rotation consumes ALL 20 remaining
    # r4-vintage rows this round (VERDICT r14 #2) before any r5 row
    assert not _VERIFIED_BY_ROUND[3]
    window_rot = [n for n in NAMES[:_WINDOW] if n in _DRIVER_VERIFIED]
    r4_inside = sum(1 for n in window_rot if ROUND_OF[n] == 4)
    assert r4_inside == min(len(window_rot), len(_VERIFIED_BY_ROUND[4]))


def test_r12_greens_retired_and_r3_drains():
    # the r12 window's greens (new registrations, ADVICE re-grades,
    # fronted capability rows, AND the 38 rotated r2/r3 re-greens)
    # carry round-12 age and sit behind the window
    # m2db_spatial_window left this list in r15: the optimization
    # round replaced merge_lines' pandas_udf part-count probe with the
    # codegen expression (module under it changed -> re-grade, per the
    # registry rule)
    for name in (
        "x_isotonic_calibration", "x_cochran_q", "f_orc_roundtrip",
        "t_bpe_train_rounds", "x_kendall_tau",
        "c_pii_redaction", "d_dup_clusters", "q4_order_priority",
        "q16_parts_supplier_counts",
    ):
        assert ROUND_OF[name] == 12, name
        assert NAMES.index(name) >= _WINDOW, (name, NAMES.index(name))
    # r1 and r2 are fully drained; the rotation consumes ALL remaining
    # r3-vintage rows this round (VERDICT r12 #1) before any r4 row
    assert not _VERIFIED_BY_ROUND[1]
    assert not _VERIFIED_BY_ROUND[2]
    window_rot = [n for n in NAMES[:_WINDOW] if n in _DRIVER_VERIFIED]
    r3_inside = sum(1 for n in window_rot if ROUND_OF[n] == 3)
    assert r3_inside == min(len(window_rot), len(_VERIFIED_BY_ROUND[3]))


def test_r9_greens_retired_and_r1_rotation_reset():
    # the r9 window's greens carry round-9 age now; the 27 rotated r1
    # rows re-greened in r9 and must NOT re-occupy rotation slots
    # while 20 r1-vintage rows remain (VERDICT r9 #2)
    for name in ("d_audio_fingerprint", "q1_pricing_summary",
                 "w_topn_per_group", "m_gif_giflib_parity"):
        assert ROUND_OF[name] == 9, name
        assert NAMES.index(name) >= _WINDOW, (name, NAMES.index(name))
    # the rotation consumes the surviving r1 rows FIRST: every slot
    # holds an r1 name until r1 is exhausted (the session-2 additions
    # shrank the rotation to 19 slots for 20 r1 rows, so the one
    # youngest-registered r1 name may wait one round — but no r2 name
    # may jump it)
    window_rot = [n for n in NAMES[:_WINDOW] if n in _DRIVER_VERIFIED]
    r1_inside = sum(1 for n in window_rot if ROUND_OF[n] == 1)
    assert r1_inside == min(len(window_rot), len(_VERIFIED_BY_ROUND[1]))
    if r1_inside < len(_VERIFIED_BY_ROUND[1]):
        assert all(ROUND_OF[n] == 1 for n in window_rot)


def test_r8_greens_retired_from_the_window():
    # every CORRECTNESS_r08 green row except the deliberate re-grades
    # is in the verified tier; r8-round names are the NEWEST greens so
    # none of them may occupy a rotation slot while r1 rows exist
    # t_heaps_law left this list in r14 (degenerate-input audit
    # guard -> re-grade); c_semdedup left it in r15 (empty-corpus
    # driver-side centroid-collect guard -> re-grade)
    for name in (
        "g_betweenness", "m_resize_exif_jpeg",
        "m_exif_orientation", "x_bloom_filter",
    ):
        assert name in _VERIFIED_BY_ROUND[8], name
        assert NAMES.index(name) >= _WINDOW, (name, NAMES.index(name))


def test_r1_protocol_fixed_fails_stay_retired():
    # the 3 r1 driver FAILs (array cells / no_oracle) were fixed in r2,
    # re-graded green in CORRECTNESS_r02.json, then rotated through the
    # r12 window — they carry round-12 age now
    for name in (
        "r_array_agg_roundtrip", "x_approx_distinct", "x_approx_quantiles",
    ):
        assert ROUND_OF[name] == 12, name


def test_r16_regrades_are_in_the_window():
    # r16 re-grades (none may sit in the verified tier): the
    # SortAggregate burn-down (VERDICT r15 #1) — the min(string)
    # family moves onto functions/extrema.py's no-sort split, the two
    # graph argmaxes move onto WindowGroupLimit top-1 windows, and
    # f_collated_grouping records its reviewed adjudication
    for name in (
        "f_csv_roundtrip", "f_jsonl_roundtrip", "f_text_source",
        "f_from_json_typed", "f_collated_grouping",
        "m_binaryfile_ingest", "g_random_walk", "g_label_prop",
        # the 128-bit anchor pair + shared gated scatter
        "d_suffix_dedup_corpus", "m_decode_corpus_bench",
        "v_hard_negative_mining",
    ):
        assert name not in _DRIVER_VERIFIED, name
        assert NAMES.index(name) < _WINDOW, (name, NAMES.index(name))
