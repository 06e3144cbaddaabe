"""Edge-semantics tests for the round-2 additions: linear-interp grid
resampling, binned interval-overlap join, overlap-coefficient
containment dedup, and the windowed/multimodal feature kernels."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_linear_interp_midpoint_and_exact_hit(spark):
    from map2db_spark.operators.resample import linear_interp_grid

    ev = spark.createDataFrame(
        [(1, _ts(0), 0.0), (1, _ts(12), 6.0), (2, _ts(6), 5.0)],
        "user_id INT, ts TIMESTAMP, value DOUBLE",
    )
    grid = spark.createDataFrame(
        [(1, _ts(6)), (1, _ts(9)), (1, _ts(12)), (1, _ts(13)),
         (2, _ts(6)), (2, _ts(7))],
        "user_id INT, ts TIMESTAMP",
    )
    out = {
        (r.user_id, r.grid_ts): r.interp_value
        for r in linear_interp_grid(ev, grid, key="user_id").collect()
    }
    assert out[(1, _ts(6))] == 3.0  # midpoint
    assert out[(1, _ts(9))] == 4.5  # 3/4 point
    assert out[(1, _ts(12))] == 6.0  # grid point ON an event: exact value
    assert (1, _ts(13)) not in out  # past last event: dropped
    assert out[(2, _ts(6))] == 5.0  # single event, grid on it: t0 == t1
    assert (2, _ts(7)) not in out


def test_linear_interp_tie_rule_is_deterministic(spark):
    """Two events at the same timestamp: backward carry takes the max
    value, forward carry the min — independent of input order."""
    from map2db_spark.operators.resample import linear_interp_grid

    for rows in (
        [(1, _ts(0), 1.0), (1, _ts(0), 3.0), (1, _ts(4), 5.0)],
        [(1, _ts(0), 3.0), (1, _ts(0), 1.0), (1, _ts(4), 5.0)],
    ):
        ev = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, value DOUBLE")
        grid = spark.createDataFrame([(1, _ts(2))], "user_id INT, ts TIMESTAMP")
        [r] = linear_interp_grid(ev, grid, key="user_id").collect()
        assert r.interp_value == 4.0  # from v0=3.0 (max at t0), v1=5.0


def test_interval_overlap_matches_naive_join(spark):
    """The binned equi-join must produce exactly the naive
    inequality-join result, including intervals spanning many
    buckets and touching endpoints."""
    from map2db_spark.operators.intervals import interval_overlap_join

    rng = np.random.default_rng(7)
    def mk(n, tag):
        rows = []
        for i in range(n):
            k = int(rng.integers(0, 4))
            s = _ts(0) + dt.timedelta(minutes=int(rng.integers(0, 600)))
            e = s + dt.timedelta(minutes=int(rng.integers(0, 180)))
            rows.append((i, k, s, e))
        return rows

    a = spark.createDataFrame(mk(40, "a"), "a_id INT, k INT, s1 TIMESTAMP, e1 TIMESTAMP")
    b = spark.createDataFrame(mk(40, "b"), "b_id INT, k INT, s2 TIMESTAMP, e2 TIMESTAMP")
    binned = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, key="k", a_start="s1", a_end="e1",
            b_start="s2", b_end="e2", bucket_us=600_000_000,
        ).collect()
    }
    naive = {
        (r.a_id, r.b_id)
        for r in a.join(b, "k")
        .where((F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")))
        .collect()
    }
    assert binned == naive
    assert len(naive) > 0


def test_overlap_pairs_scores_containment_full(spark):
    """A document and its strict prefix: overlap coefficient 1.0 even
    though Jaccard is low — the near-superset case the metric exists
    for."""
    import map2db_spark.functions.dedup as D

    words = " ".join(f"w{i}" for i in range(40))
    prefix = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, prefix), (3, "x y z q r s")],
        "doc_id LONG, text STRING",
    )
    sh = D.shingle_table(docs)
    pairs = {
        (r.id_a, r.id_b): r.overlap_coef
        for r in D.overlap_pairs(sh, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(sh, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.25  # same pair, Jaccard can't see containment


def test_overlap_pairs_df_cap_drops_stopword_shingles(spark):
    """A shingle present in every doc is dropped by the cap, so it
    stops contributing join rows or intersection counts."""
    import map2db_spark.functions.dedup as D

    common = "the quick fox"
    docs = spark.createDataFrame(
        [(i, f"{common} unique{i} tail{i} end{i}") for i in range(5)],
        "doc_id LONG, text STRING",
    )
    sh = D.shingle_table(docs)
    uncapped = D.overlap_pairs(sh, threshold=0.0).count()
    capped = D.overlap_pairs(sh, threshold=0.0, df_cap=4).count()
    assert uncapped == 10  # every pair shares 'the quick fox'
    assert capped == 0  # cap removes the only shared shingle


def test_wav_energy_windows_match_numpy(spark):
    from map2db_spark.functions.multimodal import (
        documents_as_wav_media,
        extract_wav_energy,
    )
    from map2db_spark.functions.wav import synth_samples

    docs = spark.createDataFrame([(3,), (17,)], "doc_id LONG")
    rows = extract_wav_energy(documents_as_wav_media(docs), win=16).collect()
    for did in (3, 17):
        n = 32 + (did % 41) * 3
        s = synth_samples(did, n).astype("int64")
        wins = {r.win_idx: r for r in rows if r.media_id == did}
        assert len(wins) == (n + 15) // 16
        for wi, r in wins.items():
            chunk = s[wi * 16 : wi * 16 + 16]
            assert r.n == len(chunk)
            assert r.energy == int((chunk * chunk).sum())


def test_png_ahash_matches_closed_form(spark):
    from map2db_spark.functions.multimodal import (
        documents_as_png_media,
        extract_png_ahash,
    )

    docs = spark.createDataFrame([(5,), (11,)], "doc_id LONG")
    rows = {r.media_id: r for r in
            extract_png_ahash(documents_as_png_media(docs)).collect()}
    for did in (5, 11):
        w, h = 4 + did % 5, 3 + did % 4
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        r = (did * 7 + x * 3 + y * 5) % 256
        bits = (r * (w * h) > r.sum()).astype("uint8").ravel()
        expect = "".join("1" if b else "0" for b in bits)
        got = rows[did]
        assert (got.width, got.height) == (w, h)
        assert got.ahash_bits == expect
        assert len(got.ahash_bits) == w * h


def test_simhash_banded_equals_all_pairs(spark):
    """Pigeonhole exactness: 4 bands / Hamming <= 3 banded candidates
    verify to EXACTLY the all-pairs result."""
    import map2db_spark.functions.dedup as D

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 7} z{i % 3}") for i in range(30)],
        "doc_id LONG, text STRING",
    )
    sigs = D.simhash(docs, bits=16)
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_banded_pairs(sigs, bits=16, n_bands=4).collect()
    }
    a = sigs.select(F.col("sid").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sigs.select(F.col("sid").alias("id_b"), F.col("simhash").alias("sh_b"))
    allpairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == allpairs
    assert len(allpairs) > 0
