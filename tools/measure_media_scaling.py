#!/usr/bin/env python3
"""Data-size scaling measurement for the MEDIA kernels (VERDICT r8 #5:
BASELINE.md's scaling table predates the multimodal family; the decode
rows now dominate the bench, so the "wall flat across data growth"
claim must cover them).

Three rows, each timed at 1x and 10x input:

- decode-corpus: the m_decode_corpus_bench plan verbatim (its cached
  sf corpus, and a 10x unioned read) — 5-format native-first decode +
  per-format aggregate;
- phash: the d_phash_clusters kernel shape (PNG synth -> native-first
  decode -> 32x32 NN resample -> 2-D DCT -> 64-bit hash -> 8-byte-key
  agg) over spark.range(n) — a measurement MIRROR of the query kernel
  (the graded query pins its fixture at 48 docs for the closed-form
  oracle; correctness of the kernel is the driver row's job, this
  tool only times the same work at scale);
- quality: the m_jpeg_quality_estimate kernel shape (libjpeg encode +
  header-only quant-table inversion) over spark.range(n), same mirror
  caveat;
- audio_fp (r10, VERDICT r9 #7): the d_audio_fingerprint kernel shape
  (int16 synth -> WAV container round-trip -> 256-pt STFT landmarks ->
  (doc, group, hash) rows) over spark.range(n), followed by the
  metadata-side digest/membership aggregates;
- curation_e2e (r10, VERDICT r9 #7): the m_corpus_curation_e2e kernel
  shape (libjpeg encode at q(group) -> coefficient decode -> quality
  estimate + AC hash in ONE pass) over spark.range(n), followed by the
  filter -> dedup -> domain-cap reshape.

Each row: warm pass, then min-of-two timed passes through the noop
sink, bench.py's per-row state drain between all passes.  Prints one
JSON line {row: {n1: sec, n10: sec, ratio: x}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402


def _phash_df(spark, n):
    import pandas as pd

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.multimodal import decode_image_real
        from map2db_spark.functions.png import encode_png

        N = 32
        dct = np.cos(
            np.pi / N * (np.arange(N)[:, None] + 0.5) * np.arange(N)[None, :]
        ).T
        for pdf in batches:
            out = {"group_id": [], "phash": []}
            for did in pdf["id"]:
                did = int(did)
                group, variant = did // 3, did % 3
                rng = np.random.default_rng(1000 + group)
                base = rng.integers(40, 200, (48, 64), dtype=np.uint8)
                img = (base + 12 * variant).astype(np.uint8)
                payload = encode_png(np.stack([img] * 3, axis=-1))
                px = decode_image_real(payload)
                gray = px[:, :, 0].astype(np.float64)
                sh, sw = gray.shape
                ys = (np.arange(N) * sh) // N
                xs = (np.arange(N) * sw) // N
                g = gray[ys][:, xs]
                freq = dct @ g @ dct.T
                block = freq[:8, :8].ravel()[1:]
                med = np.median(block)
                packed = np.packbits(block > med).tobytes()
                out["group_id"].append(group)
                out["phash"].append(
                    int.from_bytes(packed, "big") >> 1
                )
            yield pd.DataFrame(out)

    return (
        spark.range(n).repartition(64)
        .mapInPandas(kernel, schema="group_id LONG, phash LONG")
        .groupBy("group_id")
        .agg(F.countDistinct("phash").alias("n_hashes"))
    )


def _quality_df(spark, n):
    import pandas as pd

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions import libjpeg_oracle as LJ
        from map2db_spark.functions.jpeg_codec import (
            decode_jpeg_coefficients,
        )

        k1 = np.array([
            16, 11, 10, 16, 24, 40, 51, 61,
            12, 12, 14, 19, 26, 58, 60, 55,
            14, 13, 16, 24, 40, 57, 69, 56,
            14, 17, 22, 29, 51, 87, 80, 62,
            18, 22, 37, 56, 68, 109, 103, 77,
            24, 35, 55, 64, 81, 104, 113, 92,
            49, 64, 78, 87, 103, 121, 120, 101,
            72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
        k1_sum = int(k1.sum())
        for pdf in batches:
            out = {"doc_id": [], "q_est": []}
            for did in pdf["id"]:
                did = int(did)
                q = 25 + (did * 7) % 74
                rng = np.random.default_rng(did)
                img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                stream = LJ.encode(img, quality=q)
                _w, _h, comps = decode_jpeg_coefficients(stream)
                qt_sum = int(comps[0]["qtable"].sum())
                s_est = int(round(100.0 * qt_sum / k1_sum))
                q_est = (
                    max(1, int(round(5000.0 / s_est)))
                    if s_est >= 100
                    else int(round((200 - s_est) / 2.0))
                )
                out["doc_id"].append(did)
                out["q_est"].append(q_est)
            yield pd.DataFrame(out)

    return (
        spark.range(n).repartition(64)
        .mapInPandas(kernel, schema="doc_id LONG, q_est INT")
        .groupBy("q_est")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _audio_df(spark, n):
    import pandas as pd

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.wav import decode_wav, encode_wav

        W, HOP = 256, 128

        def landmarks(sig):
            x = sig.astype(np.float64)
            if len(x) < W:
                return set()
            frames = np.lib.stride_tricks.sliding_window_view(x, W)[::HOP]
            mag = np.abs(np.fft.rfft(frames, axis=1))
            peaks_by_frame = {}
            for t in range(mag.shape[0]):
                m = mag[t]
                if not m.any():
                    continue
                interior = m[1:-1]
                loc = np.flatnonzero(
                    (interior > m[:-2]) & (interior > m[2:])
                ) + 1
                if loc.size == 0:
                    continue
                order = np.argsort(-m[loc], kind="stable")
                peaks_by_frame[t] = sorted(int(loc[i]) for i in order[:5])
            hashes = set()
            for t, fs in peaks_by_frame.items():
                for f1 in fs:
                    cnt = 0
                    for dt in range(1, 5):
                        if cnt >= 3:
                            break
                        for f2 in peaks_by_frame.get(t + dt, []):
                            hashes.add((f1 << 16) | (f2 << 8) | dt)
                            cnt += 1
                            if cnt >= 3:
                                break
            return hashes

        for pdf in batches:
            out = {"doc_id": [], "group_id": [], "h": []}
            for did in pdf["id"]:
                did = int(did)
                group, variant = did // 3, did % 3
                rng = np.random.default_rng(3000 + group)
                content = rng.integers(-1000, 1001, 16 * HOP).astype(
                    np.int64
                )
                base = np.concatenate([np.zeros(HOP, np.int64), content])
                shift = (0, 2, 1)[variant]
                scale = (1, 1, 4)[variant]
                sig = np.concatenate(
                    [np.zeros(shift * HOP, np.int64), base * scale]
                ).astype(np.int16)
                decoded, _rate = decode_wav(encode_wav(sig))
                for h in landmarks(decoded):
                    out["doc_id"].append(did)
                    out["group_id"].append(group)
                    out["h"].append(h)
            yield pd.DataFrame(out)

    fp = spark.range(n).repartition(64).mapInPandas(
        kernel, schema="doc_id LONG, group_id LONG, h LONG"
    )
    return (
        fp.groupBy("doc_id", "group_id")
        .agg(F.md5(F.to_json(F.sort_array(F.collect_list("h")))).alias("d"))
        .groupBy("group_id")
        .agg(F.countDistinct("d").alias("n_sets"))
    )


def _curation_df(spark, n):
    import pandas as pd
    from pyspark.sql import Window

    def kernel(batches):
        import hashlib

        import numpy as np

        from map2db_spark.functions import libjpeg_oracle as LJ
        from map2db_spark.functions.jpeg_codec import (
            decode_jpeg_coefficients,
        )

        k1 = np.array([
            16, 11, 10, 16, 24, 40, 51, 61,
            12, 12, 14, 19, 26, 58, 60, 55,
            14, 13, 16, 24, 40, 57, 69, 56,
            14, 17, 22, 29, 51, 87, 80, 62,
            18, 22, 37, 56, 68, 109, 103, 77,
            24, 35, 55, 64, 81, 104, 113, 92,
            49, 64, 78, 87, 103, 121, 120, 101,
            72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
        k1_sum = int(k1.sum())
        for pdf in batches:
            out = {"doc_id": [], "domain": [], "q_est": [], "ac_hash": []}
            for did in pdf["id"]:
                did = int(did)
                group, variant = did // 3, did % 3
                q = 25 + (group * 9) % 74
                rng = np.random.default_rng(2000 + group)
                base = rng.integers(40, 200, (24, 24)).astype(np.uint8)
                img = (base + 8 * variant).astype(np.uint8)
                stream = LJ.encode(img, quality=q)
                _w, _h, comps = decode_jpeg_coefficients(stream)
                qt_sum = int(comps[0]["qtable"].sum())
                s_est = int(round(100.0 * qt_sum / k1_sum))
                q_est = (
                    max(1, int(round(5000.0 / s_est)))
                    if s_est >= 100
                    else int(round((200 - s_est) / 2.0))
                )
                m = hashlib.md5()
                for c in comps:
                    m.update(
                        np.ascontiguousarray(c["blocks"][:, :, 1:]).tobytes()
                    )
                out["doc_id"].append(did)
                out["domain"].append(group % 4)
                out["q_est"].append(q_est)
                out["ac_hash"].append(m.hexdigest())
            yield pd.DataFrame(out)

    meta = spark.range(n).repartition(64).mapInPandas(
        kernel, schema="doc_id LONG, domain LONG, q_est INT, ac_hash STRING"
    )
    reps = (
        meta.where(F.col("q_est") >= 50)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ac_hash").orderBy("doc_id")
            ),
        )
        .where(F.col("rn") == 1)
    )
    return (
        reps.withColumn(
            "rnd",
            F.row_number().over(
                Window.partitionBy("domain").orderBy("doc_id")
            ),
        )
        .where(F.col("rnd") <= 2)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def main() -> None:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from map2db_spark.registry import QUERIES, _ensure_loaded
    from map2db_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("media-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._nanos_as_long(spark)

    def drain() -> None:
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        spark.sparkContext._jvm.System.gc()
        spark.range(100_000).count()
        time.sleep(0.1)

    from map2db_spark.queries_round7 import _ensure_decode_corpus

    corpus_path = _ensure_decode_corpus(spark, sf_dir)
    corpus = spark.read.parquet(corpus_path)
    n_corpus = corpus.count()

    def corpus_df(mult):
        base = spark.read.parquet(corpus_path)
        df = base
        for _ in range(mult - 1):
            df = df.unionByName(spark.read.parquet(corpus_path))
        # the bench query's own shape: round-robin before the kernel
        import pandas as pd

        def kernel(batches):
            from map2db_spark.functions import multimodal as M

            for pdf in batches:
                out = {"fmt": [], "sum_px": []}
                for payload in pdf["payload"]:
                    px, info = M.decode_image_with_info(bytes(payload))
                    out["fmt"].append(info["fmt"])
                    out["sum_px"].append(int(px.astype("int64").sum()))
                yield pd.DataFrame(out)

        return (
            df.repartition(64)
            .mapInPandas(kernel, schema="fmt STRING, sum_px LONG")
            .groupBy("fmt")
            .agg(F.sum("sum_px").alias("sum_px"))
        )

    rows = {
        "decode_corpus": (lambda: corpus_df(1), lambda: corpus_df(10),
                          n_corpus),
        "phash": (lambda: _phash_df(spark, 4800),
                  lambda: _phash_df(spark, 48000), 4800),
        "quality": (lambda: _quality_df(spark, 4800),
                    lambda: _quality_df(spark, 48000), 4800),
        "audio_fp": (lambda: _audio_df(spark, 480),
                     lambda: _audio_df(spark, 4800), 480),
        "curation_e2e": (lambda: _curation_df(spark, 4800),
                         lambda: _curation_df(spark, 48000), 4800),
    }

    def timed(mk) -> float:
        mk().write.format("noop").mode("overwrite").save()  # warm
        drain()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            drain()
        return round(best, 3)

    out = {}
    for name, (mk1, mk10, n1) in rows.items():
        t1 = timed(mk1)
        t10 = timed(mk10)
        out[name] = {
            "n_1x": n1, "sec_1x": t1, "n_10x": n1 * 10, "sec_10x": t10,
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
        }
        print(f"# {name}: {t1}s @ {n1} -> {t10}s @ {n1 * 10}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
