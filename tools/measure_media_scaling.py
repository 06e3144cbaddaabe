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
  caveat.

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
