"""Round-7 query registrations: the native-first image-decode
dispatch (VERDICT r6 #1) and the multimodal decode bench row
(VERDICT r6 #2).

New operators land here so the registry tier logic (registry.py) puts
them inside the driver's graded-50 window: a fresh operator gets its
hard correctness row the same round it ships.
"""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from map2db_spark.registry import query


def _modsum_sql(a: str, n: str, m: int) -> str:
    """DuckDB expression for SUM_{i=0}^{n-1} (a + i) % m in closed
    form (exact BIGINT arithmetic, verified against brute force in
    tests/test_native_dispatch.py::test_modsum_closed_form): full
    cycles contribute m*(m-1)/2 each; the tail splits at the wrap."""
    a0 = f"(({a}) % {m})"
    rem = f"(({n}) % {m})"
    c1 = f"({m} - {a0})"
    c2 = f"({rem} - {c1})"
    return (
        f"(CAST(({n}) // {m} AS BIGINT) * {m * (m - 1) // 2}"
        f" + CASE WHEN {rem} <= {c1}"
        f"   THEN {rem} * {a0} + {rem} * ({rem} - 1) // 2"
        f"   ELSE {c1} * {a0} + {c1} * ({c1} - 1) // 2"
        f"        + {c2} * ({c2} - 1) // 2"
        f"   END)"
    )


# ---------------------------------------------------------------------------
# Native-first decode dispatch certification (VERDICT r6 #1)
# ---------------------------------------------------------------------------


@query(
    "m_decode_native_dispatch",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'webp'
                WHEN 2 THEN 'tiff' WHEN 3 THEN 'gif'
                WHEN 4 THEN 'webp' ELSE 'jpeg' END AS fmt,
           CAST(CASE WHEN doc_id % 6 = 4 THEN 16 + (doc_id % 3) * 16
                ELSE 12 + doc_id % 9 END AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 6 = 4 THEN 16 + (doc_id % 2) * 16
                ELSE 8 + doc_id % 7 END AS INTEGER) AS height,
           TRUE AS native_path,
           TRUE AS cross_checked,
           TRUE AS pix_ok
    FROM documents WHERE doc_id < 48
    """,
    tags=("multimodal", "image", "dispatch", "native"),
)
def m_decode_native_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certifies the native-first production decode slot
    (functions/multimodal.py decode_image_with_info): for payloads
    cycling PNG / lossless-WebP / TIFF / GIF / lossy-WebP / JPEG by
    doc_id, the NATIVE path (libpng / libwebp / libtiff / giflib via
    ctypes; libjpeg via the session-compiled shim — r8, VERDICT r7 #1)
    produced the pixels (native_path), every decode cross-checked
    against the from-scratch codec on the format's guaranteed-equal
    surface — full pixels for the lossless four, YUV+alpha planes for
    lossy WebP, quantized DCT coefficients for JPEG — without
    divergence (cross_checked; the check raises on disagreement, so a
    TRUE row is a passed comparison), and the decoded pixels equal
    the closed-form fixture (pix_ok; for the lossy-WebP kind, shape +
    full opacity — content equality is the plane-level cross-check's
    job; the JPEG fixture is 8x8-constant tiles, whose DC-only blocks
    quantize losslessly under the q_dc=8 fixture table, so even the
    lossy format pins exact pixels).  The oracle pins the closed-form
    dims and the all-TRUE outcome.

    Scale shape: map-only mapInPandas; payloads never shuffle and
    never touch the driver."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 48
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions import libjpeg_oracle as LJ
        from map2db_spark.functions import libwebp_oracle as LW
        from map2db_spark.functions import multimodal as M
        from map2db_spark.functions.gif_codec import encode_gif
        from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline
        from map2db_spark.functions.png import encode_png
        from map2db_spark.functions.tiff_codec import encode_tiff
        from map2db_spark.functions.webp_vp8l import encode_vp8l

        if not (LW.available() and LJ.available()):
            raise RuntimeError(
                "m_decode_native_dispatch needs the system codec libs"
            )
        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        for pdf in batches:
            out = {"media_id": [], "fmt": [], "width": [], "height": [],
                   "native_path": [], "cross_checked": [], "pix_ok": []}
            for did in pdf["doc_id"]:
                did = int(did)
                kind = did % 6
                if kind == 4:
                    w = 16 + (did % 3) * 16
                    h = 16 + (did % 2) * 16
                else:
                    w = 12 + did % 9
                    h = 8 + did % 7
                if kind == 0:
                    expected = (
                        (did * 7 + np.arange(w * h * 3)) % 256
                    ).astype(np.uint8).reshape(h, w, 3)
                    payload = encode_png(expected)
                elif kind == 1:
                    expected = (
                        (did * 5 + np.arange(w * h * 4)) % 256
                    ).astype(np.uint8).reshape(h, w, 4)
                    payload = encode_vp8l(expected)
                elif kind == 2:
                    expected = (
                        (did * 13 + np.arange(w * h)) % 256
                    ).astype(np.uint8).reshape(h, w)
                    payload = encode_tiff(expected, compression="lzw")
                elif kind == 3:
                    idx = (
                        (did * 11 + np.arange(w * h)) % 16
                    ).astype(np.uint8).reshape(h, w)
                    expected = pal[idx]
                    payload = encode_gif(idx, pal)
                elif kind == 4:
                    src = np.full((h, w, 4), 90, np.uint8)
                    src[:, :, 0] = (
                        (did * 3 + np.arange(w * h)) % 256
                    ).reshape(h, w).astype(np.uint8)
                    src[:, :, 3] = 255  # opaque: no ALPH ambiguity
                    expected = None  # lossy: plane check is authority
                    payload = LW.encode_rgba(
                        np.ascontiguousarray(src), quality=75.0
                    )
                else:
                    # JPEG: 8x8-constant gray tiles — DC-only blocks
                    # quantize losslessly (q_dc=8 divides 8*(v-128)),
                    # so BOTH decode paths return the source exactly
                    # despite the format being lossy
                    bh, bw = -(-h // 8), -(-w // 8)
                    vgrid = ((did * 17 + np.arange(bh * bw)) % 256
                             ).reshape(bh, bw)
                    expected = np.repeat(
                        np.repeat(vgrid, 8, axis=0), 8, axis=1
                    )[:h, :w].astype(np.uint8)
                    payload = encode_jpeg_baseline(expected)
                px, info = M.decode_image_with_info(
                    payload, cross_check_every=1
                )
                if expected is None:
                    pix_ok = (
                        px.shape == (h, w, 4)
                        and bool((px[:, :, 3] == 255).all())
                    )
                else:
                    pix_ok = bool(np.array_equal(px, expected))
                out["media_id"].append(did)
                out["fmt"].append("webp" if kind == 4 else info["fmt"])
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["native_path"].append(info["path"] == "native")
                out["cross_checked"].append(bool(info["checked"]))
                out["pix_ok"].append(pix_ok)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema="media_id LONG, fmt STRING, width INT, height INT,"
        " native_path BOOLEAN, cross_checked BOOLEAN, pix_ok BOOLEAN",
    )


# ---------------------------------------------------------------------------
# Multimodal decode on the timed gate (VERDICT r6 #2)
# ---------------------------------------------------------------------------

_CORPUS_ROOT = "/tmp/map2db_spark_decode_corpus_v2"  # v2: + jpeg (r8)


def _corpus_path(sf_dir: str) -> str:
    tag = re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir.strip("/"))
    return os.path.join(_CORPUS_ROOT, tag)


def _ensure_decode_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf, cached under /tmp) a mixed-format image
    corpus from the documents table: payload format cycles PNG RGB /
    lossless-WebP RGBA / TIFF gray-LZW / GIF indexed / JPEG gray by
    doc_id, pixel values closed-form in (doc_id, flat index) so a SQL
    oracle can verify the decode aggregates without decoding.  JPEG
    joined the corpus in r8 with the shim-backed native route
    (VERDICT r7 #1/#3): its images are 8x8-constant tiles — DC-only
    blocks quantize losslessly under the fixture table's q_dc=8, so
    the decoded sum stays SQL-derivable even for the lossy format
    (tile value = (doc_id*17 + block_index) % 256, dims padded to
    block multiples).  Block-constant content under-exercises the AC
    run-length loop, so the throughput-representative JPEG number
    lives in BASELINE.md's MB/s/core table (measured on noise
    streams); this row certifies the native dispatch + end-to-end
    aggregate on the timed gate.  Synthesis runs on executors
    (mapInPandas over a repartitioned doc_id column) and is charged
    to the cache build, not the timed decode."""
    path = _corpus_path(sf_dir)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def synth(batches):
        import numpy as np
        import pandas as pd

        from map2db_spark.functions import giflib_oracle as LG
        from map2db_spark.functions import libjpeg_oracle as LJ
        from map2db_spark.functions import libtiff_oracle as LT
        from map2db_spark.functions import libwebp_oracle as LW
        from map2db_spark.functions.jpeg_codec import encode_jpeg_baseline
        from map2db_spark.functions.png import encode_png

        if not (LW.available() and LT.available() and LG.available()
                and LJ.available()):
            raise RuntimeError(
                "m_decode_corpus_bench needs the system codec libs"
            )
        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                k = did % 5
                if k == 4:  # jpeg: block-multiple dims (see docstring)
                    w = 96 + (did % 8) * 8
                    h = 64 + (did % 6) * 8
                else:
                    w = 96 + did % 64
                    h = 64 + did % 48
                if k == 0:
                    px = ((did * 7 + np.arange(w * h * 3)) % 256).astype(
                        np.uint8
                    ).reshape(h, w, 3)
                    payloads.append(encode_png(px))
                elif k == 1:
                    # alpha pinned opaque: libwebp lossless is exact
                    # except for its transparent-RGB cleanup
                    px = np.empty((h, w, 4), np.uint8)
                    px[:, :, :3] = (
                        (did * 5 + np.arange(w * h * 3)) % 256
                    ).astype(np.uint8).reshape(h, w, 3)
                    px[:, :, 3] = 255
                    payloads.append(
                        LW.encode_lossless_rgba(np.ascontiguousarray(px))
                    )
                elif k == 2:
                    px = ((did * 13 + np.arange(w * h)) % 256).astype(
                        np.uint8
                    ).reshape(h, w)
                    payloads.append(LT.encode(px, compression="lzw"))
                elif k == 3:
                    idx = ((did * 11 + np.arange(w * h)) % 16).astype(
                        np.uint8
                    ).reshape(h, w)
                    payloads.append(LG.encode([idx], pal))
                else:
                    bh, bw = h // 8, w // 8
                    vgrid = ((did * 17 + np.arange(bh * bw)) % 256
                             ).reshape(bh, bw)
                    px = np.repeat(
                        np.repeat(vgrid, 8, axis=0), 8, axis=1
                    ).astype(np.uint8)
                    payloads.append(encode_jpeg_baseline(px))
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    (
        docs.repartition(32)
        .mapInPandas(synth, schema="media_id LONG, payload BINARY")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


_BENCH_ORACLE = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 4 THEN 96 + (doc_id % 8) * 8
                  ELSE 96 + doc_id % 64 END AS w,
             CASE WHEN doc_id % 5 = 4 THEN 64 + (doc_id % 6) * 8
                  ELSE 64 + doc_id % 48 END AS h,
             doc_id % 5 AS k
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'webp'
                  WHEN 2 THEN 'tiff' WHEN 3 THEN 'gif'
                  ELSE 'jpeg' END AS fmt,
             CASE k
               WHEN 0 THEN {_modsum_sql('doc_id * 7', 'w * h * 3', 256)}
               WHEN 1 THEN {_modsum_sql('doc_id * 5', 'w * h * 3', 256)}
                         + 255 * w * h
               WHEN 2 THEN {_modsum_sql('doc_id * 13', 'w * h', 256)}
               WHEN 3 THEN 9 * {_modsum_sql('doc_id * 11', 'w * h', 16)}
                    + 3 * w * h
               ELSE 64 * {_modsum_sql('doc_id * 17', '(w // 8) * (h // 8)', 256)}
             END AS s
      FROM d
    )
    SELECT fmt,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(w) AS BIGINT) AS sum_width,
           CAST(SUM(h) AS BIGINT) AS sum_height,
           CAST(SUM(s) AS BIGINT) AS sum_px,
           CAST(COUNT(*) AS BIGINT) AS n_native
    FROM px GROUP BY fmt ORDER BY fmt
"""

# the bench row additionally surfaces the fallback-reason counters
# (VERDICT r8 #7): on a healthy corpus both pin to zero closed-form;
# the streaming twin keeps the original 6-column surface
_BENCH_ORACLE_OBS = _BENCH_ORACLE.replace(
    "CAST(COUNT(*) AS BIGINT) AS n_native",
    "CAST(COUNT(*) AS BIGINT) AS n_native,\n"
    "           CAST(0 AS BIGINT) AS n_fallback,\n"
    "           CAST(0 AS BIGINT) AS n_native_error",
)


# ONE shared definition since r16 (VERDICT r15 #7) — the same gated
# logic had grown three copies (here, operators/exact_substring.py,
# v_hard_negative_mining); kept importable under the old name for the
# r15-era plan gates and call sites.
from map2db_spark.functions.partitioning import (  # noqa: E402
    scatter_if_underspilt as _scatter_if_underspilt,
)


@query(
    "m_decode_corpus_bench",
    oracle=_BENCH_ORACLE_OBS,
    bench=True,
    tags=("multimodal", "image", "bench", "native"),
)
def m_decode_corpus_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal-decode row of the timed gate (VERDICT r6 #2): a
    mixed PNG / lossless-WebP / TIFF / GIF / JPEG corpus (one image
    per documents row, ~100x90 px, cached parquet under /tmp so the
    timed passes measure DECODE, not synthesis) streams through the
    native-first production slot (decode_image_with_info: libpng /
    libwebp / libtiff / giflib via ctypes + libjpeg via the compiled
    shim — the 5-format mix a real corpus has, VERDICT r7 #3; 1-in-64
    sampled cross-check against the from-scratch codecs) and reduces
    to exact per-format pixel aggregates.  n_native pins that every
    payload took the native path; sum_px pins the decoded bytes
    against the closed-form oracle (JPEG via lossless-DC constant
    tiles — see _ensure_decode_corpus) — the timed number is
    end-to-end certified, not a blind throughput claim.  n_fallback
    and n_native_error (VERDICT r8 #7) surface the dispatch layer's
    fallback-reason channel ON the graded gate: a systemic native
    fault (misloaded library, ABI drift) that silently degraded the
    ingest to the 100-1000x slower pure path would flip these from
    their pinned zeros, failing the oracle instead of hiding in a
    slower wall-clock.

    Scale shape: payload scan -> repartition (small-file parquet
    would otherwise decode on 1-2 input partitions — CLAUDE.md rule)
    -> map-only Arrow decode kernel emitting (fmt, dims, sum) rows —
    pixels and payloads never shuffle, never collect -> 5-group
    partial-aggregated groupBy.  At 100 TB this is the ingest plan:
    bytes-sized input splits, native per-payload decode, metadata-only
    shuffle."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    path = _ensure_decode_corpus(spark, sf_dir)
    media = spark.read.parquet(path)

    def kernel(batches):
        from map2db_spark.functions import multimodal as M

        for pdf in batches:
            out = {"media_id": [], "fmt": [], "width": [], "height": [],
                   "sum_px": [], "is_native": [], "native_err": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px, info = M.decode_image_with_info(
                    bytes(payload), cross_check_every=64
                )
                out["media_id"].append(int(mid))
                out["fmt"].append(info["fmt"])
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["sum_px"].append(int(px.astype("int64").sum()))
                out["is_native"].append(
                    1 if info["path"] == "native" else 0
                )
                out["native_err"].append(
                    1 if "native_error" in info else 0
                )
            yield pd.DataFrame(out)

    # GATED scatter (r15, guide §2.4/§8): the cached corpus parquet
    # already scans as ~defaultParallelism splits, so the former
    # unconditional repartition(64) only added a full shuffle of every
    # payload plus 64 Python-worker dispatches for 2.6 MB of input —
    # measured 2.48 s -> 1.38 s standalone min at sf0.1/local[32] by
    # dropping it.  The scatter still fires when the scan arrives
    # under-split (the small-file case the repartition was guarding),
    # so a 1-split corpus never decodes single-task; payloads cross
    # zero Exchanges either way (plan-asserted in tests/test_plans.py).
    media = _scatter_if_underspilt(
        media, spark.sparkContext.defaultParallelism
    )
    decoded = media.mapInPandas(
        kernel,
        schema="media_id LONG, fmt STRING, width INT, height INT,"
        " sum_px LONG, is_native LONG, native_err LONG",
    )
    return (
        decoded.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum("sum_px").alias("sum_px"),
            F.sum("is_native").alias("n_native"),
            (F.count("*") - F.sum("is_native")).cast("long")
            .alias("n_fallback"),
            F.sum("native_err").alias("n_native_error"),
        )
        .orderBy("fmt")
    )


# ---------------------------------------------------------------------------
# Streaming multimodal ingest (continuous decode through the native slot)
# ---------------------------------------------------------------------------


@query(
    "s_stream_media_decode",
    oracle=_BENCH_ORACLE,
    tags=("streaming", "multimodal", "native"),
)
def s_stream_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous multimodal ingest: the decode corpus streams through
    a file-source readStream (binary payload column), each micro-batch
    decodes through the NATIVE-FIRST production slot inside the Arrow
    kernel (same decode_image_with_info dispatch as the batch bench
    row, 1-in-64 cross-check), and complete-mode per-format aggregates
    land via the executor-side foreachBatch file transport — the shape
    a 100 TB ingest runs continuously: arriving media files decode in
    stream micro-batches, only metadata aggregates persist per batch.
    Bounded availableNow run == the batch twin, so the closed-form
    oracle is shared with m_decode_corpus_bench.

    Scale shape: stateless streaming mapInPandas (payloads never
    shuffle, never hit the driver) + a 4-group complete aggregate;
    checkpoint state is offsets + 4 groups, independent of corpus
    size."""
    import pandas as pd

    from map2db_spark.session import ship_package
    from map2db_spark.streaming.events import run_available_now_df

    ship_package(spark)
    path = _ensure_decode_corpus(spark, sf_dir)
    stream = (
        spark.readStream.schema("media_id LONG, payload BINARY")
        .format("parquet")
        .load(path)
    )

    def kernel(batches):
        from map2db_spark.functions import multimodal as M

        for pdf in batches:
            out = {"media_id": [], "fmt": [], "width": [], "height": [],
                   "sum_px": [], "is_native": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px, info = M.decode_image_with_info(
                    bytes(payload), cross_check_every=64
                )
                out["media_id"].append(int(mid))
                out["fmt"].append(info["fmt"])
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["sum_px"].append(int(px.astype("int64").sum()))
                out["is_native"].append(
                    1 if info["path"] == "native" else 0
                )
            yield pd.DataFrame(out)

    decoded = stream.mapInPandas(
        kernel,
        schema="media_id LONG, fmt STRING, width INT, height INT,"
        " sum_px LONG, is_native LONG",
    )
    agg = decoded.groupBy("fmt").agg(
        F.count("*").alias("n_images"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum("sum_px").alias("sum_px"),
        F.sum("is_native").alias("n_native"),
    )
    out = run_available_now_df(agg, "complete")
    return out.select(
        "fmt", "n_images", "sum_width", "sum_height", "sum_px", "n_native"
    ).orderBy("fmt")


# ---------------------------------------------------------------------------
# EXIF metadata + orientation normalization
# ---------------------------------------------------------------------------


@query(
    "m_exif_orientation",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
           'CAM' || CAST(doc_id % 5 AS VARCHAR) AS make,
           '2024:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
             || ' 12:00:00' AS taken_at,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           CAST(16 + doc_id % 7 * 3 AS INTEGER) AS pixel_x,
           CAST(9 + doc_id % 5 * 4 AS INTEGER) AS pixel_y,
           CAST(CASE WHEN 1 + doc_id % 8 >= 5
                THEN 9 + doc_id % 5 * 4
                ELSE 16 + doc_id % 7 * 3 END AS INTEGER) AS oriented_w,
           CAST(CASE WHEN 1 + doc_id % 8 >= 5
                THEN 16 + doc_id % 7 * 3
                ELSE 9 + doc_id % 5 * 4 END AS INTEGER) AS oriented_h,
           TRUE AS sum_preserved,
           TRUE AS roundtrip_ok
    FROM documents WHERE doc_id < 48
    """,
    tags=("multimodal", "image", "metadata", "exif"),
)
def m_exif_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction + orientation normalization
    (functions/exif.py): per row, a camera-layout JPEG (APP1 EXIF
    right after SOI, byte order alternating II/MM) carries closed-form
    Orientation / Make / DateTime / Exif-IFD pixel dims; parse_exif
    reads them from HEADER BYTES ONLY, and apply_orientation
    normalizes a synthetic raster through all 8 EXIF states —
    oriented dims swap for states 5-8, the pixel multiset is
    preserved (sum_preserved), and invert_orientation composes back
    to the original (roundtrip_ok).  This is the pre-decode gate of a
    real image pipeline: capture-time dedup, camera filtering, and
    orientation-aware geometry all run before any entropy decode.

    Scale shape: map-only mapInPandas over header-sized payloads;
    nothing shuffles."""
    import pandas as pd

    from map2db_spark.session import ship_package

    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 48
    ).select("doc_id")

    def kernel(batches):
        import numpy as np

        from map2db_spark.functions.exif import (
            apply_orientation,
            encode_jpeg_with_exif,
            invert_orientation,
            parse_exif,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "orientation", "make", "taken_at",
                "byte_order", "pixel_x", "pixel_y", "oriented_w",
                "oriented_h", "sum_preserved", "roundtrip_ok",
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                o = 1 + did % 8
                w = 16 + did % 7 * 3
                h = 9 + did % 5 * 4
                taken = f"2024:01:{1 + did % 28:02d} 12:00:00"
                jpg = encode_jpeg_with_exif(
                    w, h,
                    orientation=o, make=f"CAM{did % 5}",
                    datetime=taken, pixel_x=w, pixel_y=h,
                    byte_order="<" if did % 2 == 0 else ">",
                )
                meta = parse_exif(jpg)
                px = ((did * 17 + np.arange(w * h * 3)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                oriented = apply_orientation(px, meta["orientation"])
                rt = invert_orientation(oriented, meta["orientation"])
                out["media_id"].append(did)
                out["orientation"].append(meta["orientation"])
                out["make"].append(meta["make"])
                out["taken_at"].append(meta["datetime"])
                out["byte_order"].append(meta["byte_order"])
                out["pixel_x"].append(meta["pixel_x"])
                out["pixel_y"].append(meta["pixel_y"])
                out["oriented_w"].append(oriented.shape[1])
                out["oriented_h"].append(oriented.shape[0])
                out["sum_preserved"].append(
                    int(oriented.astype("int64").sum())
                    == int(px.astype("int64").sum())
                )
                out["roundtrip_ok"].append(bool(np.array_equal(rt, px)))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        schema="media_id LONG, orientation INT, make STRING,"
        " taken_at STRING, byte_order STRING, pixel_x INT, pixel_y INT,"
        " oriented_w INT, oriented_h INT, sum_preserved BOOLEAN,"
        " roundtrip_ok BOOLEAN",
    )
