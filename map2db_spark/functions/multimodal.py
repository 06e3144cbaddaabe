"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

The decode libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the *decode step* is stubbed two ways:

- ``decode_image_real`` raises NotImplementedError behind an
  import-try (the production slot — drop in PIL and it runs);
- ``fake_decode_features`` derives deterministic pseudo-features from
  the payload bytes (md5-seeded), so the Spark-side plumbing — binary
  columns through Arrow batches, mapInPandas batch shapes, schema,
  partition sizing — is fully real and testable.

At 100 TB the shape of this pipeline is the entire game: payloads
must stream through ``mapInPandas`` (never collect), partitions must
be sized by bytes not rows (spark.sql.files.maxPartitionBytes), and
feature extraction must be batch-vectorized.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, payload BINARY, "
    "meta_width INT, meta_height INT, meta_duration_ms INT"
)

FEATURE_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes INT, digest STRING, "
    "feat ARRAY<FLOAT>"
)

try:  # pragma: no cover - production slot
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def decode_image_real(payload: bytes):  # pragma: no cover
    """Production decode slot: replace the fake extractor with real
    pixel decode when PIL is available."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this container stubs it "
            "(fake_decode_features provides the deterministic stand-in)"
        )
    raise NotImplementedError("wire PIL decode here")


def fake_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic pseudo-feature vector from payload bytes: md5 of
    the payload seeds the values.  Stable across runs and engines."""
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw % 1000).astype("float32") / 1000.0


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Stand-in media table: document text bytes as opaque payloads
    with synthetic metadata (the real pipeline reads binaryFile or
    parquet with a binary column — identical downstream plumbing)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("meta_width"),
        (F.col("n_chars") % 1080).cast("int").alias("meta_height"),
        (F.col("n_chars") * 10).cast("int").alias("meta_duration_ms"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.  The
    kernel sees pandas batches of raw bytes; nothing is collected."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "digest": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: the Arrow-batched shape of an image-resize pass
    (payload in, payload + updated metadata out).  The pixel transform
    is the stubbed step — with PIL present it decodes/resizes/encodes;
    here a deterministic truncation stands in so batch flow, schema,
    and metadata updates are fully real."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover - production slot
                raise NotImplementedError("wire PIL resize here")
            target = width * height // 64  # deterministic fake: scale bytes
            pdf = pdf.copy()
            pdf["payload"] = [
                p[: max(target, 1)] if p is not None else None
                for p in pdf["payload"]
            ]
            pdf["meta_width"] = width
            pdf["meta_height"] = height
            yield pdf

    return media.where(F.col("kind") == "image").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_ts_ms).  The actual frame decode is the stubbed
    step; the explode that fans a 2-hour video into 7200 work items —
    the part that matters for partitioning — is real."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
