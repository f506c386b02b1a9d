"""Multimodal column handling (SURVEY.md §2.10 X5).

Images/audio/video are opaque ``binary`` payloads + typed metadata
structs; decode/feature steps run as Arrow-batched ``mapInPandas``
pipelines partitioned for decode parallelism.

The decode kernels themselves are STUBS in this environment (no
image/audio libraries in the container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) stands in so the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and testable end-to-end.

Scale notes: binary payloads dominate partition size — repartition by
size budget (``target_rows_per_partition``) before decode so a batch
of decoded frames fits executor memory; metadata-only transforms
(filtering by width/height/duration) should happen BEFORE decode via
the typed metadata column, pushing the expensive kernel past the
cheapest filters.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: all features derived from the
    content hash, so tests are reproducible without codec libraries."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0] % 64,
        "height": 64 + h[1] % 64,
        "mean_luma": round(h[2] / 255.0, 6),
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


def decode_image_features(
    media: DataFrame,
    fake: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched decode -> feature extraction over image rows.

    Real implementation would call PIL/libvips inside the batch loop;
    the plumbing (partition sizing, batch shape, schema) is identical.

    Partition sizing: pass ``num_partitions`` to force a shuffle when
    upstream layout is decode-hostile; default trusts the scan layout —
    at scale, payload bytes per task are already bounded by
    ``spark.sql.files.maxPartitionBytes`` at the parquet scan, and Arrow
    batch memory by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    (Never pre-``count()`` a fact table to pick a partition number —
    that is a full extra scan at 100 TB.)
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: executors' Python workers may not have
        # this package on their import path (cloudpickle serializes
        # nested defs by value, module references by import).
        import hashlib as _hl

        import pandas as _pd

        def fake_decode(payload: bytes) -> dict:
            h = _hl.sha256(payload or b"").digest()
            return {
                "width": 64 + h[0] % 64,
                "height": 64 + h[1] % 64,
                "mean_luma": round(h[2] / 255.0, 6),
                "phash": int.from_bytes(h[3:11], "big", signed=True),
            }

        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "image decode requires PIL/libvips (absent in this "
                        "container); pass fake=True for the deterministic stub"
                    )
                f = fake_decode(bytes(payload) if payload is not None else b"")
                f["media_id"] = int(mid)
                feats.append(f)
            yield _pd.DataFrame(feats)[
                ["media_id", "width", "height", "mean_luma", "phash"]
            ]

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    if num_partitions:
        imgs = imgs.repartition(num_partitions)
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched image resize: (media_id, payload, width, height)
    with payload re-encoded at the target size. Kernel stubbed (PIL
    absent): ``fake=True`` emits a deterministic content-hash-seeded
    payload of ``width*height`` bytes, so downstream plumbing sees
    realistic size characteristics. Payload bytes dominate both sides
    of this operator — same partition-sizing doctrine as decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "image resize requires PIL/libvips (absent in this "
                        "container); pass fake=True for the deterministic stub"
                    )
                seed = _hl.sha256(bytes(payload) if payload else b"").digest()
                n = width * height
                buf = (seed * (n // len(seed) + 1))[:n]
                out.append(
                    {"media_id": int(mid), "payload": buf,
                     "width": width, "height": height}
                )
            yield _pd.DataFrame(out)[["media_id", "payload", "width", "height"]]

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    if num_partitions:
        imgs = imgs.repartition(num_partitions)
    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
    ]
)


def extract_audio_features(
    media: DataFrame, fake: bool = False, num_partitions: int | None = None
) -> DataFrame:
    """Arrow-batched audio feature extraction (rms, zero-crossing rate)
    plus metadata passthrough. Kernel stubbed (no audio libs):
    ``fake=True`` derives features from the content hash. Metadata
    (sample_rate/duration) rides along from the typed meta column —
    never re-derived from payload bytes when the catalog already has
    it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for mid, payload, sr, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError(
                        "audio decode requires soundfile/librosa (absent in "
                        "this container); pass fake=True for the stub"
                    )
                h = _hl.sha256(bytes(payload) if payload else b"").digest()
                out.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": None if _pd.isna(sr) else int(sr),
                        "duration_ms": None if _pd.isna(dur) else int(dur),
                        "rms": round(h[0] / 255.0, 6),
                        "zero_crossing_rate": round(h[1] / 255.0, 6),
                    }
                )
            yield _pd.DataFrame(out)[
                ["media_id", "sample_rate", "duration_ms", "rms",
                 "zero_crossing_rate"]
            ]

    auds = media.where(F.col("kind") == "audio").select(
        "media_id", "payload",
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    if num_partitions:
        auds = auds.repartition(num_partitions)
    return auds.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    derived from metadata only — no decode. The decode of selected
    frames is a second mapInPandas pass (stubbed as above). This split
    (plan from metadata, decode only selected frames) is the 100 TB
    pattern: never touch payload bytes to decide what to sample."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    ).withColumn("frame_ts_ms", F.col("frame_ts_ms").cast("long"))


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/demos."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        meta = {
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 5000 if kind in ("audio", "video") else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((i, kind, payload, meta))
    # Tiny frame: confine to a few partitions so mapInPandas doesn't
    # fan 64 rows across 32 Python workers (worker spin-up dominates).
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)
