"""Multimodal column handling (SURVEY.md §2.10 X5).

Images/audio/video are opaque ``binary`` payloads + typed metadata
structs; decode/feature steps run as Arrow-batched ``mapInPandas``
pipelines partitioned for decode parallelism.

Decode kernels: REAL pure-numpy codecs for the library-free formats —
netpbm images (P5/P6) and RIFF/PCM WAV audio are parsed, featurized,
resized, and re-encoded with nothing but numpy/struct, so the decode
path is genuinely exercised end-to-end in this container. Formats
that require PIL/libvips/librosa (JPEG, PNG, MP3, ...) raise
``NotImplementedError`` unless ``fake=True`` selects the
deterministic content-hash stub; the Spark-side plumbing — schema,
batch iteration, partitioning, UDF signatures — is identical either
way.

Scale notes: binary payloads dominate partition size — repartition by
size budget (``target_rows_per_partition``) before decode so a batch
of decoded frames fits executor memory; metadata-only transforms
(filtering by width/height/duration) should happen BEFORE decode via
the typed metadata column, pushing the expensive kernel past the
cheapest filters.
"""

from __future__ import annotations

import hashlib
import os
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
        # exact integer decode witness: 299·Σr + 587·Σg + 114·Σb for
        # RGB (1000·Σv for gray) — pure integer arithmetic over the
        # decoded pixels, so a differential oracle can replay it with
        # no float-rounding ambiguity (mean_luma is rounded to 6 d.p.)
        T.StructField("luma_sum", T.LongType(), True),
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


# ---------------------------------------------------------------------------
# Real, library-free codecs: netpbm (P5 gray / P6 RGB) and RIFF PCM WAV
# ---------------------------------------------------------------------------


#: repo root captured at import time (a plain string, so closures that
#: embed it serialize by value); executor Python workers bootstrap
#: their sys.path with it before importing this module's codecs —
#: workers do NOT inherit the driver's sys.path mutations.
_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def decode_netpbm(payload: bytes):
    """Parse a binary netpbm image → numpy array (HxW gray for P5,
    HxWx3 for P6, uint8). Pure Python/numpy — no codec library.
    Returns None if the payload is not netpbm."""
    import numpy as np

    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    # header = magic, width, height, maxval as whitespace-separated
    # tokens with '#' comments; pixel data follows the single
    # whitespace byte after maxval
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i] not in b"\r\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        return None  # 16-bit netpbm: out of scope
    ch = 3 if payload[:2] == b"P6" else 1
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    return pix.reshape((h, w, 3)) if ch == 3 else pix.reshape((h, w))


def decode_image_any(payload: bytes):
    """Best-available image decode → uint8 numpy array (HxW gray or
    HxWx3 RGB), or None if no decoder applies.

    Order: the pure-numpy netpbm codec (always available), then Pillow
    if importable — the gate for JPEG/PNG/WebP/...: this container
    ships no codec libraries, so those formats raise downstream, but a
    deployment that installs Pillow gets them through the IDENTICAL
    Arrow-batched pipeline with zero code changes
    (tests/test_llm_ops.py::test_pil_decode_path_when_available is the
    contract and runs wherever Pillow exists)."""
    import numpy as np

    img = decode_netpbm(payload)
    if img is not None:
        return img
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            mode = "L" if im.mode in ("1", "L", "I;16", "I") else "RGB"
            return np.asarray(im.convert(mode), dtype=np.uint8)
    except Exception:
        return None


def encode_ppm(arr) -> bytes:
    """Encode an HxW (gray) or HxWx3 (RGB) uint8 array as binary
    netpbm (P5/P6)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        head = b"P5 %d %d 255\n" % (a.shape[1], a.shape[0])
    else:
        head = b"P6 %d %d 255\n" % (a.shape[1], a.shape[0])
    return head + a.tobytes()


def _luma(img):
    """Rec.601 luma in [0, 1] from a decoded netpbm array."""
    import numpy as np

    if img.ndim == 2:
        return img.astype(np.float64) / 255.0
    r, g, b = (img[..., k].astype(np.float64) for k in range(3))
    return (0.299 * r + 0.587 * g + 0.114 * b) / 255.0


def _ahash64(luma) -> int:
    """64-bit average hash: 8x8 block-mean luma, bit = block > mean."""
    import numpy as np

    h, w = luma.shape
    ys = (np.arange(8) * h // 8).astype(int)
    xs = (np.arange(8) * w // 8).astype(int)
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    blocks = np.array(
        [[luma[ys[i]:ye[i], xs[j]:xe[j]].mean() for j in range(8)]
         for i in range(8)]
    )
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # interpret as signed 64-bit for a LongType column
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_wav(payload: bytes):
    """Parse a RIFF PCM WAV → (sample_rate, float64 samples in [-1,1],
    mono-mixed). Pure struct/numpy. Returns None if not PCM WAV."""
    import struct

    import numpy as np

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    rate, channels, bits, data = None, None, None, None
    while i + 8 <= n:
        cid, sz = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                return None  # compressed WAV: out of scope
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if rate is None or data is None or bits not in (8, 16):
        return None
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if channels and channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return rate, x


def encode_wav(rate: int, samples) -> bytes:
    """Encode float samples in [-1,1] as 16-bit mono PCM WAV."""
    import struct

    import numpy as np

    pcm = (np.clip(np.asarray(samples), -1.0, 1.0) * 32767.0).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


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

    pkg_root = _PKG_ROOT

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: executors' Python workers may not have
        # this package on their import path (cloudpickle serializes
        # nested defs by value, module references by import) — bootstrap
        # sys.path with the driver-captured repo root first.
        import hashlib as _hl
        import sys as _sys

        import pandas as _pd

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from datastream_spark.operators.multimodal import (
            _ahash64,
            _luma,
            decode_image_any,
        )

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
                raw = bytes(payload) if payload is not None else b""
                img = decode_image_any(raw)
                if img is not None:
                    # REAL decode path (netpbm codec, or Pillow when
                    # installed — decode_image_any)
                    luma = _luma(img)
                    if img.ndim == 3:
                        csum = img.astype("int64").sum(axis=(0, 1))
                        lsum = int(299 * csum[0] + 587 * csum[1] + 114 * csum[2])
                    else:
                        lsum = int(1000 * img.astype("int64").sum())
                    f = {
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_luma": round(float(luma.mean()), 6),
                        "phash": _ahash64(luma),
                        "luma_sum": lsum,
                    }
                elif fake:
                    f = fake_decode(raw)
                    f["luma_sum"] = None
                else:
                    raise NotImplementedError(
                        "image decode: payload is neither netpbm (always "
                        "supported) nor a format Pillow can open (Pillow "
                        "not installed in this container — install it to "
                        "enable JPEG/PNG on this same pipeline), and "
                        "fake=False rejects the stub"
                    )
                f["media_id"] = int(mid)
                feats.append(f)
            yield _pd.DataFrame(feats)[
                ["media_id", "width", "height", "mean_luma", "phash", "luma_sum"]
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

    pkg_root = _PKG_ROOT

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import sys as _sys

        import numpy as _np
        import pandas as _pd

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from datastream_spark.operators.multimodal import (
            decode_netpbm,
            encode_ppm,
        )

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload else b""
                img = decode_netpbm(raw)
                if img is not None:
                    # REAL resize: nearest-neighbor index map, re-encoded
                    ys = (_np.arange(height) * img.shape[0] // height).astype(int)
                    xs = (_np.arange(width) * img.shape[1] // width).astype(int)
                    resized = img[ys][:, xs]
                    buf = encode_ppm(resized)
                elif fake:
                    seed = _hl.sha256(raw).digest()
                    n = width * height
                    buf = (seed * (n // len(seed) + 1))[:n]
                else:
                    raise NotImplementedError(
                        "non-netpbm image resize requires PIL/libvips "
                        "(absent in this container); netpbm resizes "
                        "natively, or pass fake=True for the stub"
                    )
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

    pkg_root = _PKG_ROOT

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import sys as _sys

        import numpy as _np
        import pandas as _pd

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from datastream_spark.operators.multimodal import decode_wav

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for mid, payload, sr, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"], pdf["duration_ms"]
            ):
                raw = bytes(payload) if payload else b""
                wav = decode_wav(raw)
                if wav is not None:
                    # REAL decode path (pure-struct/numpy PCM WAV)
                    rate, x = wav
                    rms = float(_np.sqrt((x * x).mean())) if len(x) else 0.0
                    zcr = (
                        float((_np.diff(_np.signbit(x)) != 0).mean())
                        if len(x) > 1
                        else 0.0
                    )
                    row = {
                        "media_id": int(mid),
                        "sample_rate": int(rate),
                        "duration_ms": int(len(x) * 1000 // rate),
                        "rms": round(rms, 6),
                        "zero_crossing_rate": round(zcr, 6),
                    }
                elif fake:
                    h = _hl.sha256(raw).digest()
                    row = {
                        "media_id": int(mid),
                        "sample_rate": None if _pd.isna(sr) else int(sr),
                        "duration_ms": None if _pd.isna(dur) else int(dur),
                        "rms": round(h[0] / 255.0, 6),
                        "zero_crossing_rate": round(h[1] / 255.0, 6),
                    }
                else:
                    raise NotImplementedError(
                        "non-WAV audio decode requires soundfile/librosa "
                        "(absent in this container); PCM WAV decodes "
                        "natively, or pass fake=True for the stub"
                    )
                out.append(row)
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
    """Deterministic synthetic media table for tests/demos.

    Image and audio payloads are REAL encodings (binary PPM / PCM WAV,
    seeded deterministically), so the decode pipelines exercise the
    genuine pure-numpy codecs; video payloads stay opaque (the video
    path is metadata-planned, never decoded here)."""
    import numpy as np

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        seed = hashlib.sha256(str(i).encode()).digest()
        if kind == "image":
            w, h = 16 + seed[0] % 16, 16 + seed[1] % 16
            rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
            payload = encode_ppm(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint16).astype(
                    np.uint8
                )
            )
            meta = {"width": w, "height": h, "sample_rate": None,
                    "duration_ms": None, "codec": "ppm"}
        elif kind == "audio":
            rate, dur_ms = 8000, 250
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            freq = 200 + (seed[2] % 10) * 50
            payload = encode_wav(rate, 0.5 * np.sin(2 * np.pi * freq * t))
            meta = {"width": None, "height": None, "sample_rate": rate,
                    "duration_ms": dur_ms, "codec": "pcm"}
        else:
            payload = seed * 4
            meta = {"width": None, "height": None, "sample_rate": None,
                    "duration_ms": 5000, "codec": "h264"}
        rows.append((i, kind, payload, meta))
    # Tiny frame: confine to a few partitions so mapInPandas doesn't
    # fan 64 rows across 32 Python workers (worker spin-up dominates).
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_pattern_media(spark, n: int = 48) -> DataFrame:
    """Synthetic P6 images whose pixels follow a closed-form integer
    pattern — pixel(row, col, ch) = (id·7919 + row·31 + col·17 +
    ch·101) mod 256, size (16 + 13·id mod 16) × (16 + 29·id mod 16) —
    so an independent engine can recompute every decode feature from
    arithmetic alone (no RNG, no shared codec code). The payloads are
    REAL binary PPM: the probe exercises the genuine header parse +
    pixel reshape, and the oracle checks what came out of it."""
    import numpy as np

    rows = []
    for i in range(n):
        w = 16 + (i * 13) % 16
        h = 16 + (i * 29) % 16
        r = np.arange(h).reshape(h, 1, 1)
        c = np.arange(w).reshape(1, w, 1)
        ch = np.arange(3).reshape(1, 1, 3)
        px = ((i * 7919 + r * 31 + c * 17 + ch * 101) % 256).astype(np.uint8)
        meta = {"width": w, "height": h, "sample_rate": None,
                "duration_ms": None, "codec": "ppm"}
        rows.append((i, "image", encode_ppm(px), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)
