"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side contract (schema, batching, partition sizing) is real and
tested, while the actual codec work is stubbed: the container has no
image/audio libraries, so `decode` raises NotImplementedError unless the
deterministic fake decoder is requested (tests/bench use the fake).

At scale the rules this module encodes:
  * payloads never pass through Python row-at-a-time -- `mapInPandas`
    with Arrow batches, one numpy view per batch;
  * metadata (width/height/duration) lives in plain columns so filters
    (e.g. min-resolution gates) push down to the scan WITHOUT touching
    payload bytes;
  * feature extraction emits fixed-width arrays, keeping downstream
    similarity ops (similarity.py) JVM-side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),     # image/audio/video
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def decode_payload(payload: bytes, media_type: str):
    """Real decoder entry point -- requires codec libraries absent from
    this container."""
    raise NotImplementedError(
        "real image/audio decode needs Pillow/libav, not present in this "
        "environment; use fake=True for the deterministic stand-in"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a feature extractor: 16 floats derived
    from the md5 of the payload bytes.  Stable across runs/machines."""
    d = hashlib.md5(payload or b"").digest()
    return (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batched feature extraction over payload bytes via mapInPandas.

    The Arrow batch shape is the real contract: each batch arrives as a
    pandas DataFrame, payloads as Python bytes; the kernel vectorizes per
    batch and emits fixed-width float arrays.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_feature(p).tolist() for p in pdf["payload"]]
            else:  # pragma: no cover - requires codec libs
                feats = [decode_payload(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
            })

    pruned = media.select("media_id", "media_type", "payload")
    return pruned.mapInPandas(kernel, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("target_w", T.IntegerType(), True),
    T.StructField("target_h", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(media: DataFrame, max_dim: int = 512, fake: bool = True) -> DataFrame:
    """Aspect-preserving image resize via mapInPandas.

    The Spark-side contract is real: Arrow batches of (metadata, payload
    bytes) in, resized payloads + integer target dims out; the pixel work
    is the stubbed step (no codec libs in this container) -- the fake
    decoder passes payload bytes through.  Target dims are pure integer
    arithmetic (floor(dim * max_dim / longest_side), no-op when the image
    already fits), so they are exactly reproducible by a SQL oracle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tw, th, payloads = [], [], []
            for w, h, p in zip(pdf["width"], pdf["height"], pdf["payload"]):
                if pd.isna(w) or pd.isna(h):
                    # MEDIA_SCHEMA declares dims nullable: missing metadata
                    # passes through untouched rather than crashing the task
                    tw.append(None)
                    th.append(None)
                    payloads.append(p)
                    continue
                w, h = int(w), int(h)
                longest = max(w, h)
                if longest <= max_dim or longest == 0:
                    nw, nh = w, h
                else:
                    nw, nh = (w * max_dim) // longest, (h * max_dim) // longest
                tw.append(nw)
                th.append(nh)
                if fake:
                    payloads.append(p)          # pixel work is the stub
                else:  # pragma: no cover - requires codec libs
                    payloads.append(decode_payload(p, "image"))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "width": pdf["width"], "height": pdf["height"],
                "target_w": tw, "target_h": th, "payload": payloads,
            })

    from pyspark.sql import functions as F
    pruned = (media.filter(F.col("media_type") == "image")
              .select("media_id", "width", "height", "payload"))
    return pruned.mapInPandas(kernel, RESIZE_SCHEMA)


def resolution_gate(media: DataFrame, min_w: int = 64, min_h: int = 64) -> DataFrame:
    """Metadata-only filter: prunes payload bytes at the scan (the whole
    point of keeping width/height out of the blob)."""
    from pyspark.sql import functions as F
    return media.filter(
        (F.col("media_type") != "image")
        | ((F.col("width") >= min_w) & (F.col("height") >= min_h))
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (decode itself is the stubbed step).  Spark-side: sequence +
    explode, no Python."""
    from pyspark.sql import functions as F
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
