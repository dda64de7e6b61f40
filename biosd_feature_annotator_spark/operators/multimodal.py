"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode kernels themselves are STUBS — this container has no
image/audio codecs (no PIL/ffmpeg), so ``decode_image`` raises unless
``fake=True``, which substitutes a deterministic hash-derived "decode"
(same bytes → same pixels). Everything around the kernel is real and
tested: the schema contract, the mapInPandas batch shape, partition-local
execution, and the feature/resize/frame-sample plumbing — swap the kernel
body for Pillow/ffmpeg on a real cluster and nothing else changes.

Schema contract:
    media(media_id string, kind string /* image|audio|video */,
          payload binary, meta struct<width:int, height:int,
          sample_rate:int, n_frames:int, mime:string>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, feature array<float>"
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes → pseudo-pixels.
    Same payload always yields the same array (test-stable). The /256
    divisor is a power of two so byte/256 is EXACT in float32 and double —
    the SQL oracle recomputes the identical values with no float-precision
    slack."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(dim / arr.size))
    return (np.tile(arr, reps)[:dim].astype(np.float32) / 256.0)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """payload → fixed-dim feature vector. Iterator mapInPandas: the
    (stub) codec initializes once per task; batches arrive Arrow-sized so
    peak memory is bounded by batch_rows × payload size."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding needs Pillow/ffmpeg — unavailable in "
            "this environment; run with fake=True for plumbing tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, dim).tolist() for p in pdf["payload"].values
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"].values],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: validates meta, routes only images, tags target
    size. The pixel kernel is the stubbed part; the plan (filter +
    metadata rewrite) is the Spark-side contract."""
    return (
        media.where(F.col("kind") == "image")
        .withColumn(
            "meta",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.col("meta.n_frames").alias("n_frames"),
                F.col("meta.mime").alias("mime"),
            ),
        )
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (posexplode of the frame-index sequence) — the shuffle-free
    fan-out a real frame extractor plugs into."""
    vids = media.where((F.col("kind") == "video") & (F.col("meta.n_frames") > 0))
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return vids.select(
        "media_id",
        "payload",
        F.explode(idx).alias("frame_idx"),
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic binary-column fixture (hash-derived payload bytes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.to_binary(F.md5(F.col("id").cast("string")), F.lit("hex")).alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id"), F.lit(50)) + 1).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
    return df
