"""Multimodal (image/audio/video) column plumbing for training pipelines.

Policy: media payloads are opaque ``binary`` columns beside a typed
``media_meta`` struct; all shaping (schema, partitioning, Arrow batch flow,
UDF signatures) is real and tested, while the actual codec work (JPEG
decode, resampling, frame extraction) is stubbed — the container image has
no image/audio libraries. Stubs are deterministic fakes behind
``use_fake=True`` (so pipelines are testable end-to-end) or raise
``NotImplementedError`` when a real decode is demanded.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id string, kind string, payload binary, "
    "media_meta struct<mime:string, width:int, height:int, "
    "sample_rate:int, n_frames:int, n_bytes:bigint>"
)

FEATURE_DDL = (
    "media_id string, kind string, feature array<float>, "
    "feat_meta struct<dim:int, method:string>"
)


def synthetic_media_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n)
    h = F.shiftrightunsigned(F.xxhash64("id", F.lit(seed)), 1)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (h % 3 + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256) \
        .cast("binary")
    meta = F.struct(
        F.when(kind == "image", F.lit("image/jpeg"))
        .when(kind == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4")).alias("mime"),
        F.when(kind == "image", (h % 1920 + 1).cast("int")).otherwise(F.lit(0)).alias("width"),
        F.when(kind == "image", (h % 1080 + 1).cast("int")).otherwise(F.lit(0)).alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0)).alias("sample_rate"),
        F.when(kind == "video", (h % 300 + 1).cast("int")).otherwise(F.lit(0)).alias("n_frames"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )
    return df.select(
        F.format_string("media_%08d", F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("media_meta"),
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding derived from payload bytes."""
    h = np.frombuffer(payload[: (len(payload) // 8) * 8], dtype=np.uint64)
    rng = np.random.default_rng(int(h[0]) if h.size else 0)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 32,
                     use_fake: bool = True) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Batch shape: pandas DataFrames of Arrow-transferred rows; the per-batch
    body is vectorized over the batch. With ``use_fake=False`` this raises
    NotImplementedError (no media codecs in this environment) — the Spark
    plumbing (schema, batching, partition flow) is identical either way.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real media decode needs image/audio libs absent here"
                )
            feats = [
                _fake_feature(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_meta": [{"dim": dim, "method": "fake_v1"}] * len(pdf),
                }
            )

    return media.mapInPandas(mapper, FEATURE_DDL)


def resize_images(media: DataFrame, width: int, height: int,
                  use_fake: bool = True) -> DataFrame:
    """Image resize stub: passes non-images through untouched; images get
    updated meta (and, in a real impl, a re-encoded payload)."""

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not use_fake:
                raise NotImplementedError("real image resize not available")
            tbl = batch.to_pydict()
            metas = tbl["media_meta"]
            for i, kind in enumerate(tbl["kind"]):
                if kind == "image":
                    metas[i] = {**metas[i], "width": width, "height": height}
            yield pa.RecordBatch.from_pydict(
                tbl, schema=pa.schema(batch.schema)
            )

    return media.mapInArrow(mapper, MEDIA_DDL)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    Pure JVM-side explode over the frame-count metadata — the real frame
    *extraction* would decode `payload` per sampled index (stubbed)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("media_meta.n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_idx"),
            F.col("media_meta.n_frames").alias("n_frames"),
        )
    )
