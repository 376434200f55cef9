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
    """Deterministic fake media table (payload = seeded bytes).

    The driving hash is md5-hex based (not xxhash64) so the DuckDB oracle
    can recompute kind/meta distributions — same trick as
    sources/histograms.histograms_df_oracle."""
    df = spark.range(n)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("id").cast("string"),
                              F.lit(str(seed)))), 1, 8),
        16, 10,
    ).cast("long")
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


def _payload_seeds(payload: pa.Array) -> np.ndarray:
    """First 8 little-endian bytes of each binary payload as uint64 (0 for
    shorter payloads) — straight buffer math, no per-row Python."""
    if pa.types.is_large_binary(payload.type):
        payload = payload.cast(pa.binary())
    bufs = payload.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32,
                         count=payload.offset + len(payload) + 1
                         )[payload.offset:].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    lens = np.diff(offs)
    seeds = np.zeros(len(payload), dtype=np.uint64)
    ok = lens >= 8
    if ok.any():
        idx = offs[:-1][ok, None] + np.arange(8)
        first8 = data[idx].astype(np.uint64)
        seeds[ok] = (first8 << (np.arange(8, dtype=np.uint64) * 8)).sum(
            axis=1, dtype=np.uint64)
    return seeds


def _fake_features_batch(seeds: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic fake embeddings: splitmix64-style mix of
    (payload seed, feature index) -> float32 in [-1, 1). One (n, dim)
    matrix pass — the whole batch at once."""
    j = np.arange(dim, dtype=np.uint64)
    z = seeds[:, None] + (j + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return ((z >> np.uint64(11)).astype(np.float64)
            / float(1 << 52) - 1.0).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 32,
                     use_fake: bool = True) -> DataFrame:
    """Decode + feature-extract media payloads via mapInArrow.

    Batch-vectorized: payload seeds come from Arrow buffer math, the fake
    embedding is one (n, dim) hash-mix matrix — zero per-row Python. With
    ``use_fake=False`` this raises NotImplementedError (no media codecs in
    this environment); the Spark plumbing (schema, batching, partition
    flow) is identical either way, which is the tested part.
    """

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not batch.num_rows:
                continue
            if not use_fake:
                raise NotImplementedError(
                    "real media decode needs image/audio libs absent here"
                )
            n = batch.num_rows
            feats = _fake_features_batch(
                _payload_seeds(batch.column("payload")), dim)
            feature = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * dim),
                pa.array(feats.reshape(-1), type=pa.float32()))
            feat_meta = pa.StructArray.from_arrays(
                [pa.array(np.full(n, dim, dtype=np.int32)),
                 pa.array(["fake_v1"] * n, type=pa.string())],
                names=["dim", "method"])
            yield pa.RecordBatch.from_arrays(
                [batch.column("media_id"), batch.column("kind"),
                 feature, feat_meta],
                names=["media_id", "kind", "feature", "feat_meta"])

    return media.mapInArrow(mapper, FEATURE_DDL)


def resize_images(media: DataFrame, width: int, height: int,
                  use_fake: bool = True) -> DataFrame:
    """Image resize stub: passes non-images through untouched; images get
    updated meta (and, in a real impl, a re-encoded payload). Vectorized:
    the meta struct's width/height children are rebuilt with a masked
    replace — no per-row dict rewriting."""

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            if not batch.num_rows:
                continue
            if not use_fake:
                raise NotImplementedError("real image resize not available")
            meta = batch.column("media_meta")
            is_img = pc.equal(batch.column("kind"), "image")
            fields = {f.name: meta.field(f.name) for f in meta.type}
            fields["width"] = pc.if_else(
                is_img, pa.scalar(width, pa.int32()), fields["width"])
            fields["height"] = pc.if_else(
                is_img, pa.scalar(height, pa.int32()), fields["height"])
            new_meta = pa.StructArray.from_arrays(
                [fields[f.name] for f in meta.type],
                names=[f.name for f in meta.type])
            yield pa.RecordBatch.from_arrays(
                [batch.column("media_id"), batch.column("kind"),
                 batch.column("payload"), new_meta],
                names=["media_id", "kind", "payload", "media_meta"])

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
