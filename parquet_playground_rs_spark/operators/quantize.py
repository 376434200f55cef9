"""Embedding quantization: int8 affine codes for embedding columns.

At 10^12-sequence scale the embedding table dwarfs the token table
(768 x 4 bytes/row float32 vs ~1 byte/token after codecs), and the
standard storage answer is per-vector affine int8 quantization — the
same scheme faiss's ScalarQuantizer (QT_8bit) and the usual
recommendation-system feature stores use: code = round((v - vmin) /
scale) with scale = (vmax - vmin) / 255, reconstruction error bounded
by scale / 2 per element. No reference analog (the reference is a
token-codec benchmark); this is part of the new engine's
training-pipeline surface, like dedup/ANN.

Spark-first split, mirroring the token codecs' design:
- the CODES are pure JVM expressions (`transform` over the array —
  whole-stage codegen, zero Python, and exactly reproducible in DuckDB
  for the driver oracle);
- the PACKED bytes (1 byte/dim binary blob, the actual storage form)
  go through one vectorized mapInArrow kernel, like
  operators/encode.py's blocks.

Decode guarantee: dequantize(quantize(v)) differs from v by at most
scale/2 + eps per element (exact for constant vectors), and
pack/unpack of the codes is bit-exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<int>, vmin double, vmax double, dim int).

    code_i = floor((v_i - vmin) / scale + 0.5) clamped to [0, 255],
    scale = (vmax - vmin) / 255; constant vectors (scale 0) map to code
    0 everywhere. All JVM expressions — the plan is one Project over the
    scan, no shuffle, no Python.

    The vector is widened to float64 BEFORE any arithmetic: float32
    widening is exact, and doing every op in doubles makes the codes
    bit-reproducible across engines (the DuckDB oracle casts the same
    way) — mixed float/double evaluation orders could round a
    half-boundary differently."""
    vec = F.col(vec_col).cast("array<double>")
    vmin = F.array_min(vec)
    vmax = F.array_max(vec)
    scale = (vmax - vmin) / F.lit(255.0)
    code = F.transform(
        vec,
        lambda v: F.when(scale == 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(0),
                F.least(F.lit(255),
                        F.floor((v - vmin) / scale + F.lit(0.5))
                        .cast("int")))
        ).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        code.alias("codes"),
        vmin.cast("double").alias("vmin"),
        vmax.cast("double").alias("vmax"),
        F.size(vec).cast("int").alias("dim"),
    )


def dequantize_embeddings(q: DataFrame) -> DataFrame:
    """(vec_id, embedding array<double>): v_i ~= vmin + code_i * scale."""
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(255.0)
    return q.select(
        "vec_id",
        F.transform(
            F.col("codes"), lambda c: F.col("vmin") + c * scale
        ).alias("embedding"),
    )


def pack_codes(q: DataFrame, id_type: str | None = None) -> DataFrame:
    """codes array<int> -> one binary blob per vector (1 byte/dim) — the
    storage form. One vectorized mapInArrow kernel: the batch's code
    lists flatten to a uint8 arena and reslice as binary, no per-row
    Python. NULL rows or NULL elements raise (a silent empty/garbage
    blob is not a representation of NULL; quantize NULL embeddings out
    before packing)."""
    id_type = id_type or q.schema["vec_id"].dataType.simpleString()

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not batch.num_rows:
                continue
            col = batch.column("codes")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            values = col.flatten()
            if col.null_count or values.null_count:
                raise ValueError(
                    "pack_codes: NULL codes rows/elements are not "
                    "packable — filter or impute before packing")
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32,
                                 count=col.offset + len(col) + 1)[col.offset:]
            flat = values.to_numpy(zero_copy_only=False)
            if flat.size and (flat.min() < 0 or flat.max() > 255):
                raise ValueError("codes out of uint8 range")
            arena = flat.astype(np.uint8)
            blob = pa.BinaryArray.from_buffers(
                pa.binary(), len(col),
                [None, pa.py_buffer((offs - offs[0]).astype(np.int32)),
                 pa.py_buffer(arena)])
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"), blob, batch.column("vmin"),
                 batch.column("vmax"), batch.column("dim")],
                names=["vec_id", "q", "vmin", "vmax", "dim"])

    ddl = f"vec_id {id_type}, q binary, vmin double, vmax double, dim int"
    return q.select("vec_id", "codes", "vmin", "vmax", "dim") \
        .mapInArrow(mapper, ddl)


def unpack_codes(packed: DataFrame) -> DataFrame:
    """binary blob -> codes array<int> (bit-exact inverse of pack_codes)."""

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not batch.num_rows:
                continue
            col = batch.column("q")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.null_count:
                raise ValueError("unpack_codes: NULL blobs are not "
                                 "decodable")
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32,
                                 count=col.offset + len(col) + 1)[col.offset:]
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            start = offs[0]
            vals = data[start:offs[-1]].astype(np.int32)
            codes = pa.ListArray.from_arrays(
                pa.array(offs - start, type=pa.int32()),
                pa.array(vals, type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"), codes, batch.column("vmin"),
                 batch.column("vmax"), batch.column("dim")],
                names=["vec_id", "codes", "vmin", "vmax", "dim"])

    id_type = packed.schema["vec_id"].dataType.simpleString()
    ddl = (f"vec_id {id_type}, codes array<int>, vmin double, "
           f"vmax double, dim int")
    return packed.select("vec_id", "q", "vmin", "vmax", "dim") \
        .mapInArrow(mapper, ddl)
