"""Encode operator: tokens -> codec blocks, as a vectorized Arrow map.

Spark-first layout of the reference's encode path (`js2pq`,
/root/reference/src/bin/js2pq/main.rs:46-131): where the reference reads one
whole file into one RecordBatch single-threaded, here Arrow batches stream
through ``mapInArrow`` tasks; Catalyst handles scan/pruning, the kernels
(functions/kernels.py) do the per-block compression, and the Parquet/ZSTD
sink provides the general-purpose layer (the reference's
`Compression::ZSTD(3)`, main.rs:91).

Skew handling (new-engine requirement, no reference analog): long-tail
documents are split into fixed-size chunks *before* encoding with
JVM-side `slice`/`posexplode`, so no single Python batch ever holds a
pathological row; chunks re-assemble at decode via (doc_id, chunk_idx).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels, selector

DEFAULT_CHUNK = 16384          # tokens per encoded block for skew-split rows
DEFAULT_SALT_BUCKETS = 1024    # salt space for the repartition key

META_FIELDS = [
    ("n_tok", pa.int32()),
    ("min_val", pa.int64()),
    ("max_val", pa.int64()),
    ("n_unique", pa.int32()),
    ("n_runs", pa.int32()),
    ("bit_width", pa.int32()),
    ("dict_size", pa.int32()),
    ("input_bytes", pa.int64()),
    ("output_bytes", pa.int64()),
]

ENCODED_ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("source", pa.string()),
        pa.field("chunk_idx", pa.int32()),
        pa.field("n_chunks", pa.int32()),
        pa.field("codec", pa.string()),
        pa.field("block", pa.binary()),
        pa.field("meta", pa.struct(META_FIELDS)),
    ]
)

ENCODED_DDL = (
    "doc_id string, source string, chunk_idx int, n_chunks int, codec string, "
    "block binary, meta struct<n_tok:int, min_val:bigint, max_val:bigint, "
    "n_unique:int, n_runs:int, bit_width:int, dict_size:int, "
    "input_bytes:bigint, output_bytes:bigint>"
)


def list_to_numpy(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """ListArray -> (int32 values, int64 row offsets), zero-copy where possible."""
    if arr.null_count:
        raise ValueError("tokens column must not contain null rows")
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(pa.int32()))
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    if values.dtype != np.dtype("<i4"):
        values = kernels.as_int32(values)
    return values, offsets


def _split_offsets(offsets: np.ndarray, chunk_size: int):
    """Refine a list-offsets array so no row exceeds chunk_size — the
    zero-copy twin of split_skew: the values buffer is untouched, chunks
    are adjacent slices, so the refined array is itself a valid offsets
    array. Returns (new_offsets, parent row index per chunk, chunk_idx,
    n_chunks per chunk row)."""
    lens = np.diff(offsets)
    n_chunks = np.maximum(-(-lens // chunk_size), 1)
    m = int(n_chunks.sum())
    row_rep = np.repeat(np.arange(lens.size), n_chunks)
    pref = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
    chunk_idx = (np.arange(m) - np.repeat(pref, n_chunks)).astype(np.int64)
    starts_out = offsets[:-1][row_rep] + chunk_idx * chunk_size
    new_offsets = np.concatenate((starts_out, offsets[-1:]))
    n_chunks_out = np.repeat(n_chunks, n_chunks)
    return new_offsets, row_rep, chunk_idx.astype(np.int32), \
        n_chunks_out.astype(np.int32)


def encode_arrow_batch(batch: pa.RecordBatch, enable_fsst: bool = True,
                       fsst_min_ratio: float = 3.0,
                       chunk_size: int | None = None) -> pa.RecordBatch:
    """Encode one Arrow batch.

    Two input shapes:
    - pre-chunked (doc_id, source, chunk_idx, n_chunks, tokens) — the
      JVM split_skew path; chunk_size=None.
    - raw (doc_id, source, tokens) with chunk_size set — the skew split
      happens HERE as pure offsets arithmetic (_split_offsets): no JVM
      Generate copy, no values movement at all.

    Fully batch-vectorized (functions/batch_encode.py): segmented stats +
    group packing; no per-row Python in the hot path. fsst_min_ratio tunes
    the FSST trial gate (3.0 = throughput-first default; 2.0 admits
    Zipfian token blocks, see functions/batch_encode.py).
    """
    import pyarrow.compute as pc

    from ..functions import batch_encode

    values, offsets = list_to_numpy(batch.column("tokens"))
    if chunk_size is None:
        n = batch.num_rows
        doc_id_arr = batch.column("doc_id")
        source_arr = batch.column("source")
        chunk_idx_arr = batch.column("chunk_idx")
        n_chunks_arr = batch.column("n_chunks")
    else:
        offsets, row_rep, chunk_idx, n_chunks_out = _split_offsets(
            offsets, chunk_size)
        n = chunk_idx.size
        take = pa.array(row_rep, type=pa.int64())
        doc_id_arr = pc.take(batch.column("doc_id"), take)
        source_arr = pc.take(batch.column("source"), take)
        chunk_idx_arr = pa.array(chunk_idx, type=pa.int32())
        n_chunks_arr = pa.array(n_chunks_out, type=pa.int32())

    data, blob_offsets, codec_ids, s, aux = batch_encode.encode_batch_columnar(
        values, offsets, enable_fsst=enable_fsst,
        fsst_min_ratio=fsst_min_ratio)
    if blob_offsets[-1] > 2**31 - 1:  # Arrow binary offsets are int32
        raise ValueError("encoded batch exceeds 2GiB; lower Arrow batch size")
    # zero-copy: one buffer + offsets, no per-row bytes objects
    blocks = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(blob_offsets.astype(np.int32)),
         pa.py_buffer(data)])
    names = pa.array([kernels.CODEC_NAMES[i] for i in range(len(kernels.CODEC_NAMES))],
                     type=pa.string())
    codecs = pc.take(names, pa.array(codec_ids, type=pa.int32()))
    dict_sizes = aux["dict_size"]
    meta_cols = {
        "n_tok": s["n_tok"],
        "min_val": s["min"],
        "max_val": s["max"],
        # exact cardinality is only computed where the dict codec ran;
        # everywhere else it is honestly NULL (a 0 would be a lie the
        # lineage consumers can't distinguish from "empty")
        "n_unique": pa.array(dict_sizes, type=pa.int32(),
                             mask=dict_sizes == 0),
        "n_runs": s["n_runs"],
        "bit_width": aux["bw"],
        "dict_size": dict_sizes,
        "input_bytes": 4 * s["n_tok"],
        "output_bytes": aux["blob_bytes"],
    }

    meta = pa.StructArray.from_arrays(
        [meta_cols[name] if isinstance(meta_cols[name], pa.Array)
         else pa.array(meta_cols[name], type=typ)
         for name, typ in META_FIELDS],
        fields=[pa.field(name, typ) for name, typ in META_FIELDS],
    )
    return pa.RecordBatch.from_arrays(
        [
            doc_id_arr,
            source_arr,
            chunk_idx_arr,
            n_chunks_arr,
            codecs,
            blocks,
            meta,
        ],
        schema=ENCODED_ARROW_SCHEMA,
    )


# Writer-config fidelity with the reference sink (js2pq/main.rs:85-117):
# E7 writer version PARQUET_2_0 ("parquet.writer.version" v2 -> v2 data
# pages, DELTA_* / RLE_DICTIONARY encodings); E5/E6 statistics control —
# the reference turns stats down because they buy "not much benefit" on
# its data; here the high-entropy `block` binary column gets per-column
# opt-out (footer bytes saved, nothing can prune on codec blobs anyway)
# while doc_id/source/chunk columns keep stats for scan pruning.
# skip_arrow_metadata (main.rs:115-117) has no Spark analog: parquet-mr
# never writes an Arrow schema blob in the first place.
ENCODED_WRITE_OPTIONS = {
    "parquet.writer.version": "v2",
    "parquet.column.statistics.enabled#block": "false",
}

# E5 statistics-granularity modes, mirroring the reference's CLI enum
# None/Chunk/Page (js2pq/main.rs:18-26 -> arrow-rs EnabledStatistics,
# applied :85-97). parquet-mr equivalences (probed, footer-verified):
# - "page"  (default): chunk stats + page-level column index — full.
# - "none": parquet.column.statistics.enabled=false drops BOTH the chunk
#   stats and the column index.
# - "chunk": parquet-mr has no switch that drops only the column index,
#   so pages are coalesced toward one per column chunk: the row-count
#   limit is lifted entirely and the page size raised to 8 MiB (typical
#   column chunks compress far below that). page.size must stay MODEST:
#   parquet-mr PREALLOCATES a compressor buffer of page.size per task
#   (CodecFactory$HeapBytesCompressor), so a huge value OOMs concurrent
#   writers — found by an OOM under 16 parallel tasks at 1 GiB.
STATISTICS_MODES = {
    "page": {},
    "chunk": {
        "parquet.page.row.count.limit": str(1 << 30),
        "parquet.page.size": str(8 << 20),
    },
    "none": {"parquet.column.statistics.enabled": "false"},
}


def write_encoded(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: str | list[str] | None = None,
                  statistics: str = "page",
                  **extra_options) -> None:
    """Parquet sink for the encoded table with reference-config fidelity.

    statistics: "none" | "chunk" | "page" — the reference's statistics
    granularity enum (see STATISTICS_MODES for the parquet-mr mapping).
    """
    if statistics not in STATISTICS_MODES:
        raise ValueError(
            f"statistics must be one of {sorted(STATISTICS_MODES)}, "
            f"got {statistics!r}")
    w = df.write.mode(mode)
    merged = {**ENCODED_WRITE_OPTIONS,
              **STATISTICS_MODES[statistics], **extra_options}
    for k, v in merged.items():
        w = w.option(k, v)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        w = w.partitionBy(*cols)
    w.parquet(path)


def write_encoded_bucketed(df: DataFrame, table: str, path: str,
                           n_buckets: int = 64,
                           bucket_col: str = "doc_id",
                           statistics: str = "page",
                           **extra_options) -> None:
    """Bucketed + sorted parquet table for CO-LOCATED joins.

    The encoded table's dominant consumers join it back on `doc_id`
    (verify-vs-source, dedup apply, reassembly audits). Writing both
    sides with `bucketBy(n, doc_id).sortBy(doc_id)` lets Spark plan those
    joins with ZERO exchange and zero sort — each task zips matching
    buckets — which at 10^12 rows removes the single largest shuffle in
    the verify path. Bucket count must match across the joined tables.
    Registered via saveAsTable (bucket metadata lives in the catalog);
    `path` makes it an external table so the files outlive the session.
    """
    if statistics not in STATISTICS_MODES:
        raise ValueError(
            f"statistics must be one of {sorted(STATISTICS_MODES)}, "
            f"got {statistics!r}")
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
         .option("path", path))
    merged = {**ENCODED_WRITE_OPTIONS,
              **STATISTICS_MODES[statistics], **extra_options}
    for k, v in merged.items():
        w = w.option(k, v)
    w.saveAsTable(table)


def split_skew(df: DataFrame, chunk_size: int = DEFAULT_CHUNK,
               passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Chunk long-tail documents JVM-side; output one row per chunk.

    Single scan: a filter-union formulation reads the input twice (measured
    ~13% of encode wall time even with zero long rows), so instead every row
    goes through one conditional posexplode — short rows (the overwhelming
    majority) explode a 1-element array (one JVM-side copy, no slicing) and
    keep chunk_idx=0, n_chunks=1.

    `passthrough` names extra columns to carry through unchanged (each
    chunk row repeats its document's value) — e.g. the file-scope
    pipeline's bucket column.
    """
    # NULL n_tok would otherwise flow through when()'s otherwise-branch with
    # greatest(1, NULL)=1 and reach the Arrow encoder with possibly-NULL
    # tokens; recompute it from the array so the behavior is intentional.
    n_tok = F.coalesce(F.col("n_tok"), F.size("tokens"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil(n_tok / F.lit(chunk_size))
    ).cast("int")
    chunks = F.when(
        n_tok <= chunk_size, F.array(F.col("tokens"))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.slice(F.col("tokens"), c * chunk_size + 1, chunk_size),
        )
    )
    extra = list(passthrough)
    return (
        df.select("doc_id", "source", n_chunks.alias("n_chunks"),
                  *extra,
                  F.posexplode(chunks).alias("chunk_idx", "tokens"))
        .select("doc_id", "source", "chunk_idx", "n_chunks", *extra,
                "tokens")
    )


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Deterministic salted repartition on (source, hash(doc_id), chunk_idx).

    The salt is derived from the data (xxhash64), never from randomness, so
    re-runs land identical rows in identical buckets — required for the
    resumable manifests (plans/pipeline.py).
    """
    salt = F.pmod(
        F.xxhash64(F.col("source"), F.col("doc_id"), F.col("chunk_idx")),
        F.lit(salt_buckets),
    )
    return df.repartition(num_partitions, salt)


def encode_tokens(df: DataFrame, chunk_size: int = DEFAULT_CHUNK,
                  num_partitions: int | None = None,
                  enable_fsst: bool = True,
                  fsst_min_ratio: float = 3.0,
                  mapper_split: bool | None = None) -> DataFrame:
    """Full encode operator: skew split -> [salted repartition] -> encode.

    Input:  (doc_id string, tokens array<int>, n_tok int, source string)
    Output: ENCODED_DDL rows, one per (doc_id, chunk_idx).

    Split placement: by default the skew split runs INSIDE the Arrow
    mapper as offsets arithmetic (zero data copy — measured ~18% of the
    map-only job was the JVM Generate/posexplode copy). When
    num_partitions is set the split must happen JVM-side instead, so the
    salted repartition can balance chunk rows across the shuffle
    (mapper_split=False forces the JVM path explicitly). Arrow batches
    stay bounded either way via spark.sql.execution.arrow.maxBytesPerBatch;
    the mapper path additionally requires single documents to fit one
    Arrow row (< 2^31 tokens) — true by construction for training
    sequences, and the JVM path remains available for anything wilder.
    """
    if mapper_split is None:
        mapper_split = num_partitions is None
    if not mapper_split:
        chunked = split_skew(df, chunk_size)
        if num_partitions:
            chunked = salted_repartition(chunked, num_partitions)

        def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                if batch.num_rows:
                    yield encode_arrow_batch(batch, enable_fsst=enable_fsst,
                                             fsst_min_ratio=fsst_min_ratio)

        return chunked.mapInArrow(mapper, ENCODED_DDL)

    src = df.select(F.col("doc_id").cast("string").alias("doc_id"),
                    "source", "tokens")

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows:
                yield encode_arrow_batch(batch, enable_fsst=enable_fsst,
                                         fsst_min_ratio=fsst_min_ratio,
                                         chunk_size=chunk_size)

    return src.mapInArrow(mapper, ENCODED_DDL)
