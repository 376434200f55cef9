"""End-to-end resumable encode pipeline with per-bucket lineage manifests.

The reference is single-shot and non-resumable (one process, one in-memory
batch, /root/reference/src/bin/js2pq/main.rs:46-131). The north rule demands
restartable runs with per-partition lineage. Design:

- Work is keyed by a deterministic **bucket** = pmod(xxhash64(source,
  doc_id, chunk_idx), n_buckets). Buckets, not Spark partition ids, are the
  resume unit: they're a pure function of the data, so a restart at any
  parallelism reproduces the same buckets.
- Each completed bucket writes its encoded rows under
  ``out/data/bucket=<b>/`` (idempotent overwrite of that directory only)
  and appends one manifest JSON line under ``out/manifest/`` with lineage:
  row count, input/output bytes, per-codec histogram, checksum.
- Resume = read manifest, anti-join pending buckets, process only those.
- When commit granularity splits the work into G > 1 groups, the
  chunked+bucketed work list is **staged once** under
  ``out/staging/data/bucket=<b>/`` (a single source scan + one raw-bytes
  shuffle) and every commit group reads ONLY its bucket directories via
  partition pruning — G column-pruned re-scans of the source (round-4's
  2.35x-overhead design) become one scan + one re-read of 1/G each. The
  ``_STAGED.json`` marker makes the staging pass itself resumable and
  records the params it was built with; staging is deleted after the
  last bucket commits. At 100 TB from an object store this is the
  difference between paying the corpus scan once and paying it G times.

At cluster scale each "bucket commit" is one dynamic-partition-overwrite
write; buckets are the engine's unit of progress and audit, mirroring what
Iceberg snapshots would give (the sandbox has no Iceberg jars — the layout
keeps the same semantics; see SURVEY.md §7 stage 4).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import decode as dec
from ..operators import encode as enc

MANIFEST_SCHEMA = (
    "bucket int, status string, n_rows bigint, n_docs bigint, "
    "input_bytes bigint, output_bytes bigint, codec_hist string, "
    "block_crc bigint, wall_sec double, ts double"
)


def bucket_col(n_buckets: int):
    return F.pmod(
        F.xxhash64(F.col("source"), F.col("doc_id"), F.col("chunk_idx")),
        F.lit(n_buckets),
    ).cast("int")


def _manifest_dir(out: str) -> str:
    return os.path.join(out, "manifest")


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for `path` — same code serves file://, hdfs://,
    s3a:// (the manifest protocol must not assume a driver-local disk at
    cluster scale)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def read_manifest(spark: SparkSession, out: str) -> DataFrame:
    mdir = _manifest_dir(out)
    fs, jpath, _ = _hadoop_fs(spark, mdir)
    if not fs.exists(jpath):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return (
        spark.read.schema(MANIFEST_SCHEMA)
        .option("pathGlobFilter", "*.json")
        .json(mdir)
    )


def completed_buckets(spark: SparkSession, out: str) -> set[int]:
    m = read_manifest(spark, out)
    return {r["bucket"] for r in m.filter(F.col("status") == "done").collect()}


def _write_manifest_row(spark: SparkSession, out: str, row: dict) -> None:
    """Commit one bucket's manifest line: write tmp, then rename.

    Goes through the Hadoop FileSystem API so the identical code runs on
    file://, HDFS (atomic rename), and S3A (rename = copy+delete, but the
    manifest file is tiny and the bucket data write already succeeded —
    a crash between data and manifest just re-runs an idempotent bucket).
    """
    mdir = _manifest_dir(out)
    fs, mpath, jvm = _hadoop_fs(spark, mdir)
    try:
        fs.setWriteChecksum(False)  # no .crc sidecars on local FS
    except Exception:
        pass
    fs.mkdirs(mpath)
    Path = jvm.org.apache.hadoop.fs.Path
    final = Path(mdir, f"bucket-{row['bucket']:05d}.json")
    tmp = Path(mdir, f"bucket-{row['bucket']:05d}.json.tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray((json.dumps(row) + "\n").encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"manifest rename failed for bucket {row['bucket']}")


def _staging_dirs(out: str) -> tuple[str, str, str]:
    sdir = os.path.join(out, "staging")
    return sdir, os.path.join(sdir, "data"), os.path.join(sdir, "_STAGED.json")


def _write_small_file(spark: SparkSession, path: str, payload: str) -> None:
    """tmp-write + rename of one small control file (same FS protocol as
    the manifest rows)."""
    fs, jpath, jvm = _hadoop_fs(spark, path)
    try:
        fs.setWriteChecksum(False)
    except Exception:
        pass
    Path = jvm.org.apache.hadoop.fs.Path
    tmp = Path(path + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(payload.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    if not fs.rename(tmp, jpath):
        raise IOError(f"rename failed for {path}")


def _read_small_file(spark: SparkSession, path: str) -> str | None:
    fs, jpath, jvm = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # JVM-side drain: a py4j byte[] argument is passed by VALUE, so
        # the usual read(buf) loop can't see the bytes — commons-io (on
        # Spark's classpath) slurps the stream inside the JVM instead
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def drop_staging(spark: SparkSession, out: str) -> None:
    sdir, _, _ = _staging_dirs(out)
    fs, jpath, _ = _hadoop_fs(spark, sdir)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _ensure_staged(spark: SparkSession, chunked: DataFrame, out: str,
                   n_buckets: int, chunk_size: int,
                   files_per_bucket: int) -> DataFrame:
    """Write the chunked+bucketed work list ONCE under
    out/staging/data/bucket=<b>/, or reuse a finished staging from a
    previous (killed) run when its params match; returns a DataFrame over
    the staged files whose scans PRUNE to the requested buckets.

    The write rebalances on (bucket, salt) so each bucket directory gets
    ~files_per_bucket files — bounded file counts (not tasks x dirs) while
    keeping enough files per bucket that a small commit group's read still
    parallelizes across the executor cores. The salt is data-derived
    (xxhash64), never random: re-staging reproduces identical layout.
    """
    sdir, data_dir, marker = _staging_dirs(out)
    params = {"n_buckets": n_buckets, "chunk_size": chunk_size}
    existing = _read_small_file(spark, marker)
    if existing is not None:
        prev = json.loads(existing)
        if {k: prev.get(k) for k in params} == params:
            staged = spark.read.parquet(data_dir)
            return staged.withColumn("bucket", F.col("bucket").cast("int"))
        drop_staging(spark, out)  # params changed: stale staging is invalid
    salt = F.pmod(F.xxhash64(F.col("doc_id"), F.col("chunk_idx"), F.lit(13)),
                  F.lit(files_per_bucket))
    (chunked.repartition(F.col("bucket"), salt)
     .write.mode("overwrite").partitionBy("bucket").parquet(data_dir))
    _write_small_file(spark, marker, json.dumps(
        {**params, "files_per_bucket": files_per_bucket, "ts": time.time()}))
    staged = spark.read.parquet(data_dir)
    return staged.withColumn("bucket", F.col("bucket").cast("int"))


def run_encode_job(
    spark: SparkSession,
    source_df: DataFrame,
    out: str,
    n_buckets: int = 8,
    chunk_size: int = enc.DEFAULT_CHUNK,
    buckets_per_commit: int | None = None,
    fail_after_buckets: int | None = None,
    statistics: str = "page",
    concurrent_commits: int = 1,
    cache_input: bool = False,
    stage_input: bool | None = None,
) -> dict:
    """Encode `source_df` into `out`, resuming past completed buckets.

    `fail_after_buckets` injects a crash for the kill-and-resume test.
    `statistics` is the E5 granularity mode (none/chunk/page) forwarded to
    the parquet sink. `concurrent_commits` > 1 overlaps commit groups
    from driver threads: the groups are independent idempotent writes of
    DISJOINT (source, bucket) partitions (dynamic overwrite stages under
    per-job dirs, manifests are per-bucket files), so overlapping them
    hides the fixed per-commit costs (job scheduling, the manifest
    aggregation, the write commit walk) that otherwise serialize —
    commit granularity stops taxing wall-clock. Incompatible with
    `fail_after_buckets` (the kill test needs deterministic ordering).

    `stage_input` (default auto = ON whenever commit granularity makes
    more than one group and `cache_input` is off) writes the
    chunked+bucketed work list ONCE under out/staging partitioned by
    bucket, and every commit group reads only its bucket dirs via
    partition pruning — the round-4 design's G full source re-scans
    become 1 scan + 1 write + a 1/G-pruned read per group. Staging is
    itself resumable (the _STAGED.json marker) and removed after the
    final bucket commits. Pass False to force the legacy re-scan plan.

    `cache_input` persists the chunked+bucketed frame (DISK_ONLY) so the
    G commit groups read the cache instead of re-scanning the source —
    the in-session alternative to `stage_input` (which it overrides when
    explicitly enabled): the persist dies with the session, so a killed
    run resumes onto G re-scans, while staged files survive the restart.
    Returns summary stats for the run.
    """
    done = completed_buckets(spark, out)
    pending = [b for b in range(n_buckets) if b not in done]
    summary = {"resumed_buckets": len(done), "processed_buckets": 0,
               "n_rows": 0, "input_bytes": 0, "output_bytes": 0}
    if not pending:
        return summary

    chunked = enc.split_skew(source_df, chunk_size)
    chunked = chunked.withColumn("bucket", bucket_col(n_buckets))
    # one pass per commit-group of buckets: each group is an independent,
    # idempotent write whose manifest rows land only after success
    group = buckets_per_commit or len(pending)
    persisted_input = None
    staged = False
    if cache_input and group < len(pending):
        from pyspark import StorageLevel

        persisted_input = chunked.persist(StorageLevel.DISK_ONLY)
        chunked = persisted_input
    elif (stage_input if stage_input is not None
          else group < len(pending)) and group < len(pending):
        # files per bucket dir sized so ONE commit group's read still
        # fans out over every core: group buckets x files >= parallelism
        fpb = max(1, -(-spark.sparkContext.defaultParallelism // group))
        chunked = _ensure_staged(spark, chunked, out, n_buckets,
                                 chunk_size, files_per_bucket=fpb)
        staged = True
    groups = [pending[gi: gi + group] for gi in range(0, len(pending), group)]
    try:
        if concurrent_commits > 1 and len(groups) > 1:
            if fail_after_buckets is not None:
                raise ValueError(
                    "fail_after_buckets needs deterministic group order; "
                    "use concurrent_commits=1")
            import threading
            from concurrent.futures import ThreadPoolExecutor

            lock = threading.Lock()
            with ThreadPoolExecutor(max_workers=concurrent_commits) as ex:
                futs = [ex.submit(_process_commit_group, spark, chunked,
                                  batch, out, statistics, summary, lock)
                        for batch in groups]
                for f in futs:
                    f.result()  # propagate the first failure
        else:
            for batch in groups:
                if fail_after_buckets is not None and \
                        summary["processed_buckets"] >= fail_after_buckets:
                    raise RuntimeError("injected failure for resume test")
                _process_commit_group(spark, chunked, batch, out,
                                      statistics, summary, None)
    finally:
        if persisted_input is not None:
            persisted_input.unpersist()
    if staged:
        # every bucket is now committed: the staged work list has served
        # its purpose (a crash before this point leaves it for the resume)
        drop_staging(spark, out)
    return summary


def _process_commit_group(spark, chunked, batch_buckets, out, statistics,
                          summary, lock) -> None:
    t0 = time.time()
    part = chunked.filter(F.col("bucket").isin(batch_buckets))
    # rebalance on the partition columns BEFORE the partitioned write:
    # without it every write task opens a file in every (source,
    # bucket) dir it touches — tasks x dirs small files (measured
    # 1274/group at bench scale, ~30 ms commit cost each). Hashing
    # each combo to one task yields one file per dir per group; the
    # price is one shuffle of the group's COMPRESSED blocks (~0.5x
    # input bytes), the standard trade for dynamic-partitioned sinks.
    encoded = (
        _encode_with_bucket(part)
        .repartition(F.col("source"), F.col("bucket"))
        .persist()
    )
    try:
        # ONE aggregation job for the whole manifest payload: the codec
        # histogram rides as conditional sums over the (static, small)
        # codec vocabulary instead of a second groupBy job per commit
        from ..functions.kernels import CODEC_IDS

        codec_names = sorted(CODEC_IDS)
        stats = encoded.groupBy("bucket").agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("meta.input_bytes").alias("input_bytes"),
            F.sum("meta.output_bytes").alias("output_bytes"),
            F.sum(F.crc32(F.col("block"))).alias("block_crc"),
            *[F.sum(F.when(F.col("codec") == c, 1).otherwise(0))
              .alias(f"_codec_{c}") for c in codec_names],
        )
        # Iceberg-style two-level layout source=<v>/bucket=<k> (SURVEY §7
        # stage 4): source gives partition pruning for consumers, bucket
        # stays the idempotent resume/commit unit
        enc.write_encoded(
            encoded, os.path.join(out, "data"),
            partition_by=["source", "bucket"],
            statistics=statistics,
            partitionOverwriteMode="dynamic",
        )
        wall = time.time() - t0
        stat_rows = {r["bucket"]: r for r in stats.collect()}
        hist_rows = {
            b: {c: int(r[f"_codec_{c}"]) for c in codec_names
                if int(r[f"_codec_{c}"])}
            for b, r in stat_rows.items()
        }
    finally:
        # released even when the write or collect fails: a failed commit
        # group must not pin its cached blocks for the session lifetime
        # (up to concurrent_commits leaked caches otherwise)
        encoded.unpersist()
    for b in batch_buckets:
        r = stat_rows.get(b)
        row = {
            "bucket": b,
            "status": "done",
            "n_rows": int(r["n_rows"]) if r else 0,
            "n_docs": int(r["n_docs"]) if r else 0,
            "input_bytes": int(r["input_bytes"] or 0) if r else 0,
            "output_bytes": int(r["output_bytes"] or 0) if r else 0,
            "codec_hist": json.dumps(hist_rows.get(b, {})),
            "block_crc": int(r["block_crc"] or 0) if r else 0,
            "wall_sec": wall / len(batch_buckets),
            "ts": time.time(),
        }
        _write_manifest_row(spark, out, row)
        if lock is not None:
            with lock:
                _tally(summary, row)
        else:
            _tally(summary, row)


def _tally(summary: dict, row: dict) -> None:
    summary["processed_buckets"] += 1
    summary["n_rows"] += row["n_rows"]
    summary["input_bytes"] += row["input_bytes"]
    summary["output_bytes"] += row["output_bytes"]


def _encode_with_bucket(chunked_with_bucket: DataFrame) -> DataFrame:
    """Encode while carrying the bucket column through the Arrow map."""
    import pyarrow as pa

    def mapper(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            out = enc.encode_arrow_batch(batch)
            yield out.append_column(
                "bucket", batch.column("bucket").cast(pa.int32())
            )

    return chunked_with_bucket.mapInArrow(mapper, enc.ENCODED_DDL + ", bucket int")


def read_encoded(spark: SparkSession, out: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out, "data"))


def verify_job(spark: SparkSession, source_df: DataFrame, out: str) -> dict:
    """Decode everything under `out` and compare with the source table.

    The decode cache (if decode_tokens materialized one) is released
    before returning — composed jobs must not leak cached blocks into the
    session (round-3 cache-lifecycle finding)."""
    with dec.decoded_tokens(read_encoded(spark, out)) as decoded:
        row = dec.verify_roundtrip(source_df, decoded).first()
    return {k: row[k] for k in ("n_source", "n_decoded", "n_joined", "n_mismatch")}
