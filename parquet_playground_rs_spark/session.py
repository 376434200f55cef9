"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "parquet_playground_rs_spark", cores: int | None = None,
              shuffle_partitions: int | None = None, driver_mem: str = "12g",
              ui: bool = False) -> SparkSession:
    """Local-mode session. `cores=None` -> local[*].

    The confs mirror what a cluster submit would set: AQE on, Arrow
    exchange on (the encode/decode operators are mapInArrow), shuffle
    partitions sized to cores rather than the 200 default.
    """
    cores_env = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and cores_env:
        cores = int(cores_env)
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (cores if cores else os.cpu_count() or 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE may rewrite a planned shuffle join to broadcast when the
        # RUNTIME-materialized side is below this bound (the static
        # estimate-based threshold stays at its conservative default).
        # Decided from actual sizes, this is scale-adaptive by
        # construction: at corpus scale the sides exceed the bound and
        # the plan stays a shuffle join. NOTE (round-9 A/B, interleaved):
        # on the bench queries this moved nothing outside host noise —
        # the verify join is FULL OUTER, which AQE cannot convert — so
        # this is a sane-default setting, not a measured win; kept
        # env-overridable.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_AQE_BHJ", "64m"))
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # task-side file commit (v2): avoids the driver-serial rename tail,
        # which otherwise caps scaling as executor count grows
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    # Local-filesystem hardening (round 9, measured with driver thread
    # dumps): WITHOUT the native-hadoop library (absent in this sandbox,
    # and in most slim containers), Hadoop's local FS falls back to
    # SHELL-EXEC for metadata ops — FileContext.rename runs `readlink`
    # and every checksummed create runs `chmod` via ProcessBuilder. The
    # streaming state store commits one delta file per partition per
    # micro-batch through exactly that path: at 32 state partitions the
    # aggregate store-commit time measured 10.3 s/batch, dropping to
    # 0.3 s/batch with the FileSystem-based checkpoint manager (java.io
    # renames, no exec) — a 30x on the dominant per-batch cost. These
    # settings bind to the file:// scheme / local checkpoints only; on a
    # cluster (HDFS/object stores) the checkpoint manager should stay
    # Spark's default, so each is env-overridable and applied only for
    # local masters.
    if master.startswith("local"):
        ckpt_mgr = os.environ.get(
            "SPARK_GRAFT_CHECKPOINT_MANAGER",
            "org.apache.spark.sql.execution.streaming.checkpointing."
            "FileSystemBasedCheckpointFileManager")
        if ckpt_mgr:
            b = b.config("spark.sql.streaming.checkpointFileManagerClass",
                         ckpt_mgr)
        # Spark 4.1 additionally writes a shadow ".checksum" file per
        # checkpoint file (corruption detection for remote stores);
        # on a local FS that doubles the exec-prone create/rename ops
        # per state commit for no durability gain.
        b = b.config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
                     os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
