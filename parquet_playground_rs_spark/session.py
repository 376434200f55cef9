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
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
