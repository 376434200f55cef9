"""Incremental (streaming) encode: new sequence files -> encoded blocks.

Structured Streaming file source + ``foreachBatch``: each micro-batch runs
the same batch encode operator and lands in an epoch=<id> partition with
dynamic overwrite, so a replayed micro-batch replaces its own output —
together with the checkpoint offset log that makes the observable effect
exactly-once (a blind append would be at-least-once). This is
the "resumable ingestion" face of the engine — the reference has no
streaming at all (single-shot binaries, SURVEY.md §2.7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators import encode as enc

SEQ_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def stream_encode(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    chunk_size: int = enc.DEFAULT_CHUNK,
    max_files_per_trigger: int = 8,
):
    """Start the incremental encode stream; returns the StreamingQuery.

    Call ``q.processAllAvailable(); q.stop()`` for a synchronous drain
    (tests / backfills) or let it run with a trigger for tailing.
    """
    checkpoint = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    src = (
        spark.readStream.schema(SEQ_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        # idempotent per epoch: a replayed micro-batch (failure between
        # the sink write and the checkpoint commit) dynamically OVERWRITES
        # its own epoch partition instead of appending duplicates — a
        # blind append would only be at-least-once
        encoded = enc.encode_tokens(batch_df, chunk_size=chunk_size) \
            .withColumn("epoch", F.lit(int(epoch_id)))
        enc.write_encoded(encoded, os.path.join(out_dir, "data"),
                          mode="overwrite", partition_by="epoch",
                          partitionOverwriteMode="dynamic")

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
