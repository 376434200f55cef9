"""Deterministic distributed generator for the `sequences` input table.

Produces the BASELINE.json `input_hint` shape — ``(doc_id: string,
tokens: array<int32>, n_tok: int32, source: string)`` — at any row count,
entirely with JVM-side Spark SQL expressions: randomness is replaced by
``xxhash64(id, seed)`` so the table is bit-identical regardless of
parallelism, partition count, or re-runs (the determinism discipline of the
reference generator's fixed seed, /root/reference/scripts/
gen_synthetic_data.py:180, but distributed).

Row classes cover every codec's best/worst case plus the skew shapes
(FIXTURES.md F1): empty, singleton, constant, long runs, low-cardinality,
narrow range, monotone ramp, periodic motif, uniform random, extremes;
~2% of rows get a 20x long-tail n_tok (skew-split path) and `source` is
skewed 60/10/10/10/10 toward "web" (salted-repartition path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ["web", "code", "books", "wiki", "chat"]

I32_MIN = -(2**31)
I32_MAX = 2**31 - 1


def _h(seed: int, *cols: Column) -> Column:
    """Non-negative deterministic hash stream (logical shift avoids the
    abs(Long.MIN_VALUE) wrap)."""
    return F.shiftrightunsigned(F.xxhash64(*cols, F.lit(seed)), 1)


# bump when the generated DATA changes (distribution, schema, hashing):
# disk caches keyed on this (bench.py, scripts/bench_scaling.py) must not
# silently reuse stale rows after a generator edit
GEN_VERSION = 1


def sequences_df(spark: SparkSession, n_rows: int, seed: int = 42,
                 base_len: int = 64, len_span: int = 448,
                 partitions: int | None = None) -> DataFrame:
    """Build the deterministic sequences table with `n_rows` rows."""
    rng = spark.range(0, n_rows, numPartitions=partitions)
    i = F.col("id")

    # skewed source: 60% web, then 10% each -- exercises salting
    src_bucket = _h(seed + 1, i) % 10
    source = (
        F.when(src_bucket <= 5, F.lit("web"))
        .when(src_bucket == 6, F.lit("code"))
        .when(src_bucket == 7, F.lit("books"))
        .when(src_bucket == 8, F.lit("wiki"))
        .otherwise(F.lit("chat"))
    )

    cls = _h(seed + 2, i) % 100  # row class, weighted
    base = (_h(seed + 3, i) % len_span + base_len).cast("int")
    long_tail = (_h(seed + 4, i) % 100) < 2
    n_tok = (
        F.when(cls == 0, F.lit(0))
        .when(cls == 1, F.lit(1))
        .otherwise(F.when(long_tail, base * 20).otherwise(base))
    ).cast("int")

    step = (_h(seed + 5, i) % 37 + 1).cast("long")
    const_val = (_h(seed + 6, i) % 100000).cast("long")
    ramp_base = (_h(seed + 7, i) % 1000000).cast("long")

    def tok(ix: Column) -> Column:
        """Token value at position ix, by row class. All int32-safe."""
        eh = _h(seed + 8, i, ix)                     # per-element hash
        run_h = _h(seed + 9, i, F.floor(ix / F.lit(97)))
        return (
            F.when(cls < 12, const_val)                              # constant
            .when(cls < 27, (run_h % 5) * 17 + 3)                    # few long runs
            .when(cls < 47, eh % 16)                                 # low cardinality
            .when(cls < 62, F.lit(100000) + eh % 256)                # narrow range
            .when(cls < 82, ramp_base + ix * step + eh % step)       # monotone ramp
            .when(cls < 92, _h(seed + 10, i, ix % 8) % 100000)       # period-8 motif
            .when(cls < 98, eh % F.lit(2**32) + F.lit(I32_MIN))      # uniform random
            .otherwise(                                              # extremes
                F.when(ix % 4 == 0, F.lit(I32_MIN))
                .when(ix % 4 == 1, F.lit(I32_MAX))
                .when(ix % 4 == 2, F.lit(0))
                .otherwise(eh % 1000 - 500)
            )
        ).cast("int")

    tokens = F.when(
        n_tok == 0, F.array().cast("array<int>")
    ).otherwise(F.transform(F.sequence(F.lit(0), n_tok - 1), tok))

    return rng.select(
        F.format_string("doc_%012d", i).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )


def write_sequences(spark: SparkSession, n_rows: int, path: str,
                    seed: int = 42, partitions: int | None = None,
                    compression: str = "snappy") -> str:
    """Materialize the table as parquet (for bench reuse).

    Default snappy: measured on this box, 32 concurrent zstd-jni
    decompressors contend badly (5x run-to-run variance on the read+
    mapInArrow path), while snappy reads are stable. Engine *outputs*
    stay zstd — they are written once and the size target needs it.
    """
    df = sequences_df(spark, n_rows, seed=seed, partitions=partitions)
    df.write.mode("overwrite").option("compression", compression).parquet(path)
    return path
