"""Reference-shaped histogram table: generator + JSON source.

Capability parity with the reference's input model (`/root/reference/
src/model.rs:1-18`): rows of (tags: array<string>, tag_values:
array<string>, ts: array<long>, sums_double: array<double> nullable
elements, sums_long: array<long> nullable elements, count: array<long>),
i.e. variable numeric arrays + a sparse dynamic string-attribute set.

- `histograms_df` mirrors the synthetic generator
  (`scripts/gen_synthetic_data.py:172-247`: N series x M tags x 60
  cumulative points, seeded) as deterministic Spark expressions.
- `read_histograms_json` is the S1-S3 path (`src/bin/js2pq/main.rs:141-155`):
  explicit schema (the serde-struct analog), transparent .gz (built into
  Spark's text/json sources), distributed instead of whole-file-in-memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

HISTOGRAM_SCHEMA = T.StructType([
    T.StructField("tags", T.ArrayType(T.StringType()), False),
    T.StructField("tagValues", T.ArrayType(T.StringType()), False),
    T.StructField("ts", T.ArrayType(T.LongType()), False),
    T.StructField("sumsDouble", T.ArrayType(T.DoubleType(), True), True),
    T.StructField("sumsLong", T.ArrayType(T.LongType(), True), True),
    T.StructField("count", T.ArrayType(T.LongType()), False),
])

TAG_POOL = ["host", "region", "service", "env", "dc", "team", "tier",
            "az", "pod", "version"]


def _h(seed: int, *cols: Column) -> Column:
    return F.shiftrightunsigned(F.xxhash64(*cols, F.lit(seed)), 1)


def histograms_df(spark: SparkSession, n_series: int, n_tags: int = 5,
                  n_points: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic histogram table (reference generator shape)."""
    df = spark.range(n_series)
    i = F.col("id")
    n_tags = min(n_tags, len(TAG_POOL))
    tags = F.array(*[F.lit(t) for t in TAG_POOL[:n_tags]])
    tag_values = F.transform(
        tags, lambda t: F.concat(t, F.lit("_v"),
                                 (_h(seed + 1, i, t) % 8).cast("string"))
    )
    pts = F.sequence(F.lit(0), F.lit(n_points - 1))
    # 2020-01-01 ms epoch like the reference; per-series start offset
    base_ts = F.lit(1577836800000) + (_h(seed + 7, i) % 86400).cast("long") * 1000
    ts = F.transform(pts, lambda p: base_ts + p.cast("long") * 10000)
    # cumulative (monotone) series, the reference's defining shape
    count = F.transform(pts, lambda p: (p + 1).cast("long") * (_h(seed + 2, i) % 50 + 1))
    sums_long = F.transform(
        pts,
        lambda p: F.when(_h(seed + 3, i, p) % 10 == 0, F.lit(None).cast("long"))
        .otherwise((p + 1).cast("long") * (_h(seed + 4, i) % 1000)),
    )
    sums_double = F.transform(
        pts,
        lambda p: F.when(_h(seed + 5, i, p) % 10 == 0, F.lit(None).cast("double"))
        .otherwise(((p + 1) * (_h(seed + 6, i) % 10000)).cast("double") / 100.0),
    )
    return df.select(
        tags.alias("tags"),
        tag_values.alias("tagValues"),
        ts.alias("ts"),
        sums_double.alias("sumsDouble"),
        sums_long.alias("sumsLong"),
        count.alias("count"),
    )


def _hm(seed: int, *cols: Column) -> Column:
    """Oracle-reproducible hash: first 8 md5-hex chars of
    'part:part:...:seed' as an integer in [0, 2^32). Both Spark and DuckDB
    compute md5 of the same string identically, so tables built from this
    hash can be recomputed by the round driver's oracle — unlike xxhash64,
    which DuckDB lacks."""
    parts = [c.cast("string") for c in cols] + [F.lit(str(seed))]
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8), 16, 10
    ).cast("long")


def histograms_df_oracle(spark: SparkSession, n_series: int, n_tags: int = 5,
                         n_points: int = 60, seed: int = 42) -> DataFrame:
    """Same shape as histograms_df, but every derived value comes from the
    md5-based `_hm` so a DuckDB oracle can recompute the aggregates
    exactly (used by the histogram_touch_sum / histogram_pivot driver
    queries)."""
    df = spark.range(n_series)
    i = F.col("id")
    n_tags = min(n_tags, len(TAG_POOL))
    tags = F.array(*[F.lit(t) for t in TAG_POOL[:n_tags]])
    tag_values = F.transform(
        tags, lambda t: F.concat(t, F.lit("_v"),
                                 (_hm(seed + 1, i, t) % 8).cast("string"))
    )
    pts = F.sequence(F.lit(0), F.lit(n_points - 1))
    base_ts = F.lit(1577836800000) + (_hm(seed + 7, i) % 86400).cast("long") * 1000
    ts = F.transform(pts, lambda p: base_ts + p.cast("long") * 10000)
    count = F.transform(pts, lambda p: (p + 1).cast("long") * (_hm(seed + 2, i) % 50 + 1))
    sums_long = F.transform(
        pts,
        lambda p: F.when(_hm(seed + 3, i, p) % 10 == 0, F.lit(None).cast("long"))
        .otherwise((p + 1).cast("long") * (_hm(seed + 4, i) % 1000)),
    )
    sums_double = F.transform(
        pts,
        lambda p: F.when(_hm(seed + 5, i, p) % 10 == 0, F.lit(None).cast("double"))
        .otherwise(((p + 1) * (_hm(seed + 6, i) % 10000)).cast("double") / 100.0),
    )
    return df.select(
        tags.alias("tags"),
        tag_values.alias("tagValues"),
        ts.alias("ts"),
        sums_double.alias("sumsDouble"),
        sums_long.alias("sumsLong"),
        count.alias("count"),
    )


def read_histograms_json(spark: SparkSession, path: str,
                         mode: str = "PERMISSIVE") -> DataFrame:
    """JSON source with explicit schema; .json / .json.gz transparently.

    mode="FAILFAST" matches the reference's strict serde parse (bad line ->
    job error); the PERMISSIVE default turns bad lines into all-null rows,
    the sane choice at 100 TB — callers filtering `tags IS NOT NULL` get
    the reference-equivalent row set.
    """
    return spark.read.schema(HISTOGRAM_SCHEMA).option("mode", mode).json(path)


def write_histograms_json(df: DataFrame, path: str, gzip: bool = True) -> None:
    w = df.write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)
