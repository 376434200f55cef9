"""Time-series joins Spark lacks as primitives: as-of join and a
scale-safe bucketed range join (both named by the engine charter;
DuckDB ships ASOF JOIN natively, which the oracle checks against).

As-of join: for every left row, the most recent right row at-or-before
its timestamp, per key.

Implementation is the scalable union trick, NOT a range join:

    union(left tagged 0, right tagged 1)
      -> one hash shuffle on the key
      -> per-key window ordered by (ts, right-first-on-ties)
      -> last(right value, ignorenulls) carried forward
      -> keep left rows

Cost: ONE shuffle of (key, ts, payload), no row multiplication — an
inequality-join formulation would explode to |L|x|R| per key before
filtering, which AQE cannot fix. Ties (right.ts == left.ts) match, as in
DuckDB's ASOF semantics (l.ts >= r.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_buckets(left: DataFrame, right: DataFrame,
                       point: str = "ts", start: str = "start",
                       end: str = "end", by: str | None = None,
                       bucket_width: int = 3600,
                       how: str = "inner") -> DataFrame:
    """Point-in-interval range join at scale: left.point in
    [right.start, right.end] (inclusive), optionally per key `by`.

    Catalyst executes a bare inequality join as BroadcastNestedLoopJoin
    (or a cartesian) — O(|L| x |R|) compares. This is the standard
    bucketed rewrite instead: intervals explode into the fixed-width
    buckets they overlap, points map to ONE bucket, the join becomes an
    EQUI-join on (bucket [, by]) followed by the exact containment
    filter. Cost: |R| x avg_interval/width extra rows, hash shuffles
    only. Pick bucket_width ~ the typical interval length.

    Columns `point`, `start`, `end` must be numeric (epoch seconds/ms —
    cast timestamps first).
    """
    b = F.lit(int(bucket_width))
    bounds = F.sequence(
        F.floor(F.col(start) / b).cast("long"),
        F.floor(F.col(end) / b).cast("long"),
    )
    r = right.withColumn("_bucket", F.explode(bounds))
    l = left.withColumn("_bucket", F.floor(F.col(point) / b).cast("long"))
    keys = ["_bucket"] + ([by] if by else [])
    joined = l.join(r, keys, how).filter(
        (F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end))
    )
    return joined.drop("_bucket")


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", value_cols: list[str] | None = None,
              suffix: str = "_asof",
              direction: str = "backward") -> DataFrame:
    """Left as-of join. Returns every `left` row plus, for each column in
    `value_cols` (default: all right columns except `on`/`by`), the value
    from the matched `right` row with equal `by`; null when no such row
    exists.

    direction="backward" (default): the LATEST right row with
    right.on <= left.on (DuckDB `ASOF ... ON l.on >= r.on`).
    direction="forward": the EARLIEST right row with right.on >= left.on
    (DuckDB `ASOF ... ON l.on <= r.on`). Ties (equal timestamps) match in
    both directions. Same union trick either way — ONE shuffle, no row
    multiplication; forward just flips the per-key sort.

    `right` should be unique per (by, on) — duplicate right timestamps
    make "the" matched row ambiguous in any engine; pre-aggregate if
    needed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    # Carry ALL value columns in ONE struct: a NULL payload column on the
    # matched (latest) right row stays NULL instead of falling back to an
    # older row (ASOF semantics — DuckDB returns the latest row's NULL),
    # every output column provably comes from the SAME right row, and the
    # window evaluates one `last` instead of len(value_cols).
    tagged_r = right.select(
        F.col(by), F.col(on), F.lit(1).alias("_is_r"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rvals"),
    )
    # cast with the DataType OBJECT: round-tripping through the dtypes DDL
    # string breaks on field names the DDL parser rejects (spaces, colons)
    rtype = tagged_r.schema["_rvals"].dataType
    tagged_l = (left.withColumn("_is_r", F.lit(0))
                .withColumn("_rvals", F.lit(None).cast(rtype)))
    combined = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts so ties match in both
    # directions; forward scans time DESCENDING so "last seen right" means
    # the earliest right at-or-after
    ts_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(by)
        .orderBy(ts_order, F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.withColumn(
        "_rv",
        F.last(F.when(F.col("_is_r") == 1, F.col("_rvals")),
               ignorenulls=True).over(w),
    ).filter(F.col("_is_r") == 0)
    for c in value_cols:
        carried = carried.withColumn(f"{c}{suffix}", F.col("_rv").getField(c))
    return carried.drop("_is_r", "_rvals", "_rv")
