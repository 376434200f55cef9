"""As-of join: for every left row, the most recent right row at-or-before
its timestamp, per key — the time-series join Spark lacks as a primitive
(DuckDB/kdb/QuestDB ship it natively; the oracle checks against DuckDB's
ASOF JOIN).

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


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join. Returns every `left` row plus, for each column in
    `value_cols` (default: all right columns except `on`/`by`), the value
    from the latest `right` row with right.on <= left.on and equal `by`;
    null when no such row exists.

    `right` should be unique per (by, on) — duplicate right timestamps
    make "the" latest row ambiguous in any engine; pre-aggregate if
    needed.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    tagged_r = right.select(
        F.col(by), F.col(on), F.lit(1).alias("_is_r"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    tagged_l = left.withColumn("_is_r", F.lit(0))
    for c in value_cols:
        tagged_l = tagged_l.withColumn(f"{c}{suffix}",
                                       F.lit(None).cast(dict(tagged_r.dtypes)[f"{c}{suffix}"]))
    combined = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts so ties match (>=)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined
    for c in value_cols:
        carried = carried.withColumn(
            f"{c}{suffix}",
            F.last(F.when(F.col("_is_r") == 1, F.col(f"{c}{suffix}")),
                   ignorenulls=True).over(w),
        )
    return carried.filter(F.col("_is_r") == 0).drop("_is_r")
