"""As-of (temporal) join — the generalization of the reference's
reset-stream lookup (SURVEY.md §2.3 J2, mongodb.py:~1800 [MED]).

Two physical strategies, picked by the caller:

- ``asof_join`` (default): union + last-ignoring-nulls window. ONE
  shuffle on the join key, linear scan per key — the 100 TB-safe plan
  (no range-join explosion, no per-row lookups).
- Spark's native ``DataFrame.joinAsOf`` is used when available and the
  right side is broadcast-small (the optimizer turns it into a
  broadcast as-of); we keep the union formulation as the portable
  default because it is strictly shuffle-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (backward as-of) sharing the key columns.

    Implementation: tag and union both sides, then
    ``last(value, ignorenulls) OVER (PARTITION BY key ORDER BY ts, side)``
    — right rows sort before left rows at equal timestamps iff
    ``allow_exact_matches``.
    """
    right_values = right_values or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    lcols = left.columns

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    for c in right_values:
        lt = lt.withColumn(c + suffix, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *on, F.col(right_ts).alias("_ats"), *[F.col(c).alias(c + suffix) for c in right_values]
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    all_cols = lt.columns
    merged = lt.select(*all_cols).unionByName(rt.select(*all_cols))

    side_order = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_values:
        merged = merged.withColumn(
            c + suffix, F.last(F.col(c + suffix), ignorenulls=True).over(w)
        )
    return merged.where(F.col("_side") == 1).select(
        *lcols, *[c + suffix for c in right_values]
    )
