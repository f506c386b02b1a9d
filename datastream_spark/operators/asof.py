"""As-of (temporal) join — the generalization of the reference's
reset-stream lookup (SURVEY.md §2.3 J2, mongodb.py:~1800 [MED]).

Two physical strategies, picked by the caller:

- ``asof_join`` (default): union + last-ignoring-nulls window. ONE
  shuffle on the join key, linear scan per key — the 100 TB-safe plan
  (no range-join explosion, no per-row lookups). ``direction``
  backward/forward/nearest and ``tolerance_seconds`` cover the full
  pandas ``merge_asof`` surface; nearest costs a second window pass
  over the SAME partitioning (no extra shuffle).
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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row sharing the key columns
    that is latest with ``right.ts <= left.ts`` (``backward``),
    earliest with ``right.ts >= left.ts`` (``forward``), or closest in
    absolute time (``nearest``, ties break backward — pandas
    ``merge_asof`` semantics). ``tolerance_seconds`` nulls the match
    when the matched timestamp is further than the tolerance.

    Implementation: tag and union both sides, then per direction a
    ``last``/``first`` (ignorenulls) window ordered by
    ``(ts, side)`` — right rows sort inside the left row's frame iff
    ``allow_exact_matches``. ``nearest`` evaluates both windows over
    the SAME hash partitioning and picks per row by time distance.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    right_values = right_values or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    lcols = left.columns

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    for c in right_values:
        lt = lt.withColumn(c + suffix, F.lit(None).cast(right.schema[c].dataType))
    lt = lt.withColumn("_rts", F.lit(None).cast(right.schema[right_ts].dataType))
    rt = (
        right.select(
            *on,
            F.col(right_ts).alias("_ats"),
            *[F.col(c).alias(c + suffix) for c in right_values],
        )
        .withColumn("_side", F.lit(0))
        .withColumn("_rts", F.col("_ats"))
    )
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    all_cols = lt.columns
    merged = lt.select(*all_cols).unionByName(rt.select(*all_cols))

    value_cols = [c + suffix for c in right_values] + ["_rts"]
    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")

    if need_back:
        # at equal ts, right rows must fall INSIDE the trailing frame
        # iff exact matches are allowed → right (side 0) sorts first
        side_order = (
            F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
        )
        wb = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in value_cols:
            merged = merged.withColumn(
                f"_b_{c}", F.last(F.col(c), ignorenulls=True).over(wb)
            )
    if need_fwd:
        # "first right row at-or-after me" = a RUNNING last() over the
        # REVERSED sort. The direct form — first() over a (current row,
        # unbounded following) frame — makes WindowExec re-aggregate
        # the partition tail for every row, O(rows^2) per key; the
        # reversed running frame is incremental O(rows) at the cost of
        # one extra sort. Tie-break mirrors the backward case exactly
        # reversed: right rows at equal ts sort BEFORE left in the
        # descending scan iff exact matches are allowed (so they have
        # been seen when left's frame closes).
        side_order = (
            F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
        )
        wf = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats").desc(), side_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in value_cols:
            merged = merged.withColumn(
                f"_f_{c}", F.last(F.col(c), ignorenulls=True).over(wf)
            )

    out = merged.where(F.col("_side") == 1)
    lts_us = F.unix_micros(F.col(left_ts))

    def _gap(rts_col):
        return F.abs(lts_us - F.unix_micros(rts_col))

    if direction == "backward":
        picked = {c: F.col(f"_b_{c}") for c in value_cols}
    elif direction == "forward":
        picked = {c: F.col(f"_f_{c}") for c in value_cols}
    else:
        gb = _gap(F.col("_b__rts"))
        gf = _gap(F.col("_f__rts"))
        # ties and missing-forward fall backward (pandas semantics);
        # coalesce handles a missing backward side
        use_b = F.col("_f__rts").isNull() | (
            F.col("_b__rts").isNotNull() & (gb <= gf)
        )
        picked = {
            c: F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
            for c in value_cols
        }

    for c in value_cols:
        out = out.withColumn(c, picked[c])
    if tolerance_seconds is not None:
        tol_us = F.lit(int(tolerance_seconds * 1_000_000))
        within = F.col("_rts").isNotNull() & (_gap(F.col("_rts")) <= tol_us)
        for c in value_cols:
            if c != "_rts":
                out = out.withColumn(c, F.when(within, F.col(c)))
    return out.select(*lcols, *[c + suffix for c in right_values])
