"""Streaming twin of the data-quality expectation suite
(operators/quality.py): validate a live ingest instead of a snapshot.

What carries over and what doesn't, by state bound:

- ROW-LEVEL checks (not-null / range / set / regex): a running
  violations/total counter pair per check — ONE stateful aggregation
  whose state is a single row of 2·k longs BY CONSTRUCTION, so this
  is a complete-mode aggregation under the count-min doctrine (no
  watermark; a late row is simply counted when it arrives, exactly
  as the batch pass would count it).
- REF-INTEGRITY checks: a stream-static LEFT-ANTI join against the
  broadcast DISTINCT parent keys is stateless in the stream, so
  orphan counting folds into the same aggregation (the parent is a
  batch frame refreshed out-of-band, the mad_baseline pattern).
- UNIQUE checks do NOT stream: exact uniqueness over an unbounded
  stream is per-key state proportional to key cardinality — that is
  a batch/CDC question by nature (run `check_suite` over snapshots,
  or `profile_changes` for the delta view). Passing one here raises.

Emission: one row per trigger with per-check violation counters over
everything seen so far — wide form (the long form would need a
post-agg explode, which complete-mode memory sinks replay per
trigger anyway; consumers alert on `*_violations > 0`).

Parity with batch `check_suite` (same counters, row checks and
ref-integrity, through an actual availableNow stream) is pinned by
test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quality import _RefCheck, _RowCheck, _UniqueCheck

__all__ = ["streaming_check_counters"]


def streaming_check_counters(
    stream: DataFrame,
    checks: list,
) -> DataFrame:
    """Running violations/total counters for row-level and
    ref-integrity expectations over a stream. Write with
    ``outputMode("complete")`` — the result is ONE row whose state
    is bounded at 2·k counters regardless of volume.

    Output columns: ``total`` plus, per check i in order,
    ``c{i}_violations`` (and the check's name/target are stable in
    ``c{i}_check`` / ``c{i}_target`` literal columns so downstream
    alerting needs no side table).
    """
    if not checks:
        raise ValueError("streaming_check_counters: need >= 1 expectation")
    if any(isinstance(c, _UniqueCheck) for c in checks):
        raise ValueError(
            "streaming_check_counters: unique checks need per-key state "
            "proportional to key cardinality — run batch check_suite over "
            "snapshots (or profile_changes on the CDC delta) instead"
        )
    bad = [
        c for c in checks if not isinstance(c, (_RowCheck, _RefCheck))
    ]
    if bad:
        raise TypeError("streaming_check_counters: unknown expectation object")

    df = stream
    viol_cols: list[F.Column] = []
    meta: list[tuple[str, str]] = []
    ref_idx = 0
    for c in checks:
        if isinstance(c, _RowCheck):
            viol_cols.append(
                F.when(c.ok.isNull() | ~c.ok, F.lit(1)).otherwise(F.lit(0))
            )
            meta.append((c.name, c.target))
        else:
            # Stream-static anti join is stateless; mark orphans with
            # a flag column instead of dropping rows so every check
            # still sees every row.
            marker = f"_orphan_{ref_idx}"
            ref_idx += 1
            parent_keys = (
                c.parent.select(F.col(c.parent_col).alias("_pk"))
                .distinct()
                .withColumn("_hit", F.lit(1))
            )
            # Honor broadcast_parent exactly like batch check_suite: a
            # fact-sized parent the caller opted out of broadcasting
            # must shuffle-join, not be forced through the driver.
            if c.broadcast_parent:
                parent_keys = F.broadcast(parent_keys)
            flagged = (
                df.join(
                    parent_keys,
                    df[c.child_col] == F.col("_pk"),
                    "left",
                )
                .withColumn(
                    marker,
                    F.when(
                        F.col(c.child_col).isNotNull()
                        & F.col("_hit").isNull(),
                        F.lit(1),
                    ).otherwise(F.lit(0)),
                )
                .drop("_pk", "_hit")
            )
            df = flagged
            viol_cols.append(F.col(marker))
            meta.append((c.name, c.target))

    aggs = [F.count(F.lit(1)).cast("long").alias("total")] + [
        F.sum(v).cast("long").alias(f"c{i}_violations")
        for i, v in enumerate(viol_cols)
    ]
    out = df.agg(*aggs)
    for i, (name, target) in enumerate(meta):
        out = out.withColumn(f"c{i}_check", F.lit(name)).withColumn(
            f"c{i}_target", F.lit(target)
        )
    return out
