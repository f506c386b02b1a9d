"""Declarative data-quality expectations (the Deequ/Great-Expectations
construction, re-expressed Spark-first; SURVEY.md §2.10 extended
surface — net-new, no reference citation).

A 100 TB ingest without validation silently poisons every operator
downstream of it; the standard industrial answer (AWS Deequ, Great
Expectations) is a declarative check suite compiled into as few scans
as possible, emitting a long-form violations report. This module keeps
that doctrine with a strict execution-shape contract:

- ALL row-level checks against one table (not-null, range, set
  membership, regex match) compile into a SINGLE aggregation pass —
  one conditional ``sum`` per check, map-side partial, one row out.
  Adding a check to a table adds a column to the agg, never a scan.
- ``unique`` checks are one two-phase groupBy each (count keys seen
  more than once) — the only check family that genuinely needs a
  shuffle, keyed on the checked columns themselves.
- ``ref_integrity`` (child keys ⊆ parent keys) is a left-anti join of
  the child against the DISTINCT parent keys; the distinct side
  collapses to key cardinality before the join, so it broadcasts for
  every dimension-shaped parent regardless of parent row count.

Every metric is an exact BIGINT count (violations / total), so the
report hash-gates cross-engine with no float doctrine at all.

Output is long form, one row per check:
    (check STRING, target STRING, violations BIGINT, total BIGINT,
     passed BOOLEAN)
ready to diff between CDC snapshots the same way profile_diff diffs
profiles, or to gate a pipeline stage (``passed`` aggregates with
``bool_and``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect_not_null",
    "expect_in_range",
    "expect_values_in",
    "expect_matches",
    "expect_unique",
    "expect_ref_integrity",
    "check_suite",
]


@dataclass(frozen=True)
class _RowCheck:
    """A per-row predicate check: violations = rows where the
    predicate is FALSE (NULL predicate results count as violations —
    an unknown is not a pass)."""

    name: str
    target: str
    ok: Column


@dataclass(frozen=True)
class _UniqueCheck:
    name: str
    target: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class _RefCheck:
    name: str
    target: str
    child_col: str
    parent: DataFrame
    parent_col: str
    broadcast_parent: bool = True


def expect_not_null(col: str) -> _RowCheck:
    return _RowCheck("not_null", col, F.col(col).isNotNull())


def expect_in_range(col: str, lo, hi) -> _RowCheck:
    """Closed-interval range check; NULLs violate (use a separate
    not_null check if you want them reported under that name too)."""
    return _RowCheck(
        "in_range", col, (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def expect_values_in(col: str, allowed: list) -> _RowCheck:
    if not allowed:
        raise ValueError("expect_values_in: empty allowed set")
    return _RowCheck("values_in", col, F.col(col).isin(allowed))


def expect_matches(col: str, pattern: str) -> _RowCheck:
    """Full-match regex check (the whole value must match).

    Anchored with ``\\A(?:p)\\z``, not ``^...$``: in Java regex a bare
    ``$`` also matches just before a trailing line terminator, so a
    value ending in ``\\n`` would pass here while the DuckDB oracle's
    ``regexp_full_match`` counts it as a violation — ``\\z`` is the
    true end-of-input anchor on both engines."""
    return _RowCheck("matches", col, F.col(col).rlike(f"\\A(?:{pattern})\\z"))


def expect_unique(*cols: str) -> _UniqueCheck:
    if not cols:
        raise ValueError("expect_unique: need at least one column")
    return _UniqueCheck("unique", ",".join(cols), tuple(cols))


def expect_ref_integrity(
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
) -> _RefCheck:
    """Every non-null child key must exist among the parent's keys.
    NULL child keys are not violations (SQL FK semantics); add a
    not_null check to forbid them. ``broadcast_parent=False`` drops
    the broadcast hint for fact-sized parents (the anti-join then
    shuffles on the key, which is the correct plan at that shape)."""
    return _RefCheck(
        "ref_integrity",
        f"{child_col}->{parent_col}",
        child_col,
        parent,
        parent_col,
        broadcast_parent,
    )


def check_suite(df: DataFrame, checks: list) -> DataFrame:
    """Run a list of expectations against ``df`` and return the
    long-form report — see the module docstring for the scan-count
    contract (1 agg pass for ALL row checks + 1 groupBy per unique
    check + 1 anti-join per referenced parent)."""
    if not checks:
        raise ValueError("check_suite: need at least one expectation")
    row_checks = [c for c in checks if isinstance(c, _RowCheck)]
    uniq_checks = [c for c in checks if isinstance(c, _UniqueCheck)]
    ref_checks = [c for c in checks if isinstance(c, _RefCheck)]
    if len(row_checks) + len(uniq_checks) + len(ref_checks) != len(checks):
        raise TypeError("check_suite: unknown expectation object in list")

    reports: list[DataFrame] = []

    if row_checks:
        # ONE pass: each check is a conditional count; NULL predicate
        # results (e.g. a range check on a NULL value) violate.
        # coalesce: SUM over zero rows is NULL — an empty batch must
        # report 0 violations / passed=true, like the other families.
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.coalesce(
                F.sum(
                    F.when(c.ok.isNull() | ~c.ok, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            ).alias(f"_v{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        # Long-form via explode of the one-row frame: a per-check
        # select-then-union would re-plan (and re-scan) the aggregate
        # once per check, breaking the one-pass contract.
        rows = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.lit(c.target).alias("target"),
                    F.col(f"_v{i}").cast("long").alias("violations"),
                    F.col("_total").cast("long").alias("total"),
                )
                for i, c in enumerate(row_checks)
            ]
        )
        reports.append(one.select(F.explode(rows).alias("_r")).select("_r.*"))

    for c in uniq_checks:
        # Violations = rows carrying a key seen more than once (NULL
        # keys group together, as SQL GROUP BY does). Two-phase agg.
        grouped = df.groupBy(*c.cols).agg(F.count(F.lit(1)).alias("_n"))
        reports.append(
            grouped.agg(
                F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n"))), F.lit(0)
                )
                .cast("long")
                .alias("violations"),
                F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("total"),
            ).select(
                F.lit(c.name).alias("check"),
                F.lit(c.target).alias("target"),
                "violations",
                "total",
            )
        )

    if ref_checks:
        # ONE totals frame shared by every ref check. Deliberately a
        # fresh zero-column count (ReadSchema struct<> — row-group
        # metadata only on columnar storage) rather than a reuse of
        # the row-check aggregate: each union branch re-plans its
        # inputs, so referencing `one` here would re-EXECUTE the full
        # k-column conditional agg once per ref check.
        totals = df.agg(F.count(F.lit(1)).cast("long").alias("total"))
    for c in ref_checks:
        # Anti-join against the DISTINCT parent keys: the distinct
        # collapses the parent to key cardinality pre-join, so any
        # dimension-shaped parent broadcasts.
        parent_keys = (
            c.parent.select(F.col(c.parent_col).alias("_pk")).distinct()
        )
        if c.broadcast_parent:
            parent_keys = F.broadcast(parent_keys)
        child = df.select(F.col(c.child_col).alias("_ck"))
        orphans = child.where(F.col("_ck").isNotNull()).join(
            parent_keys, F.col("_ck") == F.col("_pk"), "left_anti"
        )
        reports.append(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .crossJoin(totals)
            .select(
                F.lit(c.name).alias("check"),
                F.lit(c.target).alias("target"),
                "violations",
                "total",
            )
        )

    report = reduce(DataFrame.unionByName, reports)
    return report.withColumn("passed", F.col("violations") == 0)
