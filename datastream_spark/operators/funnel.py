"""Ordered conversion funnels over the event stream (SURVEY.md §2
extended relational surface — net-new; the standard product-analytics
operator, semantics as in window-funnel functions of public OLAP
engines).

Strict-order semantics: a user's step-k timestamp is the EARLIEST
step-k event STRICTLY AFTER their step-(k-1) timestamp; step 1 is the
user's earliest step-1 event. A user appears in the output iff they
reached step 1; later steps are NULL until reached.

Scale shape: k-1 hash joins on the user key, each feeding a min-agg —
shuffle is keyed on users (not events), partial aggregation runs
map-side, and nothing windows over the whole event stream. The
optional ``within_seconds`` horizon (measured from step 1, the
product-analytics convention) is a filter inside each join, not extra
state. All timestamps, no floats — funnel outputs hash-gate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "funnel_counts", "retention", "top_paths", "unordered_funnel"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """One row per user who reached step 1:
    (user, step_1_ts, ..., step_k_ts) with NULLs past the user's last
    completed step. ``within_seconds`` bounds the whole funnel to a
    horizon after step 1 (NULL-safe: unreached steps stay NULL)."""
    if len(steps) < 2:
        raise ValueError("funnel: need at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel: duplicate step types in {steps}")

    out = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step_{i - 1}_ts"
        carry = [user_col, prev] + (
            ["step_1_ts"] if within_seconds is not None and i > 2 else []
        )
        cond = F.col(ts_col) > F.col(prev)
        if within_seconds is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col("step_1_ts") + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        nxt = (
            events.where(F.col(type_col) == step)
            .join(out.select(*dict.fromkeys(carry)), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"step_{i}_ts"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def retention(
    events: DataFrame,
    period_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users are cohorted by the period of their
    FIRST activity; output (cohort_epoch, period_offset, users) counts
    the cohort's distinct users active ``period_offset`` periods later
    (offset 0 = the cohort's own size).

    Scale shape: one user-keyed min-agg (the cohort), one distinct
    over (user, period) — which pre-collapses the event stream to at
    most users x periods rows BEFORE anything joins — then a
    user-keyed hash join and one two-phase count. All-integer output;
    hash-gates exactly."""
    if period_seconds < 1:
        raise ValueError("retention: period_seconds must be >= 1")
    p = F.lit(int(period_seconds))
    period = (F.floor(F.unix_timestamp(F.col(ts_col)) / p) * p).cast("bigint")

    active = events.select(
        F.col(user_col), period.alias("_period")
    ).distinct()
    # min over the distinct frame == min over raw events, so the
    # cohort agg rides the already-collapsed (user, period) frame —
    # one scan of the stream, and the cohort exchange is user-keyed
    # rows, not events.
    first = active.groupBy(user_col).agg(F.min("_period").alias("_cohort"))
    return (
        active.join(first, user_col)
        .groupBy(
            F.col("_cohort").alias("cohort_epoch"),
            ((F.col("_period") - F.col("_cohort")) / p)
            .cast("bigint")
            .alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


def top_paths(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """User journey paths: the sequence of each user's FIRST ``k``
    event types (in event-time order, ties on ``tiebreak``) joined
    with ``sep``, counted across users — the classic "what do users do
    first" report alongside funnels and retention.

    Scale shape: a per-user rank window (sort WITHIN the user's hash
    partition, never global) filters to ≤ k rows per user BEFORE any
    collect, so the per-user array is k elements by construction —
    a heavy user costs the same as a light one past the filter. The
    path space is |types|^k, so the final count agg is tiny."""
    if k < 1:
        raise ValueError("top_paths: k must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak))
    ranked = (
        events.select(user_col, type_col, ts_col, tiebreak)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    per_user = ranked.groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_rn"), F.col(type_col).alias("_t")))
        ).alias("_s")
    )
    path = F.concat_ws(sep, F.transform(F.col("_s"), lambda s: s["_t"]))
    return (
        per_user.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_counts(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Collapse per-user funnel rows to the classic funnel report:
    (step, users) — users whose step-k timestamp is non-NULL. One
    aggregation over the funnel frame; counts are monotone
    non-increasing by construction."""
    aggs = [
        F.count(F.col(f"step_{i}_ts")).alias(f"_c{i}")
        for i in range(1, n_steps + 1)
    ]
    wide = funnel_df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("step"), F.col(f"_c{i}").alias("users"))
            for i in range(1, n_steps + 1)
        ]
    )
    return wide.select(F.explode(pairs).alias("_p")).select("_p.step", "_p.users")


def unordered_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Set-completion (any-order) funnel: per user, the earliest
    occurrence of EACH step regardless of order, whether the full set
    was collected, and the span from the first collected step to the
    moment the set completed. The "did the user ever do all of X, Y,
    Z" question, where the ordered funnel asks "in this order".

    Cheaper than the ordered funnel by construction: ONE conditional
    min-aggregation over the stream (no joins at all) — per-user state
    is k timestamps, shuffle keyed on users with map-side partials.
    Trivially streaming-safe for the same reason the ordered funnel's
    streaming twin is: under monotonic appends each conditional min
    only ratchets downward once.
    """
    if not steps:
        raise ValueError("unordered_funnel: steps must be non-empty")
    firsts = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"step_{i + 1}")
        for i, s in enumerate(steps)
    ]
    cols = [F.col(f"step_{i + 1}") for i in range(len(steps))]
    done = None
    for c in cols:
        done = c.isNotNull() if done is None else (done & c.isNotNull())
    if len(cols) == 1:  # greatest/least need >=2 columns; span is 0
        span = F.lit(0).cast("long")
    else:
        span = F.unix_micros(F.greatest(*cols)) - F.unix_micros(F.least(*cols))
    return (
        events.where(F.col(type_col).isin(steps))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(*firsts)
        .withColumn("completed", done)
        .withColumn(
            "span_us", F.when(done, span)
        )
    )
