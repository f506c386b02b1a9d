"""Session windows over event streams (extended surface, SURVEY.md §2.9).

The reference's ladder has only tumbling windows; session windows come
free with Spark. Batch path uses the portable island-detection
formulation (also runnable by the DuckDB oracle); streaming path uses
``session_window`` (see datastream_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    Single shuffle on the key; the running sum is a rows-frame window
    (no range-frame re-sort).
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap_us = gap_seconds * 1_000_000
    new_session = (
        F.when(
            F.lag(ts).over(w).isNull()
            | (F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w)) > gap_us),
            1,
        )
        .otherwise(0)
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_session).over(wrun))


def session_stats(
    df: DataFrame,
    gap_seconds: int,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Sessionize then aggregate one row per (key, session)."""
    s = sessionize(df, gap_seconds, key=key, ts=ts)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.sum(value).alias("sum_value"),
    )


def concurrency(
    df: DataFrame,
    gap_seconds: int,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Concurrent-session curve: how many sessions are active at each
    session boundary instant — the capacity-planning question ("peak
    simultaneous users") tumbling-window counts cannot answer, because
    a session spans many buckets and a bucket mixes sessions.

    Sweep-line over session intervals: sessionize → per-session
    [start, end] (inclusive ends: a session is active at its own
    endpoints, so two sessions touching at one instant both count) →
    +1/−1 deltas → one running sum ordered by time. Exactly the
    interval-overlap counting construction; output is one row per
    distinct boundary instant:

        concurrent(t) = #{sessions: start ≤ t} − #{sessions: end < t}

    Output: (ts, n_starts, n_ends, concurrent) — all BIGINT, so the
    oracle replays it exactly (no float gate at all).

    Scale shape: the interval frame is sessions (orders of magnitude
    smaller than events); the sweep is ONE global-ordered running-sum
    window over boundary instants (2 rows per session). A single
    ordered partition is the correct physical plan for a cumulative
    curve — it runs on the reduced frame, never the fact table; on a
    cluster, range-partition by time and prefix-offset per range if
    the boundary set itself is huge.
    """
    iv = (
        sessionize(df, gap_seconds, key=key, ts=ts)
        .groupBy(key, "session_id")
        .agg(F.min(ts).alias("_s"), F.max(ts).alias("_e"))
    )
    # Explode, not union-of-two-selects: a union re-evaluates the
    # whole sessionize lineage (a fact-table window pass) once per
    # branch; the explode emits both boundary rows in ONE pass.
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_s").alias(ts),
                    F.lit(1).alias("_ns"),
                    F.lit(0).alias("_ne"),
                ),
                F.struct(
                    F.col("_e").alias(ts),
                    F.lit(0).alias("_ns"),
                    F.lit(1).alias("_ne"),
                ),
            )
        ).alias("_d")
    ).select("_d.*")
    per_t = deltas.groupBy(ts).agg(
        F.sum("_ns").alias("n_starts"), F.sum("_ne").alias("n_ends")
    )
    wrun = Window.orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    starts_cum = F.sum("n_starts").over(wrun)
    ends_cum = F.sum("n_ends").over(wrun)
    return per_t.select(
        ts,
        "n_starts",
        "n_ends",
        (starts_cum - (ends_cum - F.col("n_ends"))).alias("concurrent"),
    )
