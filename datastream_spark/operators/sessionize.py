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
    range_partitions: int | None = None,
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
    smaller than events) and the sweep runs on the reduced
    one-row-per-instant frame, never the fact table. Since round 10
    the sweep is range-partitioned: boundary instants shuffle into
    ``range_partitions`` time ranges (default: the session's
    defaultParallelism), each range computes its running sums
    locally, and a per-range EXCLUSIVE prefix offset — a window over
    the range-total frame, bounded at ``range_partitions`` rows by
    construction — is broadcast-joined back and added. No partition
    ever holds more than its time slice of instants, so the sweep
    survives boundary sets that outgrow one task's sort buffer
    (VERDICT r9 #5: this was the last unbounded single-partition
    window in the engine). ``spark_partition_id`` is the range index:
    RangePartitioner assigns ascending ranges to ascending partition
    ids, and AQE only ever coalesces ADJACENT shuffle partitions, so
    the id stays monotone in time either way.
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
    if range_partitions is None:
        range_partitions = df.sparkSession.sparkContext.defaultParallelism
    # Both consumers below (local sweep + range totals) sit on this
    # one exchange; ReuseExchange (and, under AQE, the shared
    # materialized stage) guarantees they read the SAME shuffle
    # output, so spark_partition_id agrees across the branches — the
    # plan-audited invariant the broadcast join back relies on.
    ranged = per_t.repartitionByRange(range_partitions, F.col(ts)).withColumn(
        "_rg", F.spark_partition_id()
    )
    wloc = (
        Window.partitionBy("_rg")
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.select(
        ts,
        "n_starts",
        "n_ends",
        "_rg",
        F.sum("n_starts").over(wloc).alias("_ls"),
        F.sum("n_ends").over(wloc).alias("_le"),
    )
    # Exclusive prefix offsets: one bounded window over the per-range
    # totals (<= range_partitions rows), broadcast back.
    woff = Window.orderBy("_rg").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("_rg")
        .agg(F.sum("n_starts").alias("_ts"), F.sum("n_ends").alias("_te"))
        .select(
            "_rg",
            F.coalesce(F.sum("_ts").over(woff), F.lit(0)).alias("_os"),
            F.coalesce(F.sum("_te").over(woff), F.lit(0)).alias("_oe"),
        )
    )
    starts_cum = F.col("_os") + F.col("_ls")
    ends_cum = F.col("_oe") + F.col("_le")
    return local.join(F.broadcast(offsets), "_rg").select(
        ts,
        "n_starts",
        "n_ends",
        (starts_cum - (ends_cum - F.col("n_ends"))).alias("concurrent"),
    )
