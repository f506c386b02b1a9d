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
