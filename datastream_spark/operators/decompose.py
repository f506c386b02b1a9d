"""Seasonal-trend decomposition of bucketed series (STL-lite).

The reference's analytics stop at per-bucket downsampler statistics;
dashboards built on it routinely need the classical additive
decomposition v = trend + seasonal + residual (the moving-average
core of STL, without loess robustness iterations — those need
row-at-a-time weighted regressions that buy little on metric data).
Composes with the existing surface: the seasonal z-score
(anomaly.py) scores against per-slot baselines, MAD (anomaly.py)
robustly scores residuals, and this operator PRODUCES the residual.

Shape per series key:

- ``trend``   = centered moving average over ``2*half + 1`` buckets,
  NULL where the frame is incomplete (edges) — a partial-frame
  average would bias the trend toward the series ends;
- ``seasonal`` = per-(key, slot) mean of (v - trend), re-centered so
  the seasonal component sums to ~0 over a period (the additive
  identifiability convention);
- ``residual`` = v - trend - seasonal (NULL where trend is NULL).

Scale posture: one window pass partitioned by the series key (state =
one running frame per key, no global sort — hash partitioning), one
small per-(key, slot) aggregate joined back broadcast (|keys| x
period rows), all JVM expressions. The input is already a BUCKETED
series (one row per key x bucket, e.g. a rollup level), so row count
is bounded by keys x time-range/granularity — the raw event volume
never enters the decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    bucket_seconds: int,
    period: int,
    trend_half: int | None = None,
) -> DataFrame:
    """Decompose (key, bucket_epoch, v) series into trend/seasonal/
    residual. ``period`` is in buckets (24 for daily seasonality on
    hourly buckets); ``trend_half`` defaults to period // 2."""
    if trend_half is None:
        trend_half = period // 2
    slot = ((F.col(bucket_col) / bucket_seconds) % period).cast("int")
    # window over the CANONICAL names — the select below renames the
    # caller's columns first, so partitioning by key_col would fail
    # whenever key_col != "key"
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_epoch")
        .rowsBetween(-trend_half, trend_half)
    )
    full = 2 * trend_half + 1
    d = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(bucket_col).alias("bucket_epoch"),
            F.col(value_col).alias("v"),
            slot.alias("slot"),
        )
        .withColumn(
            "trend",
            F.when(
                F.count("v").over(w) == full, F.avg("v").over(w)
            ),
        )
        .withColumn("detrended", F.col("v") - F.col("trend"))
    )
    seasonal_raw = d.where(F.col("trend").isNotNull()).groupBy(
        "key", "slot"
    ).agg(F.avg("detrended").alias("s_raw"))
    centered = seasonal_raw.withColumn(
        "seasonal",
        F.col("s_raw") - F.avg("s_raw").over(Window.partitionBy("key")),
    ).select("key", "slot", "seasonal")
    return (
        d.join(F.broadcast(centered), ["key", "slot"], "left")
        .select(
            "key",
            "bucket_epoch",
            "v",
            "trend",
            "seasonal",
            (F.col("v") - F.col("trend") - F.col("seasonal")).alias("residual"),
        )
    )
