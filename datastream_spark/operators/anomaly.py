"""Seasonal anomaly scoring (monitoring-surface extension).

The standard first-line anomaly detector for periodic telemetry:
bucket the series (e.g. hourly), compare each bucket against the
distribution of the SAME slot across periods (same-hour-of-day across
days), and score by z = (x − μ_slot) / σ_slot. Seasonal baselines
catch what a global z-score can't — a value normal at peak hour is an
anomaly at 4am.

Plan shape: two two-phase hash aggregations (per-bucket means, then
per-(key, slot) moments) and one equi-join back on (key, slot) —
slot cardinality is period/step per key, so the stats side is
dimension-sized relative to the bucket stream. Population σ from
(count, sum, sum²), clamped at 0 against FP cancellation — the same
finish form as the rollup ladder, so the arithmetic is
oracle-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cusum",
    "mad_baseline",
    "mad_outliers",
    "mad_score_points",
    "seasonal_baseline",
    "seasonal_score_points",
    "seasonal_zscore",
]


def seasonal_zscore(
    df: DataFrame,
    step_seconds: int = 3600,
    period_seconds: int = 86400,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-bucket z-scores against the same-slot baseline.

    Output: (key, bucket_epoch, v, slot, slot_n, slot_mean, slot_std,
    zscore, is_anomaly). ``v`` is the bucket mean (rounded to 6 d.p.
    BEFORE the baseline moments, pinning the arithmetic across
    engines); ``zscore`` is NULL when the slot is degenerate
    (σ = 0 or a single observation).
    """
    step_us = step_seconds * 1_000_000
    b = (
        F.floor(F.unix_micros(F.col(ts_col)) / step_us) * step_seconds
    ).cast("bigint")
    per_bucket = (
        df.groupBy(F.col(key), b.alias("bucket_epoch"))
        .agg(F.round(F.avg(value_col), 6).alias("v"))
        .withColumn("slot", F.col("bucket_epoch") % period_seconds)
    )
    stats = per_bucket.groupBy(key, "slot").agg(
        F.count("v").alias("slot_n"),
        F.round(F.avg("v"), 6).alias("slot_mean"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.avg(F.col("v") * F.col("v"))
                    - F.avg("v") * F.avg("v"),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("slot_std"),
    )
    z = F.when(
        (F.col("slot_std") > 0) & (F.col("slot_n") > 1),
        F.round((F.col("v") - F.col("slot_mean")) / F.col("slot_std"), 6),
    )
    return (
        per_bucket.join(stats, [key, "slot"])
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
        )
    )


def seasonal_baseline(
    df: DataFrame,
    step_seconds: int = 3600,
    period_seconds: int = 86400,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The per-(key, slot) baseline alone — (key, slot, slot_n,
    slot_mean, slot_std). Computed in BATCH on a cadence; the live
    path joins it stream-static (``seasonal_score_points``)."""
    scored = seasonal_zscore(
        df, step_seconds, period_seconds, key, ts_col, value_col
    )
    return scored.select(
        key, "slot", "slot_n", "slot_mean", "slot_std"
    ).dropDuplicates([key, "slot"])


def seasonal_score_points(
    points: DataFrame,
    baseline: DataFrame,
    step_seconds: int = 3600,
    period_seconds: int = 86400,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Score individual datapoints against a precomputed baseline —
    stateless (one equi-join + projection), so the SAME expression runs
    on a batch frame or a readStream in append mode (live anomaly
    feed); the baseline refreshes on whatever cadence the batch job
    runs. Per-POINT z-scores, unlike ``seasonal_zscore``'s per-bucket
    means — the live path flags the first bad sample, not the bucket
    post-hoc."""
    step_us = step_seconds * 1_000_000
    b = (
        F.floor(F.unix_micros(F.col(ts_col)) / step_us) * step_seconds
    ).cast("bigint")
    pts = points.withColumn("bucket_epoch", b).withColumn(
        "slot", F.col("bucket_epoch") % period_seconds
    )
    z = F.when(
        (F.col("slot_std") > 0) & (F.col("slot_n") > 1),
        F.round((F.col(value_col) - F.col("slot_mean")) / F.col("slot_std"), 6),
    )
    return (
        # LEFT join: a point from a new stream or never-observed slot
        # passes through unscored (zscore NULL, is_anomaly false)
        # instead of being dropped — in streaming append mode an
        # inner-joined row would be lost for good.
        pts.join(F.broadcast(baseline), [key, "slot"], "left")
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
        )
    )


def mad_outliers(
    df: DataFrame,
    key: str = "stream_id",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-key outlier scoring via the median absolute
    deviation (the Iglewicz-Hoberg modified z-score, the standard
    robust alternative when a few spikes would poison mean/sigma):
    ``M_i = 0.6745 * (x_i - median) / MAD``, flagged past
    ``threshold`` (3.5 is the published default).

    Exact medians (``percentile``, Spark's interpolating exact form =
    SQL ``quantile_cont`` — the q_a4-pinned equivalence), computed in
    TWO two-phase aggregations (values median, then |x - median|
    median) with dimension-sized stats broadcast back — no window over
    the full stream, no sort. Degenerate keys (MAD = 0: half the
    points identical) yield NULL scores and ``is_outlier`` false,
    never a division artifact.

    Output: input columns + (key_median, key_mad, mscore, is_outlier).
    """
    return mad_score_points(
        df, mad_baseline(df, key, value_col), key, value_col, threshold
    )


def mad_baseline(
    df: DataFrame,
    key: str = "stream_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key (key_median, key_mad) — the dimension-sized robust
    baseline ``mad_outliers`` scores against, factored out so a live
    feed can reuse a frozen copy (``mad_score_points``), the same
    batch-builds-baseline / stream-scores-points split as
    ``seasonal_baseline``."""
    med = df.groupBy(key).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("key_median")
    )
    return (
        df.join(F.broadcast(med), key)
        .groupBy(key)
        .agg(
            F.expr(
                f"percentile(abs({value_col} - key_median), 0.5)"
            ).alias("key_mad"),
            F.first("key_median").alias("key_median"),
        )
    )


def mad_score_points(
    points: DataFrame,
    baseline: DataFrame,
    key: str = "stream_id",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Score points against a precomputed MAD baseline — stateless
    (one broadcast equi-join + projection), so the SAME expression
    runs on a batch frame or a readStream in append mode; the baseline
    refreshes on whatever cadence the batch job runs. LEFT join: a
    point from a key absent in the baseline passes through unscored
    (mscore NULL, is_outlier false) instead of being dropped — in
    streaming append mode an inner-joined row would be lost for good.

    ``mad_outliers`` is exactly this applied to a same-frame baseline.
    """
    scored = points.join(F.broadcast(baseline), key, "left").withColumn(
        "mscore",
        F.when(
            F.col("key_mad") > 0,
            F.lit(0.6745)
            * (F.col(value_col) - F.col("key_median"))
            / F.col("key_mad"),
        ),
    )
    return scored.withColumn(
        "is_outlier",
        F.coalesce(F.abs(F.col("mscore")) > threshold, F.lit(False)),
    )


def cusum(
    df: DataFrame,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point scores (Page's cumulative-sum
    control chart): ``S+`` accumulates upward drift past
    ``target + slack``, ``S-`` downward past ``target - slack``;
    ``alarm`` fires past ``threshold``.

    The textbook recurrence ``S_i = max(0, S_{i-1} + d_i)`` is
    sequential, but the standard identity ``S_i = P_i - min(0,
    running_min(P))`` (P = running prefix sum of d) turns it into TWO
    running-frame windows per side — incremental O(rows) inside the
    key's hash partition, no recurrence, no Python, and exactly
    replayable in SQL (both engines scan the frame in the same order,
    so the doubles match bit-for-bit). Output: input + (cusum_pos,
    cusum_neg, alarm).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col)
    d_up = v - F.lit(float(target) + float(slack))
    d_dn = F.lit(float(target) - float(slack)) - v
    p_up = F.sum(d_up).over(w)
    p_dn = F.sum(d_dn).over(w)
    out = (
        df.withColumn("_pu", p_up)
        .withColumn("_pd", p_dn)
        .withColumn("_mu", F.least(F.lit(0.0), F.min("_pu").over(w)))
        .withColumn("_md", F.least(F.lit(0.0), F.min("_pd").over(w)))
        .withColumn("cusum_pos", F.round(F.col("_pu") - F.col("_mu"), 6))
        .withColumn("cusum_neg", F.round(F.col("_pd") - F.col("_md"), 6))
        .drop("_pu", "_pd", "_mu", "_md")
    )
    return out.withColumn(
        "alarm",
        (F.col("cusum_pos") > threshold) | (F.col("cusum_neg") > threshold),
    )
