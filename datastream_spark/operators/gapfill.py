"""Gap filling over rollup frames (InfluxDB ``fill()`` / TimescaleDB
``time_bucket_gapfill`` parity — the query-surface the reference's
InfluxQL backend exposes via ``fill(null|previous|linear)``,
datastream/backends/influxdb.py:~400 [LOW]).

Given a (key, bucket_epoch, value) frame, materialize every missing
bucket on the granularity grid and fill it:

- ``null``:   emit the bucket with a NULL value (grid completion only)
- ``locf``:   last observation carried forward
- ``linear``: linear interpolation between the previous and next
              observed buckets (NULL before the first / after the last
              observation, matching the conventional contract)

Plan shape: per-key min/max aggregation (two-phase), ``sequence`` +
``explode`` to generate the grid (narrow — no join against a calendar
table), one left join back to the observations on (key, bucket) and
per-key windows for the fill — every sort stays inside the hash
partitioning on ``key``; nothing global.

At 100 TB the grid explode is the thing to watch: a sparse stream over
a long range generates range/granularity rows per key. That is the
REQUESTED output (gap filling densifies by definition), but callers
should bound the range (``lo``/``hi``) to the query window rather than
densifying whole-history frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fill_gaps"]


def fill_gaps(
    df: DataFrame,
    step_seconds: int,
    key: str = "stream_id",
    bucket_col: str = "bucket_epoch",
    value_col: str = "value",
    method: str = "locf",
    lo: int | None = None,
    hi: int | None = None,
) -> DataFrame:
    """Densify ``df`` onto the ``step_seconds`` grid and fill.

    Output: (key, bucket_epoch, value, filled BOOLEAN) — ``filled``
    marks generated rows so downstream consumers can tell imputation
    from observation. ``lo``/``hi`` (epoch seconds, inclusive) override
    the per-key observed min/max as the grid range.
    """
    if method not in ("null", "locf", "linear"):
        raise ValueError(f"unknown fill method {method!r}")

    obs = df.select(
        F.col(key), F.col(bucket_col).alias("_b"), F.col(value_col).alias("_v")
    )
    bounds = obs.groupBy(key).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    if lo is not None:
        bounds = bounds.withColumn("_lo", F.lit(lo).cast("bigint"))
    if hi is not None:
        bounds = bounds.withColumn("_hi", F.lit(hi).cast("bigint"))
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_seconds))
        ).alias("_b"),
    )
    joined = grid.join(obs, [key, "_b"], "left").withColumn(
        "filled", F.col("_v").isNull()
    )

    if method == "null":
        out_v = F.col("_v")
    elif method == "locf":
        w = (
            Window.partitionBy(key)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out_v = F.last("_v", ignorenulls=True).over(w)
    else:  # linear
        wp = (
            Window.partitionBy(key)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wn = (
            Window.partitionBy(key)
            .orderBy("_b")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pv = F.last("_v", ignorenulls=True).over(wp)
        pb = F.last(
            F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True
        ).over(wp)
        nv = F.first("_v", ignorenulls=True).over(wn)
        nb = F.first(
            F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True
        ).over(wn)
        out_v = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
            F.when(
                pv.isNotNull() & nv.isNotNull(),
                pv
                + (nv - pv)
                * ((F.col("_b") - pb).cast("double") / (nb - pb).cast("double")),
            )
        )

    return joined.select(
        F.col(key),
        F.col("_b").alias(bucket_col),
        out_v.alias(value_col),
        "filled",
    )
