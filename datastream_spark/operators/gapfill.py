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
    value_col: str | list[str] = "value",
    method: str | list[str] = "locf",
    lo: int | None = None,
    hi: int | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Densify ``df`` onto the ``step_seconds`` grid and fill.

    Output: (key, bucket_epoch, value column(s), passthrough columns,
    filled BOOLEAN) — ``filled`` marks generated rows so downstream
    consumers can tell imputation from observation. ``lo``/``hi``
    (epoch seconds, inclusive) override the per-key observed min/max
    as the grid range. ``value_col`` may list several columns (each
    filled independently, one shared grid/windows); ``passthrough``
    columns ride along unfilled (NULL on generated rows) — e.g. the
    time-downsampler columns of a rollup frame, where imputing a
    timestamp would be a lie. ``method`` may be a list aligned with
    ``value_col`` to fill different columns differently in ONE pass
    (one grid, shared windows) instead of densifying twice.
    """
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    methods = [method] * len(vcols) if isinstance(method, str) else list(method)
    if len(methods) != len(vcols):
        raise ValueError("method list must align with value_col list")
    for m_ in methods:
        if m_ not in ("null", "locf", "linear"):
            raise ValueError(f"unknown fill method {m_!r}")
    passthrough = passthrough or []

    obs = df.select(
        F.col(key),
        F.col(bucket_col).alias("_b"),
        *[F.col(c).alias(f"_v_{c}") for c in vcols],
        *[F.col(c) for c in passthrough],
    )
    bounds = obs.groupBy(key).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    # Caller bounds are snapped onto each key's OBSERVED bucket phase
    # (smallest aligned bucket >= lo / largest <= hi). A raw
    # sequence(lo, hi, step) with a misaligned lo would match no
    # observed bucket at the join — every observation silently
    # vanishing into NULL+filled=true rows.
    step_l = F.lit(step_seconds).cast("bigint")
    if lo is not None:
        bounds = bounds.withColumn(
            "_lo",
            F.col("_lo")
            - F.floor((F.col("_lo") - F.lit(lo)) / step_l).cast("bigint")
            * step_l,
        )
    if hi is not None:
        bounds = bounds.withColumn(
            "_hi",
            F.col("_hi")
            + F.floor((F.lit(hi) - F.col("_hi")) / step_l).cast("bigint")
            * step_l,
        )
    grid = bounds.where(F.col("_lo") <= F.col("_hi")).select(
        # empty/inverted windows yield zero grid rows instead of a
        # sequence() direction error
        key,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_seconds))
        ).alias("_b"),
    )
    # an observed row is one where ANY value column is present; a row
    # whose values are all NULL at an observed bucket stays "observed"
    # only if the bucket existed — detect via a sentinel
    joined = grid.join(
        obs.withColumn("_obs", F.lit(True)), [key, "_b"], "left"
    ).withColumn("filled", F.col("_obs").isNull()).drop("_obs")

    # Window discipline: every frame is a RUNNING frame (unbounded
    # preceding -> current row), which WindowExec evaluates
    # incrementally in O(rows). "Next observation" comes from the same
    # running frame over a DESCENDING sort — a (current row, unbounded
    # following) frame instead would make Spark re-aggregate the
    # partition tail per row, O(rows^2) per key (measured: the whole
    # q_a8 gap-fill probe 3.6 s -> ~1 s from this change alone). Each
    # window expression is materialized exactly once — the LOCF carry
    # IS the linear fill's previous-value column — and shared windows
    # collapse into two Window nodes (one per sort direction) with one
    # shuffle.
    w_asc = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_desc = (
        Window.partitionBy(key)
        .orderBy(F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined
    need_lin = [c for c, m_ in zip(vcols, methods) if m_ == "linear"]
    need_prev = [
        c for c, m_ in zip(vcols, methods) if m_ in ("locf", "linear")
    ]
    for c in need_prev:
        v = F.col(f"_v_{c}")
        out = out.withColumn(
            f"_pv_{c}", F.last(v, ignorenulls=True).over(w_asc)
        )
    for c in need_lin:
        v = F.col(f"_v_{c}")
        out = (
            out.withColumn(
                f"_pb_{c}",
                F.last(
                    F.when(v.isNotNull(), F.col("_b")), ignorenulls=True
                ).over(w_asc),
            )
            .withColumn(
                f"_nv_{c}", F.last(v, ignorenulls=True).over(w_desc)
            )
            .withColumn(
                f"_nb_{c}",
                F.last(
                    F.when(v.isNotNull(), F.col("_b")), ignorenulls=True
                ).over(w_desc),
            )
        )

    def filled_col(vc, method):
        v = F.col(f"_v_{vc}")
        if method == "null":
            return v
        if method == "locf":
            return F.col(f"_pv_{vc}")
        pv, pb = F.col(f"_pv_{vc}"), F.col(f"_pb_{vc}")
        nv, nb = F.col(f"_nv_{vc}"), F.col(f"_nb_{vc}")
        return F.when(v.isNotNull(), v).otherwise(
            F.when(
                pv.isNotNull() & nv.isNotNull(),
                pv
                + (nv - pv)
                * ((F.col("_b") - pb).cast("double") / (nb - pb).cast("double")),
            )
        )

    return out.select(
        F.col(key),
        F.col("_b").alias(bucket_col),
        *[filled_col(c, m_).alias(c) for c, m_ in zip(vcols, methods)],
        *passthrough,
        "filled",
    )
