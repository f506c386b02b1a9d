"""Derive operators: per-stream ordered stateful transforms as windows.

Parity target: the derive-operator registry and classes
(datastream/backends/mongodb.py:~1500-1900, exposed via
``ensure_stream(derive_op=...)`` api.py:~300 — SURVEY.md §2.5 W1-W4).

Every operator here is a Spark window expression over
``PARTITION BY stream ORDER BY ts`` — no Python in the hot path, no
driver-side iteration. At 100 TB the window shuffle partitions by
stream key, which is exactly the reference's per-stream state machine
re-expressed set-oriented; skewed streams are the one watch item
(mitigate by bucketing the fact table by stream_id so the sort is
partial-sort-free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..granularity import Granularity, bucket_epoch

DERIVE_OPERATORS = ["sum", "derivative", "counter_reset", "counter_derivative"]

#: User-registered derive operators (SURVEY §2.10: the extension
#: surface the reference lacks — a custom op is any function from the
#: source rows to (ts, value) rows, typically a window expression or
#: an ``applyInPandas`` per stream-group).
CUSTOM_DERIVE_OPS: dict[str, "CustomDeriveOp"] = {}


class CustomDeriveOp:
    """``fn(srcs, granularity, args) -> DataFrame(ts, value)`` over the
    union of the source streams' rows (stream_id, ts, value).

    ``tail_safe`` declares that the op's output at time t depends only
    on rows at t and at most ONE immediately-preceding row per source
    (the lag contract the built-ins satisfy) — what the engine needs
    to recompute only the changed tail (W5). Ops without it recompute
    in full on every source append (correct, just not incremental)."""

    def __init__(self, name, fn, tail_safe=False):
        self.name = name
        self.fn = fn
        self.tail_safe = tail_safe


def register_derive_op(name: str, fn, tail_safe: bool = False) -> None:
    from ..exceptions import UnsupportedDeriveOperator

    if name in DERIVE_OPERATORS:
        raise UnsupportedDeriveOperator(f"{name} is a built-in derive op")
    CUSTOM_DERIVE_OPS[name] = CustomDeriveOp(name, fn, tail_safe=tail_safe)


def unregister_derive_op(name: str) -> None:
    CUSTOM_DERIVE_OPS.pop(name, None)


def _w(key, order="ts"):
    keys = [key] if isinstance(key, str) else list(key)
    return Window.partitionBy(*keys).orderBy(order)


def stream_sum(
    sources: list[DataFrame],
    granularity: Granularity,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """W1: multi-stream ``sum`` derive op (mongodb.py:~1550 [MED]).

    Aligns N source streams on bucket-rounded timestamps at the derived
    granularity and sums present contributions (missing sources are
    absent, not null-poisoning — reference sums over present values).
    Spark-first: unionByName + one groupBy — a many-way temporal
    equi-join with NO join node and a single shuffle.
    """
    d = granularity.duration_in_seconds()
    cols = [key, ts, value]
    unioned = sources[0].select(*cols)
    for s in sources[1:]:
        unioned = unioned.unionByName(s.select(*cols))
    return unioned.groupBy(
        bucket_epoch(F.col(ts), d).alias("bucket_epoch")
    ).agg(F.sum(F.col(value)).alias("value"))


def derivative(
    df: DataFrame, key: str = "stream_id", value: str = "value", ts: str = "ts"
) -> DataFrame:
    """W2: dv/dt between consecutive datapoints (mongodb.py:~1650 [MED]).

    First point of each stream emits nothing; a null value resets the
    pair (no rate across a null).
    """
    w = _w(key, ts)
    prev_v = F.lag(value).over(w)
    prev_t = F.lag(ts).over(w)
    dt = F.unix_micros(F.col(ts)) - F.unix_micros(prev_t)
    rate = (F.col(value) - prev_v) / (dt / F.lit(1_000_000.0))
    return (
        df.withColumn("_rate", rate)
        .where(F.col("_rate").isNotNull())
        .withColumn("value_rate", F.col("_rate"))
        .drop("_rate")
    )


def counter_reset(
    df: DataFrame, key: str = "stream_id", value: str = "value", ts: str = "ts"
) -> DataFrame:
    """W3: emit 1 whenever the counter decreases (mongodb.py:~1700 [MED])."""
    w = _w(key, ts)
    prev_v = F.lag(value).over(w)
    return (
        df.withColumn("_prev", prev_v)
        .where(F.col("_prev").isNotNull() & (F.col(value) < F.col("_prev")))
        .withColumn("reset", F.lit(1))
        .drop("_prev")
    )


def counter_derivative(
    df: DataFrame,
    max_value: float | None = None,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """W4: rate of a monotonic counter with optional wrap correction
    (mongodb.py:~1800 [MED]).

    With ``max_value``: a decrease is a wrap, corrected as
    ``v + max_value - v_prev``. Without: negative deltas are discarded
    (reference drops them [MED]; pinned by oracle probe Q-W4).
    """
    w = _w(key, ts)
    prev_v = F.lag(value).over(w)
    prev_t = F.lag(ts).over(w)
    dt_s = (F.unix_micros(F.col(ts)) - F.unix_micros(prev_t)) / F.lit(1_000_000.0)
    delta = F.col(value) - prev_v
    if max_value is not None:
        delta = F.when(F.col(value) < prev_v, delta + F.lit(float(max_value))).otherwise(
            delta
        )
    out = df.withColumn("_delta", delta).withColumn("_dt", dt_s)
    out = out.where(F.col("_delta").isNotNull())
    if max_value is None:
        out = out.where(F.col("_delta") >= 0)
    return (
        out.withColumn("value_rate", F.col("_delta") / F.col("_dt"))
        .drop("_delta", "_dt")
    )


def apply_reset_stream(
    df: DataFrame,
    resets: DataFrame,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """Reset-stream companion for W4 (J2 as-of semantics,
    mongodb.py:~1800 derive_args reset stream [MED]).

    Marks each datapoint with the count of reset markers seen so far so
    that the wrap/delta logic can refuse to differentiate across a
    reset boundary. Implemented as union + running conditional count —
    the as-of join with no join node (single shuffle on the stream key).
    """
    left = df.select(key, ts, value).withColumn("_is_reset", F.lit(0))
    right = resets.select(
        F.col(key), F.col(ts), F.lit(None).cast("double").alias(value)
    ).withColumn("_is_reset", F.lit(1))
    merged = left.unionByName(right)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_is_reset").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("reset_epoch", F.sum("_is_reset").over(w))
        .where(F.col("_is_reset") == 0)
        .drop("_is_reset")
    )


def counter_increase(
    df: DataFrame,
    step_seconds: int,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
    reset_as_restart: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """W4 extended (PromQL ``increase()`` flavor): total counter growth
    per grid bucket — Σ of per-sample deltas, where a decrease is a
    counter restart contributing the post-reset value itself
    (``reset_as_restart=True``, Prometheus semantics) or contributing
    nothing (False — pure discard, matching ``counter_derivative``'s
    no-max_value contract).

    One lag window inside the key's hash partition + one two-phase hash
    agg; deltas are attributed to the bucket of their LATER sample (the
    standard right-closed attribution). First sample of a stream
    contributes nothing (no baseline).

    Output: (key, bucket_epoch, increase DOUBLE, n_resets BIGINT).
    ``tiebreak`` makes the per-key sample order total when timestamps
    can repeat (otherwise equal-ts deltas pair nondeterministically).
    """
    w = (
        Window.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
        if tiebreak
        else _w(key, ts)
    )
    bucket = (
        F.floor(F.unix_micros(F.col(ts)) / F.lit(step_seconds * 1_000_000))
        * step_seconds
    ).cast("bigint")
    # materialize the lag BEFORE filtering: a window expression
    # referenced after .where() re-evaluates over the FILTERED
    # partition, silently shifting every delta by one row
    prev = df.withColumn("_prev", F.lag(value).over(w)).where(
        F.col("_prev").isNotNull()
    )
    delta = F.col(value) - F.col("_prev")
    contrib = F.when(delta >= 0, delta).otherwise(
        F.col(value) if reset_as_restart else F.lit(None)
    )
    marked = prev.withColumn("_c", contrib).withColumn(
        "_r", (F.col(value) < F.col("_prev")).cast("long")
    )
    return (
        marked.groupBy(F.col(key), bucket.alias("bucket_epoch"))
        .agg(
            F.sum("_c").alias("increase"),
            F.sum("_r").alias("n_resets"),
        )
    )


def rolling_quantile(
    df: DataFrame,
    q: float,
    window_points: int,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
    out_col: str = "rq",
) -> DataFrame:
    """Trailing-window exact quantile per point (sliding median at
    q=0.5 — the classic robust smoother monitoring UIs overlay).

    ``percentile`` (Spark's interpolating exact aggregate, ==
    SQL ``quantile_cont`` — the q_a4-pinned equivalence) evaluated
    over a BOUNDED row frame inside the key's hash partition: O(window)
    work per row, no global sort, no Python. Early rows aggregate the
    partial frame (same as pandas rolling(min_periods=1).quantile).
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    if window_points < 1:
        raise ValueError("window_points must be >= 1")
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(window_points - 1), 0)
    )
    return df.withColumn(
        out_col, F.expr(f"percentile({value_col}, {q!r})").over(w)
    )
