"""Exponentially-weighted moving average (pandas ``ewm(alpha=...,
adjust=False)`` / monitoring-system EMA parity).

The recurrence ``y_i = a*x_i + (1-a)*y_{i-1}``, ``y_0 = x_0`` is
inherently sequential — the textbook Spark rewrite (running sum of
``x_j * (1-a)^(-j)`` rescaled by ``(1-a)^i``) overflows doubles after
a few hundred rows because the scaling factors grow exponentially.
Two scale-sane forms instead:

- ``ewma`` (the distributed path): the TRUNCATED closed form over a
  bounded trailing window of ``lookback`` points —
  ``y_i = sum_k w_k x_{i-k}`` with ``w_k = a(1-a)^k`` and the oldest
  retained term absorbing the entire remaining mass when the window
  reaches back to the series start (making the result EXACT for the
  first ``lookback`` rows, and off by at most ``(1-a)^lookback *
  max|x|`` after — 3e-14 relative at a=0.5, lookback=64). One bounded
  collect_list window inside the key's hash partition + a JVM
  ``aggregate`` fold; O(lookback) per row, no Python, no global sort,
  and the fold order is identical to DuckDB's ``list_sum`` so the
  q_a12 probe is hash-exact at a=0.5 (whose powers are exact
  doubles).
- ``ewma_exact``: the literal recurrence per series via
  ``applyInPandas`` (vectorized lfilter-style scan) for consumers that
  need the infinite-memory form bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ewma", "ewma_exact"]


def ewma(
    df: DataFrame,
    alpha: float,
    lookback: int = 64,
    key: str = "stream_id",
    order_col: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col``: the truncated-closed-form EWMA of
    ``value_col`` over each key's series ordered by ``order_col``
    (+ ``tiebreak`` for a total order when the order column repeats)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if lookback < 1:
        raise ValueError("lookback must be >= 1")
    order = [F.col(order_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w_arr = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(lookback - 1), 0)
    )
    w_rn = Window.partitionBy(key).orderBy(*order)
    base = df.withColumn(
        "_arr", F.collect_list(F.col(value_col).cast("double")).over(w_arr)
    ).withColumn("_rn", F.row_number().over(w_rn))
    a = float(alpha)
    # oldest term: full residual mass (1-a)^(L-1) while the window
    # still reaches the series start, else the truncated a*(1-a)^(L-1)
    first_w = F.when(
        F.col("_rn") <= lookback,
        F.pow(F.lit(1.0 - a), F.size("_arr") - 1),
    ).otherwise(F.lit(a) * F.pow(F.lit(1.0 - a), F.size("_arr") - 1))
    y = F.aggregate(
        F.sequence(F.lit(1), F.size("_arr")),
        F.lit(0.0),
        lambda acc, k: acc
        + F.element_at(F.col("_arr"), k)
        * F.when(k == 1, first_w).otherwise(
            F.lit(a) * F.pow(F.lit(1.0 - a), F.size("_arr") - k)
        ),
    )
    return base.withColumn(out_col, y).drop("_arr", "_rn")


def ewma_exact(
    df: DataFrame,
    alpha: float,
    key: str = "stream_id",
    order_col: str = "ts",
    value_col: str = "value",
    out_col: str = "ewma",
) -> DataFrame:
    """The literal recurrence per series (infinite memory), one Arrow
    group per key. Returns (key, order_col, value_col, out_col)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")

    fields = df.select(key, order_col, value_col).schema
    # per-field DDL join — a global ':'->' ' replace over simpleString
    # would corrupt nested types (struct<a:int> keys)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields.fields
    ) + f", {out_col} double"

    def run(pdf):
        pdf = pdf.sort_values(order_col).copy()
        x = pdf[value_col].to_numpy(dtype="float64")
        y = x.copy()
        for i in range(1, len(y)):
            y[i] = alpha * x[i] + (1.0 - alpha) * y[i - 1]
        pdf[out_col] = y
        return pdf

    return df.select(key, order_col, value_col).groupBy(key).applyInPandas(
        run, schema=out_schema
    )


def holt_forecast(
    df: DataFrame,
    alpha: float,
    beta: float,
    key: str = "stream_id",
    order_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Holt double-exponential smoothing per key — the forecasting
    verb the window family lacks: EWMA tracks level only; Holt carries
    (level, trend) and extrapolates:

        l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1},   l_0 = x_0, b_0 = 0

    Output: one row per key — (key, n, level, trend, forecast_1) where
    ``forecast_1 = level + trend`` is the one-step-ahead prediction.

    Execution: the recurrence is inherently sequential, so each key's
    series folds ONCE, JVM-side — collect_list of (order, value)
    structs, ``sort_array`` (structs order lexicographically, so the
    fold order is the total (order_col, value) order), then a single
    ``F.aggregate`` with a (l, b) struct accumulator. No Python in
    the loop, no window at all; the shuffle is one hash partition per
    key. DuckDB replays the identical left-fold via
    ``list_reduce(list_transform(...))``, and since both engines fold
    the same doubles in the same order the q_a16 probe floor-gates
    the final state with zero tolerance.

    Boundary (documented, same as ``ewma_exact``): the whole series
    materializes as one array per key, so run it at a rolled-up
    granularity for very long series — forecasting off the rollup
    ladder is the intended composition, not a limitation.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not 0.0 <= beta <= 1.0:
        raise ValueError("beta must be in [0, 1]")
    a, b = float(alpha), float(beta)
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    # NULL observations carry no signal — struct-wrapped collect_list
    # would RETAIN them (unlike ewma's bare collect_list) and one NULL
    # would poison the whole key's fold; a NULL order would sort first
    # and silently become the init element.
    series = (
        df.where(
            F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
        )
        .groupBy(key)
        .agg(arr.alias("_arr"))
    )

    def step(acc, e):
        # l_new recomputed inline in BOTH uses so the float chain is
        # byte-identical to the SQL replay (which also inlines it).
        l_new = F.lit(a) * e["v"] + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        b_new = F.lit(b) * (
            (F.lit(a) * e["v"] + F.lit(1.0 - a) * (acc["l"] + acc["b"]))
            - acc["l"]
        ) + F.lit(1.0 - b) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    init = F.struct(
        F.element_at("_arr", 1)["v"].alias("l"), F.lit(0.0).alias("b")
    )
    folded = F.aggregate(
        F.slice("_arr", 2, F.greatest(F.size("_arr") - 1, F.lit(0))),
        init,
        step,
    )
    return series.select(
        key,
        F.size("_arr").cast("long").alias("n"),
        folded["l"].alias("level"),
        folded["b"].alias("trend"),
        (folded["l"] + folded["b"]).alias("forecast_1"),
    )
