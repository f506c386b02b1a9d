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
