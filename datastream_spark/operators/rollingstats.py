"""Rolling bivariate statistics over trailing window frames.

Rolling autocorrelation (and generally rolling Pearson correlation
of a series with a lagged or paired series) is the standard
regime-change indicator on metric streams: a counter that suddenly
decorrelates from its own past, or two service metrics whose rolling
correlation collapses, is an incident signal the per-bucket
downsamplers cannot express.

The correlation is computed from EXPLICIT moment sums over the frame
(n, Sx, Sy, Sxy, Sxx, Syy -> (n*Sxy - Sx*Sy) / sqrt(...)), not the
engine's corr() aggregate, for two reasons: (a) edge semantics are
pinned by OUR formula — NULL when the frame has fewer than ``min_n``
complete pairs or a zero-variance side, instead of whatever
NaN/NULL mix an engine's implementation emits; (b) the same sums
replay verbatim in the SQL oracle, so the probe hash-gates the
arithmetic rather than two engines' private Welford variants.

Scale posture: one window pass partitioned by the series key (hash
partitioning, in-partition sort, running frames — every aggregate
below is frame-incremental so WindowExec does O(rows) work per key);
all expressions JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_autocorr(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    frame: int = 20,
    lag: int = 1,
    min_n: int = 5,
) -> DataFrame:
    """Append ``autocorr`` = rolling lag-``lag`` Pearson correlation
    of ``value_col`` over the trailing ``frame`` rows per key."""
    wo = Window.partitionBy(key_col).orderBy(*order_cols)
    wf = wo.rowsBetween(-(frame - 1), 0)
    x = F.col(value_col)
    y = F.lag(value_col, lag).over(wo)
    d = df.withColumn("_y", y)
    pair = F.col("_y").isNotNull() & x.isNotNull()
    px = F.when(pair, x)
    py = F.when(pair, F.col("_y"))
    n = F.count(px).over(wf)
    sx = F.sum(px).over(wf)
    sy = F.sum(py).over(wf)
    sxy = F.sum(px * py).over(wf)
    sxx = F.sum(px * px).over(wf)
    syy = F.sum(py * py).over(wf)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    corr = F.when(
        (n >= min_n) & (var_x > 0) & (var_y > 0),
        cov_n / F.sqrt(var_x * var_y),
    )
    return d.withColumn("autocorr", corr).drop("_y")


def rolling_slope(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    frame: int = 20,
    min_n: int = 5,
    x_unit_seconds: float = 3600.0,
) -> DataFrame:
    """Append ``slope`` / ``intercept``: trailing-frame ordinary
    least squares of ``value_col`` against TIME — the rolling trend
    detector ("this metric is climbing 0.8/hour over its last 20
    points") that pairs with rolling_autocorr's regime-change signal.

    Same doctrine as rolling_autocorr: closed-form from EXPLICIT
    frame-incremental moment sums (n, Sx, Sy, Sxy, Sxx), never an
    engine-private regr_slope(), so edge semantics are ours (NULL
    under ``min_n`` points or zero time-variance) and the identical
    sums replay in the SQL oracle.

    Conditioning: x is elapsed time since the KEY's first point (a
    partition-level ``min`` over the same window partition — no extra
    shuffle), in ``x_unit_seconds`` units. Absolute epochs would put
    x² ~ 3e18 and the (n·Sxx − Sx²) cancellation would shed ~half the
    mantissa; rebasing + hour units keeps x² small so the closed form
    stays well-conditioned at any calendar date. ``intercept`` is the
    fitted value AT the key's first point, not at epoch 0.
    """
    wo = Window.partitionBy(key_col).orderBy(*order_cols)
    wf = wo.rowsBetween(-(frame - 1), 0)
    wp = Window.partitionBy(key_col)
    t_us = F.unix_micros(F.col(ts_col))
    x = (t_us - F.min(t_us).over(wp)).cast("double") / F.lit(
        1_000_000.0 * float(x_unit_seconds)
    )
    y = F.col(value_col)
    d = df.withColumn("_x", x)
    ok = y.isNotNull()
    px = F.when(ok, F.col("_x"))
    py = F.when(ok, y)
    n = F.count(px).over(wf)
    sx = F.sum(px).over(wf)
    sy = F.sum(py).over(wf)
    sxy = F.sum(px * py).over(wf)
    sxx = F.sum(px * px).over(wf)
    den = n * sxx - sx * sx
    slope = F.when((n >= min_n) & (den > 0), (n * sxy - sx * sy) / den)
    intercept = F.when(
        (n >= min_n) & (den > 0), (sy - ((n * sxy - sx * sy) / den) * sx) / n
    )
    return (
        d.withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .drop("_x")
    )
