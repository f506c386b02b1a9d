"""LTTB downsampling for visualization (TimescaleDB ``lttb()`` /
``unnest(lttb(...))`` surface; Steinarsson 2013, public thesis).

Largest-Triangle-Three-Buckets picks, per output bucket, the point
forming the largest triangle with its neighbors — the standard way to
draw a million-point series with a few hundred points without losing
peaks. Two variants:

- ``lttb`` (the scale path): the parallel fixed-average variant —
  each middle bucket's candidates score against the PREVIOUS and NEXT
  bucket AVERAGES (classic LTTB scores against the previous SELECTED
  point, a sequential dependency no parallel engine can shard). Pure
  DataFrame ops: two windows inside the key's hash partition + one
  two-phase agg + an equi-join back — no Python, no global sort, and
  the per-bucket argmax compiles through ``row_number() = 1``. This is
  the formulation the q_a11 oracle replays verbatim.
- ``lttb_exact``: the classic sequential algorithm via
  ``applyInPandas`` (one series per group, vectorized numpy inside) —
  bit-faithful to the published algorithm for when a consumer demands
  it; bounded by per-series memory, so route multi-billion-point
  single series through ``lttb`` instead.

Portability discipline (what makes the probe hash-exact): feed
int-valued doubles (epoch-ms rebased to the query window, values
quantized to cents) and every bucket average is an exact-integer sum
divided once — identical IEEE results regardless of either engine's
summation order, so the argmax picks the same point everywhere.

First and last points are always kept (their buckets are singletons);
a series with <= n_out points passes through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lttb", "lttb_exact"]


def lttb(
    df: DataFrame,
    n_out: int,
    key: str = "stream_id",
    x_col: str = "x",
    y_col: str = "y",
    tiebreak: str | None = None,
) -> DataFrame:
    """Parallel fixed-average LTTB: downsample each key's series to at
    most ``n_out`` points. Returns (key, bucket, x, y).

    ``tiebreak`` names a column making the per-key point order total
    when ``x`` can repeat (and breaking equal-area ties the same way
    on both engines)."""
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first, last, one middle)")
    order = [F.col("_x")] + ([F.col(tiebreak)] if tiebreak else [])
    w_ord = Window.partitionBy(key).orderBy(*order)
    w_key = Window.partitionBy(key)
    base = (
        df.select(
            F.col(key),
            F.col(x_col).cast("double").alias("_x"),
            F.col(y_col).cast("double").alias("_y"),
            *([F.col(tiebreak)] if tiebreak else []),
        )
        .withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_n", F.count("*").over(w_key))
    )
    rn, n = F.col("_rn"), F.col("_n")
    mid = 1 + F.floor(
        ((rn - 2) * (n_out - 2)).cast("double") / (n - 2)
    ).cast("bigint")
    bucket = (
        F.when(n <= n_out, rn - 1)
        .when(rn == 1, F.lit(0))
        .when(rn == n, F.lit(n_out - 1))
        .otherwise(mid)
        .cast("bigint")
    )
    pts = base.withColumn("_b", bucket)

    stats = pts.groupBy(key, "_b").agg(
        F.avg("_x").alias("_ax"), F.avg("_y").alias("_ay")
    )
    w_b = Window.partitionBy(key).orderBy("_b")
    stats = (
        stats.withColumn("_pax", F.lag("_ax").over(w_b))
        .withColumn("_pay", F.lag("_ay").over(w_b))
        .withColumn("_nax", F.lead("_ax").over(w_b))
        .withColumn("_nay", F.lead("_ay").over(w_b))
        .drop("_ax", "_ay")
    )
    scored = pts.join(stats, [key, "_b"]).withColumn(
        "_area",
        F.when(
            F.col("_pax").isNotNull() & F.col("_nax").isNotNull(),
            F.abs(
                (F.col("_pax") - F.col("_nax")) * (F.col("_y") - F.col("_pay"))
                - (F.col("_pax") - F.col("_x"))
                * (F.col("_pay") - F.col("_nay"))
            ),
        ),
    )
    pick_order = [F.col("_area").desc_nulls_last(), F.col("_x")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w_pick = Window.partitionBy(key, "_b").orderBy(*pick_order)
    return (
        scored.withColumn("_pick", F.row_number().over(w_pick))
        .where(F.col("_pick") == 1)
        .select(
            F.col(key),
            F.col("_b").alias("bucket"),
            F.col("_x").alias(x_col),
            F.col("_y").alias(y_col),
        )
    )


def lttb_exact(
    df: DataFrame,
    n_out: int,
    key: str = "stream_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Classic sequential LTTB (previous SELECTED point anchors each
    triangle), one series per Arrow group. Returns (key, bucket, x, y)."""
    if n_out < 3:
        raise ValueError("n_out must be >= 3")

    # preserve the key's ORIGINAL dtype — the parallel variant does,
    # and a silently-stringified key would break joins back to source
    key_type = df.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, bucket long, {x_col} double, {y_col} double"
    )

    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(x_col)
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(x)
        k = pdf[key].iloc[0]
        if n <= n_out:
            return pd.DataFrame(
                {key: k, "bucket": np.arange(n), x_col: x, y_col: y}
            )
        # bucket edges over the middle n-2 points, n_out-2 buckets
        edges = 1 + np.floor(
            np.arange(n_out - 1) * (n - 2) / (n_out - 2)
        ).astype(int)
        sel = [0]
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            if i == n_out - 3:
                # final middle bucket anchors on the LAST point itself
                ax, ay = x[n - 1], y[n - 1]
            else:
                nlo, nhi = edges[i + 1], edges[i + 2]
                ax = x[nlo:nhi].mean() if nhi > nlo else x[n - 1]
                ay = y[nlo:nhi].mean() if nhi > nlo else y[n - 1]
            px, py = x[sel[-1]], y[sel[-1]]
            area = np.abs(
                (px - ax) * (y[lo:hi] - py) - (px - x[lo:hi]) * (py - ay)
            )
            sel.append(lo + int(np.argmax(area)))
        sel.append(n - 1)
        return pd.DataFrame(
            {
                key: k,
                "bucket": np.arange(len(sel)),
                x_col: x[np.array(sel)],
                y_col: y[np.array(sel)],
            }
        )

    src = df.select(
        F.col(key),
        F.col(x_col).cast("double"),
        F.col(y_col).cast("double"),
    )
    return src.groupBy(key).applyInPandas(run, schema=out_schema)
