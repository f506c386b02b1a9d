"""Time-weighted aggregation (TimescaleDB ``time_weight('locf')`` /
monitoring-system TWA parity).

A plain AVG over a bucket weights every datapoint equally; a sensor
that reports every second while healthy and every 10 minutes while
degraded biases plain AVG toward the healthy samples. The
time-weighted average integrates the LOCF step function instead: each
point holds its value until the next point, and the bucket's TWA is
∫value·dt / covered-time.

Formulation (the part that matters for Spark): the naive mergeable
state (first/last point + inner integral per bucket) needs ORDERED
combination — bridging integrals depend on which neighbor merges next,
and Spark's aggregate combine order is arbitrary. Instead each LOCF
segment ``[t_i, t_{i+1})`` is split analytically over the grid buckets
it overlaps (``sequence`` + ``explode`` of its bucket range — exact,
and ORDER-INSENSITIVE: a segment's contribution to a bucket is a pure
function of the segment), then one two-phase hash agg sums
``value·overlap`` per (key, bucket). Segments rarely span more than a
couple of buckets at sane granularities, so the explode factor is ~1.

Output per (key, bucket): ``twa`` = Σ v·dt / Σ dt over the covered
portion of the bucket, plus ``covered_us`` so callers can distinguish
a fully-covered bucket from a sliver. The trailing point extends to
the end of its own bucket (it has no successor to bridge to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_weighted_avg"]


def time_weighted_avg(
    df: DataFrame,
    step_seconds: int,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact LOCF time-weighted average on the ``step_seconds`` grid.

    One window (lead within the key's hash partition) + one narrow
    explode + one two-phase hash agg — no global sort, no Python.
    ``tiebreak`` names a column making the per-key point order TOTAL
    when timestamps can repeat (equal-ts points otherwise pair with
    their successor nondeterministically; the zero-length segment is
    dropped either way, but WHICH value extends differs).
    """
    step_us = step_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    order = [F.col("_t")] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    cols = [F.col(key), us.alias("_t"), F.col(value_col).alias("_v")]
    if tiebreak:
        cols.append(F.col(tiebreak))
    seg = (
        df.select(*cols)
        .withColumn("_tn", F.lead("_t").over(w))
        .withColumn(
            "_te",
            # trailing point: extend to the end of its own bucket
            F.coalesce(
                F.col("_tn"),
                (F.floor(F.col("_t") / step_us) + 1) * step_us,
            ),
        )
        .where(F.col("_te") > F.col("_t"))
    )
    b0 = F.floor(F.col("_t") / step_us)
    b1 = F.floor((F.col("_te") - 1) / step_us)
    spans = seg.select(
        key,
        "_t",
        "_te",
        "_v",
        F.explode(F.sequence(b0, b1)).alias("_b"),
    )
    ov = F.least(F.col("_te"), (F.col("_b") + 1) * step_us) - F.greatest(
        F.col("_t"), F.col("_b") * step_us
    )
    return (
        spans.select(key, "_b", "_v", ov.alias("_ov"))
        .groupBy(key, F.col("_b"))
        .agg(
            (F.sum(F.col("_v") * F.col("_ov")) / F.sum("_ov")).alias("twa"),
            F.sum("_ov").alias("covered_us"),
        )
        .select(
            key,
            (F.col("_b") * step_seconds).cast("bigint").alias("bucket_epoch"),
            "twa",
            "covered_us",
        )
    )
