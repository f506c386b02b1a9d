"""Binned range join: point-in-interval joins that scale.

Extended relational surface (SURVEY.md §2.3 — the reference has no
general joins; range/interval joins are declared free-with-Spark, but
Spark's own physical strategy for a pure inequality join is
BroadcastNestedLoop or a cartesian product, both of which die at scale).

The standard fix (cf. interval-join implementations in Flink and the
range-join bin optimization in the Spark ecosystem, public literature):
quantize time into fixed-width bins; each interval row is exploded to
every bin it covers, each point row keys to exactly one bin, and the
join becomes an EQUI-join on bin id followed by the exact predicate.
A (point, interval) match is found in precisely one bin — the point's
own — so no dedup pass is needed.

Scale properties: the shuffle keys on bin id (time-uniform, so skew
tracks event-rate skew, handled by AQE); interval explosion factor is
ceil(interval_len / bin_width) + 1, so pick bin_width ~ median interval
length; both sides prune columns before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_s: int = 86_400,
) -> DataFrame:
    """Inner-join point rows to interval rows where
    ``start_ts <= point_ts < end_ts`` (half-open, the time-window
    convention used across this engine).

    ``points`` and ``intervals`` must not share column names (alias
    beforehand). Outer variants compose from this plus an anti-join
    add-back; binning alone cannot express them (an unmatched interval
    would surface once per covered bin)."""
    w = int(bin_width_s)

    def epoch(c: str):
        # NTZ-tolerant: cast is value-preserving under the engine-wide
        # UTC session timezone
        return F.unix_micros(F.col(c).cast("timestamp")) / 1_000_000

    p_bin = (epoch(point_ts) / w).cast("bigint")
    i_start = epoch(start_ts)
    i_end = epoch(end_ts)
    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (i_start / w).cast("bigint"),
                # end is exclusive, but a point in the same bin as the
                # end can still precede it — cover the end's bin too
                (i_end / w).cast("bigint"),
            )
        ),
    )
    cond = (
        (p["_bin"] == i["_bin"])
        & (p[point_ts] >= i[start_ts])
        & (p[point_ts] < i[end_ts])
    )
    return p.join(i, cond, "inner").drop("_bin")
