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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width_s: int = 86_400,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Inner-join interval rows to interval rows where the CLOSED
    intervals overlap: ``l_start <= r_end AND r_start <= l_end``
    (inclusive both ends — two intervals touching at one instant
    match, the same convention as the concurrency sweep).

    Spark's physical strategy for a pure inequality-pair join is a
    nested-loop product; the binned rewrite makes it an EQUI-join:
    each side explodes to the bins its interval covers, bins equi-
    join, the exact predicate filters — and each overlapping pair
    survives in exactly ONE bin, the bin of ``greatest(l_start,
    r_start)`` (the overlap's first instant), so no dedup pass ever
    runs. That once-only filter is what keeps the operator's output
    identical to the naive θ-join at any bin width.

    ALL columns come back suffixed (``suffixes``), so the inputs may
    share names freely. Rows with ``end < start`` (empty intervals)
    are dropped on each side before binning — ``sequence()`` would
    otherwise walk backwards. Pick ``bin_width_s`` near the median
    interval length: explosion factor is ceil(len/width)+1 per row,
    and the shuffle keys on (time-uniform) bin ids, so skew tracks
    interval-density skew, handled by AQE.
    """
    sl, sr = suffixes
    if not sl or not sr or sl == sr:
        raise ValueError("interval_overlap_join: need two distinct suffixes")
    w = int(bin_width_s)

    def epoch(col: F.Column):
        return F.unix_micros(col.cast("timestamp"))

    lw = left.select([F.col(c).alias(c + sl) for c in left.columns])
    rw = right.select([F.col(c).alias(c + sr) for c in right.columns])
    ls, le = F.col(l_start + sl), F.col(l_end + sl)
    rs, re_ = F.col(r_start + sr), F.col(r_end + sr)
    w_us = w * 1_000_000

    lb = lw.where(le >= ls).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(epoch(ls) / w_us), F.floor(epoch(le) / w_us)
            )
        ),
    )
    rb = rw.where(re_ >= rs).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(epoch(rs) / w_us), F.floor(epoch(re_) / w_us)
            )
        ),
    )
    first_overlap_bin = F.floor(epoch(F.greatest(ls, rs)) / w_us)
    return (
        lb.join(rb, "_bin", "inner")
        .where((ls <= re_) & (rs <= le))
        .where(F.col("_bin") == first_overlap_bin)
        .drop("_bin")
    )
