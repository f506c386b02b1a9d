"""Rollup routing: answer an arbitrary time-range aggregate from the
materialized granularity ladder instead of scanning raw datapoints —
the "hypertable rollup" query path (SURVEY.md §4: the reference's
pre-materialized ladder re-used as OUR layer's routing logic; no
reference citation — the reference only reads one granularity at a
time via get_data, datastream/api.py:~500).

Given a half-open range ``[start, end)`` aligned to the finest
available level, ``range_cover`` decomposes it into the MINIMAL set of
ladder buckets — coarse levels for the interior, progressively finer
levels for the ragged edges. Because every ladder duration divides the
next (10 | 60 | 600 | 3600 | 21600 | 86400), the greedy
coarsest-first cover is exact and produces at most TWO contiguous
segments per level (one per edge), so a month-long query reads ~25 day
rows + a handful of edge rows instead of the raw fact table.

All merge-form statistics (count/sum/min/max/sum_squares and the time
downsamplers) combine exactly across segments (SURVEY.md §1.4
decomposability), so the routed answer is IDENTICAL to aggregating raw
— pinned by the q_a5_rollup_route oracle probe, whose DuckDB twin
aggregates the raw table directly.

Scale notes (100 TB posture): the routed plan reads O(range/coarsest +
levels) rollup rows — independent of raw datapoint count; each
segment's ``bucket_epoch`` range filter rides the rollup tables'
``p_date`` partitioning (the store path emits literal date predicates);
and the whole answer is ONE shuffle (the final per-stream hash-agg over
a few hundred merged rows), regardless of how many levels contribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import finish_columns, merge_rollup_aggs

#: The merge-form columns every level frame must carry (rollup.py
#: raw_rollup_aggs/merge_rollup_aggs output shape).
MERGE_COLS = [
    "v_count",
    "v_sum",
    "v_min",
    "v_max",
    "v_sum_squares",
    "t_count",
    "t_first",
    "t_last",
    "t_sum_micros",
]


def range_cover(
    start: int, end: int, durations
) -> list[tuple[int, int, int]]:
    """Decompose ``[start, end)`` (epoch seconds) into aligned ladder
    segments ``(duration, lo, hi)``, coarsest-possible-first.

    Requires: each duration divides every coarser one (true for the
    ladder), and start/end are multiples of the finest duration.
    Properties (property-tested): segments are disjoint, each aligned
    to its own duration, their concatenation is exactly ``[start,
    end)``, and no two adjacent same-level segments could merge into a
    coarser bucket (minimality).
    """
    ds = sorted({int(d) for d in durations}, reverse=True)
    if not ds:
        raise ValueError("range_cover needs at least one duration")
    finest = ds[-1]
    if start % finest or end % finest:
        raise ValueError(
            f"range [{start}, {end}) not aligned to finest duration {finest}"
        )
    for coarse, fine in zip(ds, ds[1:]):
        if coarse % fine:
            raise ValueError(f"duration {fine} does not divide {coarse}")
    segs: list[tuple[int, int, int]] = []

    def cover(lo: int, hi: int, idx: int) -> None:
        if lo >= hi:
            return
        d = ds[idx]
        if idx == len(ds) - 1:
            segs.append((d, lo, hi))
            return
        ilo = -(-lo // d) * d  # ceil to alignment
        ihi = (hi // d) * d  # floor to alignment
        if ilo < ihi:
            segs.append((d, ilo, ihi))
            cover(lo, ilo, idx + 1)
            cover(ihi, hi, idx + 1)
        else:
            cover(lo, hi, idx + 1)

    cover(int(start), int(end), 0)
    return sorted(segs, key=lambda s: s[1])


def segment_union(
    level_frames: dict[int, DataFrame],
    start: int,
    end: int,
    key: str = "stream_id",
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """Union of merge-form rows covering ``[start, end)``, routed per
    ``range_cover``. Each frame in ``level_frames`` maps a level
    duration (seconds) to that level's rollup (must carry
    ``bucket_col`` + MERGE_COLS; buckets must be COMPLETE for the
    covered range). Returns unaggregated rows — callers merge with one
    ``groupBy(key)`` (see ``route_range_aggregate``), so several
    segment unions (e.g. per stream-group) can share a single final
    shuffle."""
    segs = range_cover(start, end, level_frames.keys())
    # ONE disjunctive filter per level, not one branch per segment:
    # range_cover emits up to two ragged-edge segments plus an
    # interior per level, and a per-segment `where` re-plans the
    # level's ENTIRE subtree each time (for ladder frames built from
    # raw that is a full scan+agg per segment — measured 22 scans /
    # 24 exchanges on q_a5). Segments are pairwise disjoint, so the
    # OR'd filter over one copy of the frame yields the exact same
    # row multiset, and the range predicates still push down to the
    # scan (Spark prunes on OR-of-ranges).
    by_level: dict[int, list[tuple[int, int]]] = {}
    for d, lo, hi in segs:
        by_level.setdefault(d, []).append((lo, hi))
    parts = []
    for d, ranges in by_level.items():
        cond = None
        for lo, hi in ranges:
            c = (F.col(bucket_col) >= lo) & (F.col(bucket_col) < hi)
            cond = c if cond is None else (cond | c)
        parts.append(level_frames[d].where(cond).select(key, *MERGE_COLS))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def route_range_aggregate(
    level_frames: dict[int, DataFrame],
    start: int,
    end: int,
    key: str = "stream_id",
    bucket_col: str = "bucket_epoch",
) -> DataFrame:
    """Range aggregate ``[start, end)`` per ``key``, answered from the
    ladder: minimal bucket cover -> merge-form union -> ONE hash-agg ->
    finished statistics (v_mean/v_std_dev/t_mean). Output is identical
    to aggregating raw datapoints over the same range (oracle probe
    q_a5_rollup_route)."""
    u = segment_union(level_frames, start, end, key=key, bucket_col=bucket_col)
    return finish_columns(u.groupBy(key).agg(*merge_rollup_aggs()))
