"""Stream-stream time-interval joins (Structured Streaming's
watermarked two-sided join, packaged with this engine's conventions).

The one continuous-join shape a telemetry/curation pipeline actually
needs: "right events that happen on the same key within
``max_delay_seconds`` AFTER a left event" — click→purchase
attribution, request→response pairing, probe→ack matching. Spark's
native stream-stream inner join handles it with state bounded BY THE
WATERMARK: each side buffers only rows younger than the watermark
minus the join window, and the event-time range condition is what
lets the state store evict (an unconstrained stream-stream join would
buffer both streams forever — Spark rejects it without a watermark +
time bound, and so does this wrapper, loudly and earlier).

Emission (inner join): a pair emits as soon as both rows have
arrived — the watermark bounds STATE, not emission latency, so
batch/stream parity is total for the inner join and the parity test
pins it through an actual stream. Outer variants additionally wait
for the watermark to prove absence; they inherit the same condition
via ``how=``.

Columns come back suffixed (``suffixes``) like interval_overlap_join,
so the two streams may share names freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_interval_join"]


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_ts: str = "ts",
    r_ts: str = "ts",
    max_delay_seconds: int = 1800,
    watermark_seconds: int = 3600,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Join right rows to left rows on ``key`` where
    ``l_ts <= r_ts <= l_ts + max_delay_seconds`` (the attribution
    window). Works on two streams (watermarked, bounded state), a
    stream and a batch frame, or two batch frames — the same
    expression, which is what the parity test exploits.

    State bound: each side keeps ~(watermark + delay) seconds of rows
    per key partition; late rows beyond ``watermark_seconds`` are
    dropped by Spark's watermark discipline, exactly like the rollup
    streams.
    """
    if max_delay_seconds <= 0:
        raise ValueError("streaming_interval_join: max_delay_seconds must be > 0")
    if watermark_seconds <= 0:
        raise ValueError("streaming_interval_join: watermark_seconds must be > 0")
    sl, sr = suffixes
    if not sl or not sr or sl == sr:
        raise ValueError("streaming_interval_join: need two distinct suffixes")

    lw = left.select([F.col(c).alias(c + sl) for c in left.columns])
    rw = right.select([F.col(c).alias(c + sr) for c in right.columns])
    if lw.isStreaming:
        lw = lw.withWatermark(l_ts + sl, f"{int(watermark_seconds)} seconds")
    if rw.isStreaming:
        rw = rw.withWatermark(r_ts + sr, f"{int(watermark_seconds)} seconds")

    lts, rts = F.col(l_ts + sl), F.col(r_ts + sr)
    cond = (
        (F.col(key + sl) == F.col(key + sr))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS"))
    )
    return lw.join(rw, cond, how)
