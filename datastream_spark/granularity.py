"""The fixed 7-level granularity ladder.

Parity target: datastream/api.py:~60-200 class Granularity (SURVEY.md
§1.1 [HIGH]): Seconds(1) > Seconds10(10) > Minutes(60) > Minutes10(600)
> Hours(3600) > Hours6(21600) > Days(86400), each with
``round_timestamp`` (floor to bucket) and ``duration_in_seconds``.

Spark-side the ladder is a cascade of tumbling windows; bucket floor is
``timestamp_seconds(floor(unix_micros(ts) / (d*1e6)) * d)`` which we
keep portable (same arithmetic DuckDB can run: ``floor(epoch(ts)/d)*d``).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from functools import total_ordering

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Granularity", "GRANULARITIES", "bucket_epoch", "bucket_ts"]


@total_ordering
@dataclass(frozen=True)
class Granularity:
    """One level of the ladder. Finer granularity sorts *greater*,
    matching the reference's ordering (highest_granularity = finest)."""

    name: str
    seconds: int

    def duration_in_seconds(self) -> int:
        return self.seconds

    def round_timestamp(self, ts: _dt.datetime) -> _dt.datetime:
        """Floor a (UTC) datetime to this granularity's bucket start."""
        if ts.tzinfo is not None:
            ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        epoch = ts.replace(tzinfo=_dt.timezone.utc).timestamp()
        floored = (int(epoch) // self.seconds) * self.seconds
        return _dt.datetime.fromtimestamp(floored, _dt.timezone.utc).replace(
            tzinfo=None
        )

    # Finer (smaller duration) == "higher" granularity; reference orders
    # Seconds > Days, so invert the duration comparison.
    def __lt__(self, other: "Granularity") -> bool:
        return self.seconds > other.seconds

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Granularity) and self.seconds == other.seconds

    def __hash__(self) -> int:
        return hash((self.name, self.seconds))


class _Ladder:
    Seconds = Granularity("seconds", 1)
    Seconds10 = Granularity("10seconds", 10)
    Minutes = Granularity("minutes", 60)
    Minutes10 = Granularity("10minutes", 600)
    Hours = Granularity("hours", 3600)
    Hours6 = Granularity("6hours", 21600)
    Days = Granularity("days", 86400)


for _name in ("Seconds", "Seconds10", "Minutes", "Minutes10", "Hours", "Hours6", "Days"):
    setattr(Granularity, _name, getattr(_Ladder, _name))

#: Ladder ordered finest -> coarsest.
GRANULARITIES: list[Granularity] = [
    _Ladder.Seconds,
    _Ladder.Seconds10,
    _Ladder.Minutes,
    _Ladder.Minutes10,
    _Ladder.Hours,
    _Ladder.Hours6,
    _Ladder.Days,
]

_BY_NAME = {g.name: g for g in GRANULARITIES}


def granularity_by_name(name: str) -> Granularity:
    from .exceptions import UnsupportedGranularity

    try:
        return _BY_NAME[name]
    except KeyError:
        raise UnsupportedGranularity(name) from None


def next_coarser(g: Granularity) -> Granularity | None:
    i = GRANULARITIES.index(g)
    return GRANULARITIES[i + 1] if i + 1 < len(GRANULARITIES) else None


def bucket_epoch(ts: Column, seconds: int) -> Column:
    """Bucket start as epoch-seconds BIGINT — portable across engines.

    Uses integer µs arithmetic (no session-timezone dependence, no
    double rounding). DuckDB equivalent:
    ``cast(floor(epoch(ts)/D)*D as bigint)``.
    """
    return (F.floor(F.unix_micros(ts) / F.lit(seconds * 1_000_000)) * seconds).cast(
        "bigint"
    )


def bucket_ts(ts: Column, seconds: int) -> Column:
    """Bucket start as TIMESTAMP (for storage tables)."""
    return F.timestamp_seconds(bucket_epoch(ts, seconds))
