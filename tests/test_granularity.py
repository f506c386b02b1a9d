import datetime as dt

from datastream_spark.granularity import (
    GRANULARITIES,
    Granularity,
    granularity_by_name,
    next_coarser,
)


def test_ladder_order():
    assert [g.name for g in GRANULARITIES] == [
        "seconds", "10seconds", "minutes", "10minutes", "hours", "6hours", "days",
    ]
    assert Granularity.Seconds > Granularity.Days  # finer sorts greater
    assert Granularity.Minutes10 < Granularity.Minutes


def test_round_timestamp():
    ts = dt.datetime(2024, 1, 1, 13, 47, 23, 456789)
    assert Granularity.Seconds.round_timestamp(ts) == dt.datetime(2024, 1, 1, 13, 47, 23)
    assert Granularity.Seconds10.round_timestamp(ts) == dt.datetime(2024, 1, 1, 13, 47, 20)
    assert Granularity.Minutes.round_timestamp(ts) == dt.datetime(2024, 1, 1, 13, 47)
    assert Granularity.Minutes10.round_timestamp(ts) == dt.datetime(2024, 1, 1, 13, 40)
    assert Granularity.Hours.round_timestamp(ts) == dt.datetime(2024, 1, 1, 13)
    assert Granularity.Hours6.round_timestamp(ts) == dt.datetime(2024, 1, 1, 12)
    assert Granularity.Days.round_timestamp(ts) == dt.datetime(2024, 1, 1)


def test_next_coarser():
    assert next_coarser(Granularity.Seconds) == Granularity.Seconds10
    assert next_coarser(Granularity.Days) is None
    assert granularity_by_name("6hours").seconds == 21600
