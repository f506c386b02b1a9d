"""Property-based tests (hypothesis) for the invariants the engine's
correctness rests on (SURVEY.md §1.4, §5):

- granularity rounding is a proper floor (idempotent, <=, aligned)
- the rollup cascade is EXACT for the merge-form statistics: rolling
  raw -> 10s -> minutes equals rolling raw -> minutes directly, for
  any input data (integer values keep double sums associative-exact)
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datastream_spark.granularity import GRANULARITIES, Granularity
from datastream_spark.operators.rollup import rollup_cascade, rollup_from_raw

EPOCH_LO = int(dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc).timestamp())
EPOCH_HI = int(dt.datetime(2030, 1, 1, tzinfo=dt.timezone.utc).timestamp())


@given(
    epoch=st.integers(min_value=EPOCH_LO, max_value=EPOCH_HI),
    g=st.sampled_from(list(GRANULARITIES)),
)
@settings(max_examples=300, deadline=None)
def test_round_timestamp_is_floor(epoch, g):
    ts = dt.datetime.fromtimestamp(epoch, dt.timezone.utc).replace(tzinfo=None)
    r = g.round_timestamp(ts)
    assert r <= ts
    assert int(r.replace(tzinfo=dt.timezone.utc).timestamp()) % g.seconds == 0
    assert g.round_timestamp(r) == r  # idempotent
    assert (ts - r).total_seconds() < g.seconds  # tight floor


_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3600),      # offset seconds
        st.integers(min_value=-1000, max_value=1000),  # integer value
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=60,
)


@given(points=_points)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cascade_exactness(spark, points):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (sid, t0 + dt.timedelta(seconds=off), float(v))
            for off, v, sid in points
        ],
        "stream_id string, ts timestamp, value double",
    )
    direct = rollup_from_raw(df, Granularity.Minutes)
    cascaded = rollup_cascade(
        rollup_from_raw(df, Granularity.Seconds10), Granularity.Minutes
    )
    cols = ["stream_id", "bucket_epoch", "v_count", "v_sum", "v_min",
            "v_max", "v_sum_squares", "t_first", "t_last"]
    a = {tuple(r) for r in direct.select(cols).collect()}
    b = {tuple(r) for r in cascaded.select(cols).collect()}
    assert a == b
