"""Unit tests for the extended relational operators: binned range join
(operators/rangejoin.py) and deterministic sampling
(operators/sampling.py). Oracle parity is covered by probes
q_j5/q_x11; these pin the edge semantics the oracle data may not hit.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datastream_spark.operators.rangejoin import range_join
from datastream_spark.operators.sampling import hash_sample, stratified_sample

T0 = dt.datetime(2024, 1, 1)


def ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, ts(s)) for i, s in enumerate([0, 5, 10, 59, 60, 61, 119, 239])],
        "pid int, pt timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, ts(0), ts(60)),     # one bin
            (200, ts(30), ts(150)),   # spans three bins
            (300, ts(240), ts(300)),  # matches nothing
        ],
        "iid int, istart timestamp, iend timestamp",
    )
    return points, intervals


def test_range_join_half_open_bounds(spark, frames):
    points, intervals = frames
    out = range_join(
        points, intervals, "pt", "istart", "iend", bin_width_s=60
    ).select("pid", "iid")
    got = {(r.pid, r.iid) for r in out.collect()}
    # interval 100 = [0, 60): includes s=0 (start inclusive), excludes
    # s=60 (end exclusive); interval 200 = [30, 150) crosses bins
    assert got == {
        (0, 100), (1, 100), (2, 100), (3, 100),
        (3, 200), (4, 200), (5, 200), (6, 200),
    }


def test_range_join_no_duplicate_matches(spark, frames):
    points, intervals = frames
    out = range_join(points, intervals, "pt", "istart", "iend", bin_width_s=7)
    assert out.count() == out.select("pid", "iid").distinct().count()


def test_range_join_bin_width_invariance(spark, frames):
    points, intervals = frames
    a = range_join(points, intervals, "pt", "istart", "iend", bin_width_s=60)
    b = range_join(points, intervals, "pt", "istart", "iend", bin_width_s=13)
    assert {(r.pid, r.iid) for r in a.collect()} == {
        (r.pid, r.iid) for r in b.collect()
    }


def test_hash_sample_deterministic_and_monotone(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s30 = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    s30_again = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    s60 = {r.k for r in hash_sample(df, "k", 0.6).collect()}
    assert s30 == s30_again          # stable across runs
    assert s30 <= s60                # monotone: growing the rate keeps members
    assert 0.2 < len(s30) / 2000 < 0.4


def test_stratified_sample_rates_and_unknown_strata(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("s"),
    )
    out = stratified_sample(df, "s", {"a": 0.8, "b": 0.1}, key_col="k")
    by = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert "c" not in by             # unmapped strata dropped
    assert by["a"] / 1000 > 0.65
    assert by["b"] / 1000 < 0.2


def test_salted_join_equals_plain_join(spark):
    """Salting is a pure physical rewrite: the salted join's row
    multiset must equal the plain join's, inner and left, including
    unmatched left rows and a hot key owning most of the fact side."""
    from datastream_spark.operators.skew import hot_keys, salted_join

    big = spark.createDataFrame(
        [(k, i) for i, k in enumerate(["hot"] * 500 + ["warm"] * 30 + ["lonely"] * 5)],
        "k string, payload long",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("warm", 2.0), ("cold", 3.0)], "k string, dim double"
    )

    for how in ("inner", "left"):
        got = sorted(
            tuple(r) for r in salted_join(big, small, "k", n_salts=7, how=how).collect()
        )
        want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
        assert got == want, how

    hot = {r.k for r in hot_keys(big, "k", threshold=100).collect()}
    assert hot == {"hot"}
    # sampled estimate still isolates the heavy hitter
    hot_s = {r.k for r in hot_keys(big, "k", threshold=100, sample_fraction=0.5).collect()}
    assert "hot" in hot_s and "lonely" not in hot_s


def test_salted_join_auto_hot_plus_tail(spark):
    """Auto mode salts only measured heavy hitters and plain-joins the
    tail; result multiset equals the plain join including NULL keys and
    unmatched left rows."""
    from datastream_spark.operators.skew import salted_join_auto

    big = spark.createDataFrame(
        [("hot", i) for i in range(400)]
        + [("warm", i) for i in range(20)]
        + [(None, 999), ("orphan", 1000)],
        "k string, payload long",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("warm", 2.0), ("cold", 3.0)], "k string, dim double"
    )
    key = lambda t: tuple(map(repr, t))
    for how in ("inner", "left"):
        got = sorted(
            (
                tuple(r)
                for r in salted_join_auto(
                    big, small, "k", hot_threshold=100, n_salts=5,
                    sample_fraction=None, how=how,
                ).collect()
            ),
            key=key,
        )
        want = sorted(
            (tuple(r) for r in big.join(small, "k", how).collect()), key=key
        )
        assert got == want, how


def test_asof_directions_match_pandas_merge_asof(spark):
    """Differential oracle: pandas.merge_asof over randomized-but-fixed
    fixtures for every (direction, allow_exact, tolerance) combination —
    per-key, with exact-timestamp collisions and keys missing one side."""
    import datetime as dt

    import pandas as pd

    from datastream_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left_rows = [
        ("a", ts(5)), ("a", ts(10)), ("a", ts(15)), ("a", ts(20)),
        ("b", ts(7)), ("b", ts(13)),
        ("c", ts(3)),  # key with no right side
    ]
    right_rows = [
        ("a", ts(4), 1.0), ("a", ts(10), 2.0), ("a", ts(18), 3.0),
        ("b", ts(13), 10.0), ("b", ts(30), 20.0),
    ]
    ldf = spark.createDataFrame(left_rows, "k string, ts timestamp")
    rdf = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")

    for direction in ("backward", "forward", "nearest"):
        for exact in (True, False):
            for tol in (None, 4.0):
                got = {
                    (r.k, r.ts, r.v_asof)
                    for r in asof_join(
                        ldf, rdf, on=["k"],
                        allow_exact_matches=exact,
                        direction=direction,
                        tolerance_seconds=tol,
                    ).collect()
                }
                want_pd = pd.merge_asof(
                    lpd, rpd, on="ts", by="k",
                    direction=direction,
                    allow_exact_matches=exact,
                    tolerance=None if tol is None else pd.Timedelta(seconds=tol),
                )
                want = {
                    (r.k, r.ts.to_pydatetime(), None if pd.isna(r.v) else r.v)
                    for r in want_pd.itertuples()
                }
                assert got == want, (direction, exact, tol, got ^ want)


def test_fill_gaps_known_answers(spark):
    """Hand-checked grid completion: LOCF carries forward (and stays
    NULL before the first observation), linear interpolates exactly
    and leaves both tails NULL, `filled` marks generated rows, and
    lo/hi extend the grid beyond the observed range."""
    from datastream_spark.operators.gapfill import fill_gaps

    obs = spark.createDataFrame(
        [("s", 60, 10.0), ("s", 240, 40.0), ("t", 120, 7.0)],
        "stream_id string, bucket_epoch long, value double",
    )

    def rows(method, **kw):
        return {
            (r.stream_id, r.bucket_epoch): (r.value, r.filled)
            for r in fill_gaps(obs, 60, method=method, **kw).collect()
        }

    locf = rows("locf", lo=0, hi=300)
    assert locf[("s", 0)] == (None, True)  # before first: stays NULL
    assert locf[("s", 60)] == (10.0, False)
    assert locf[("s", 120)] == (10.0, True)
    assert locf[("s", 300)] == (40.0, True)  # after last: carried
    assert locf[("t", 300)] == (7.0, True)

    lin = rows("linear", lo=0, hi=300)
    assert lin[("s", 120)] == (20.0, True)  # 10 + (40-10) * 1/3
    assert lin[("s", 180)] == (30.0, True)
    assert lin[("s", 0)] == (None, True) and lin[("s", 300)] == (None, True)
    assert lin[("t", 120)] == (7.0, False)

    null_fill = rows("null")
    # default grid = observed per-key range
    assert set(b for k, b in null_fill if k == "s") == {60, 120, 180, 240}
    assert null_fill[("s", 120)] == (None, True)

    import pytest as _pt

    with _pt.raises(ValueError):
        fill_gaps(obs, 60, method="cubic")


def test_time_weighted_avg_known_answer(spark):
    """Hand-computed TWA: a value holding 10 for 45s then 30 for 15s of
    a minute gives twa 15; segments spanning bucket boundaries split
    exactly; irregular cadence does NOT bias the integral the way a
    plain AVG does."""
    import datetime as dt

    from datastream_spark.operators.timeweight import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("s", 1, ts(0), 10.0),
        ("s", 2, ts(45), 30.0),   # minute 0: 45s@10 + 15s@30 = twa 15
        ("s", 3, ts(60), 50.0),   # minute 1 fully 50
        ("s", 4, ts(150), 70.0),  # segment 60->150 spans minutes 1 and 2
    ]
    df = spark.createDataFrame(rows, "stream_id string, event_id long, ts timestamp, value double")
    got = {
        r.bucket_epoch: (r.twa, r.covered_us)
        for r in time_weighted_avg(df, 60, tiebreak="event_id").collect()
    }
    e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[e0] == (15.0, 60_000_000)
    assert got[e0 + 60] == (50.0, 60_000_000)
    # minute 2: 30s of 50 (segment tail) then trailing 70 to bucket end
    assert got[e0 + 120] == ((30 * 50 + 30 * 70) / 60.0, 60_000_000)
    # plain AVG of minute 0's samples would be 20 — cadence-biased


def test_counter_increase_known_answer(spark):
    """Hand-checked: deltas attribute to the later sample's bucket,
    a restart contributes its post-reset value (PromQL increase) or
    nothing (discard mode), and n_resets counts decreases."""
    import datetime as dt

    from datastream_spark.operators.derive import counter_increase

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s", 1, t0 + dt.timedelta(seconds=5), 10.0),
        ("s", 2, t0 + dt.timedelta(seconds=20), 25.0),   # +15 in bucket 0
        ("s", 3, t0 + dt.timedelta(seconds=70), 40.0),   # +15 in bucket 60
        ("s", 4, t0 + dt.timedelta(seconds=80), 3.0),    # reset -> +3
        ("s", 5, t0 + dt.timedelta(seconds=90), 9.0),    # +6
    ]
    df = spark.createDataFrame(rows, "stream_id string, event_id long, ts timestamp, value double")
    e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())

    got = {
        r.bucket_epoch: (r.increase, r.n_resets)
        for r in counter_increase(df, 60, tiebreak="event_id").collect()
    }
    assert got[e0] == (15.0, 0)
    assert got[e0 + 60] == (15.0 + 3.0 + 6.0, 1)

    drop = {
        r.bucket_epoch: (r.increase, r.n_resets)
        for r in counter_increase(
            df, 60, tiebreak="event_id", reset_as_restart=False
        ).collect()
    }
    assert drop[e0 + 60] == (15.0 + 6.0, 1)


def test_seasonal_zscore_known_answer(spark):
    """Hand-checked: a spike at the same slot across days scores
    against that slot's own baseline; degenerate slots (single
    observation or zero variance) yield NULL zscore, never a division
    artifact."""
    import datetime as dt

    from datastream_spark.operators.anomaly import seasonal_zscore

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # slot 0 (midnight hour) across 5 days: 10,10,10,10,40 -> spike
    for d in range(5):
        rows.append(("s", t0 + dt.timedelta(days=d), 40.0 if d == 4 else 10.0))
    # slot 3600: constant value -> zero variance -> NULL z
    for d in range(3):
        rows.append(("s", t0 + dt.timedelta(days=d, hours=1), 7.0))
    # slot 7200: single observation -> NULL z
    rows.append(("s", t0 + dt.timedelta(hours=2), 5.0))
    df = spark.createDataFrame(rows, "stream_id string, ts timestamp, value double")

    out = {
        (r.slot, r.bucket_epoch): r
        for r in seasonal_zscore(df, threshold=1.5).collect()
    }
    e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    spike = out[(0, e0 + 4 * 86400)]
    # mean 16, sigma 12: z = (40-16)/12 = 2
    assert spike.slot_mean == 16.0 and spike.slot_std == 12.0
    assert spike.zscore == 2.0 and bool(spike.is_anomaly)
    normal = out[(0, e0)]
    assert normal.zscore == -0.5 and not normal.is_anomaly
    flat = out[(3600, e0 + 3600)]
    assert flat.slot_std == 0.0 and flat.zscore is None and not flat.is_anomaly
    single = out[(7200, e0 + 7200)]
    assert single.slot_n == 1 and single.zscore is None


def test_fill_gaps_misaligned_bounds_snap_to_observed_grid(spark):
    """lo/hi that don't share the observed buckets' phase modulo step
    snap onto it (smallest aligned bucket >= lo, largest <= hi) —
    previously a misaligned lo built a grid that matched NO observed
    bucket, silently replacing every observation with NULL+filled."""
    from datastream_spark.operators.gapfill import fill_gaps

    obs = spark.createDataFrame(
        [("s", 60, 10.0), ("s", 240, 40.0)],
        "stream_id string, bucket_epoch long, value double",
    )
    got = {
        (r.stream_id, r.bucket_epoch): (r.value, r.filled)
        for r in fill_gaps(obs, 60, method="locf", lo=7, hi=305).collect()
    }
    # grid snapped to phase 0 (the observed one): 60..300
    assert set(b for _, b in got) == {60, 120, 180, 240, 300}
    assert got[("s", 60)] == (10.0, False)   # observation survives
    assert got[("s", 240)] == (40.0, False)
    assert got[("s", 300)] == (40.0, True)   # hi=305 → last aligned 300


def test_histogram_quantiles_label_stability(spark):
    """Quantile suffixes come from the decimal percent form, not a
    truncating int(q*100): 0.58 → p58_est (not p57), 0.99 and 0.999
    stay distinct (p99/p99_9), and genuine collisions raise."""
    import pytest as _pt

    from datastream_spark.operators import rollup

    df = spark.createDataFrame(
        [("k", [0, 10, 10, 0])], "g string, h array<long>"
    )
    out = rollup.histogram_quantiles(
        df, "h", keys=["g"], quantiles=[0.58, 0.99, 0.999],
        n_bins=4, lo=0.0, hi=4.0,
    )
    assert {"p58_est", "p99_est", "p99_9_est"} <= set(out.columns)
    r = out.collect()[0]
    assert r.p99_est != r.p99_9_est or abs(r.p99_est - r.p99_9_est) < 1
    with _pt.raises(ValueError):
        rollup.histogram_quantiles(
            df, "h", keys=["g"], quantiles=[0.5, 0.5],
            n_bins=4, lo=0.0, hi=4.0,
        )


def test_lttb_known_answer_both_variants(spark):
    """Hand-traced LTTB on a 6-point series with a spike, n_out=4:
    both the parallel fixed-average variant and the classic sequential
    algorithm keep first/last, pick the spike, and pick the deeper
    valley point — [(0,0),(1,10),(3,0),(5,0)]. Short series pass
    through; n_out < 3 raises."""
    import pytest as _pt

    from datastream_spark.operators.lttb import lttb, lttb_exact

    pts = spark.createDataFrame(
        [("s", 0.0, 0.0), ("s", 1.0, 10.0), ("s", 2.0, 0.0),
         ("s", 3.0, 0.0), ("s", 4.0, 5.0), ("s", 5.0, 0.0)],
        "stream_id string, x double, y double",
    )
    want = [(0.0, 0.0), (1.0, 10.0), (3.0, 0.0), (5.0, 0.0)]
    for fn in (lttb, lttb_exact):
        got = sorted(
            (r.x, r.y) for r in fn(pts, 4).collect()
        )
        assert got == want, (fn.__name__, got)

    # <= n_out points: identity (every point its own bucket)
    small = pts.where(F.col("x") < 3)
    assert sorted((r.x, r.y) for r in lttb(small, 4).collect()) == [
        (0.0, 0.0), (1.0, 10.0), (2.0, 0.0)
    ]
    with _pt.raises(ValueError):
        lttb(pts, 2)
    with _pt.raises(ValueError):
        lttb_exact(pts, 2)


def test_ewma_truncated_matches_exact_and_known_answer(spark):
    """EWMA: the truncated closed form equals the literal recurrence
    while the window reaches the series start, stays within the
    documented (1-a)^lookback tail bound after, and the first rows of
    a hand-computed series match exactly."""
    import pytest as _pt

    from datastream_spark.operators.ewma import ewma, ewma_exact

    rows = [("s", float(i), float(v)) for i, v in enumerate(
        [10, 20, 10, 40, 0, 30, 30, 10, 50, 20] * 12  # 120 points
    )]
    df = spark.createDataFrame(rows, "stream_id string, ts double, value double")

    trunc = {
        r.ts: r.ewma
        for r in ewma(df, alpha=0.5, lookback=64, order_col="ts").collect()
    }
    exact = {
        r.ts: r.ewma
        for r in ewma_exact(df, alpha=0.5, order_col="ts").collect()
    }
    # hand-computed recurrence head: 10, 15, 12.5, 26.25, 13.125
    for t, want in [(0.0, 10.0), (1.0, 15.0), (2.0, 12.5), (3.0, 26.25), (4.0, 13.125)]:
        assert trunc[t] == want and exact[t] == want, (t, trunc[t], exact[t])
    # exact while the window reaches the start; tail-bounded after
    for t in sorted(trunc):
        if t < 64:
            assert trunc[t] == exact[t], (t, trunc[t], exact[t])
        else:
            assert abs(trunc[t] - exact[t]) < 1e-9, (t, trunc[t], exact[t])

    with _pt.raises(ValueError):
        ewma(df, alpha=0.0)
    with _pt.raises(ValueError):
        ewma(df, alpha=0.5, lookback=0)


def test_mad_outliers_known_answer(spark):
    """Hand-checked MAD scoring: median 10, MAD 1 -> the 100.0 spike
    scores 0.6745*90 and flags; a constant key (MAD 0) yields NULL
    scores and no flags."""
    from datastream_spark.operators.anomaly import mad_outliers

    rows = [("a", float(v)) for v in [9, 9, 10, 10, 10, 11, 11, 100]] + [
        ("const", 5.0)
    ] * 4
    df = spark.createDataFrame(rows, "stream_id string, value double")
    got = mad_outliers(df).collect()
    a = [r for r in got if r.stream_id == "a"]
    assert a[0].key_median == 10.0 and a[0].key_mad == 1.0
    spike = [r for r in a if r.value == 100.0][0]
    assert spike.mscore == 0.6745 * 90 and spike.is_outlier
    assert all(not r.is_outlier for r in a if r.value != 100.0)
    c = [r for r in got if r.stream_id == "const"]
    assert all(r.mscore is None and not r.is_outlier for r in c)


def test_pagerank_matches_numpy_power_iteration(spark):
    """PageRank on a 4-vertex graph with a dangling node matches an
    independent numpy power iteration exactly (same fixed iteration
    count and dangling-redistribution semantics); ranks sum to 1."""
    import numpy as np

    from datastream_spark.operators.graphs import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    # vertex 3 has out-edges; make a dangling one: 0,1,2,3 + isolated
    edges += [(2, 4)]  # 4 has no out-edges -> dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex_id: r.rank for r in pagerank(df, n_iter=5).collect()}

    n, d = 5, 0.85
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in range(n)}
    for _ in range(5):
        dang = sum(r[v] for v in range(n) if v not in out)
        contrib = {v: 0.0 for v in range(n)}
        for s, ts in out.items():
            for t in ts:
                contrib[t] += r[s] / len(ts)
        r = {
            v: (1 - d) / n + d * (contrib[v] + dang / n) for v in range(n)
        }
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_rolling_quantile_known_answer(spark):
    """Sliding median over a 3-point frame, hand-checked including the
    partial early frames (pandas rolling(min_periods=1) semantics)."""
    import pytest as _pt

    from datastream_spark.operators.derive import rolling_quantile

    df = spark.createDataFrame(
        [("s", float(i), v) for i, v in enumerate([1.0, 9.0, 5.0, 3.0])],
        "stream_id string, ts double, value double",
    )
    got = {
        r.ts: r.rq
        for r in rolling_quantile(df, 0.5, 3, ts_col="ts").collect()
    }
    assert got == {0.0: 1.0, 1.0: 5.0, 2.0: 5.0, 3.0: 5.0}
    with _pt.raises(ValueError):
        rolling_quantile(df, 1.5, 3)
    with _pt.raises(ValueError):
        rolling_quantile(df, 0.5, 0)


def test_cusum_matches_sequential_recurrence(spark):
    """The prefix-sum/running-min formulation equals the literal
    max(0, S+d) recurrence on a drifting series; alarms fire exactly
    when scores cross the threshold."""
    from datastream_spark.operators.anomaly import cusum

    vals = [10.0, 10.5, 9.5, 10.0, 14.0, 15.0, 16.0, 15.5, 10.0, 4.0, 3.0]
    df = spark.createDataFrame(
        [("s", float(i), v) for i, v in enumerate(vals)],
        "stream_id string, ts double, value double",
    )
    got = {
        r.ts: (r.cusum_pos, r.cusum_neg, r.alarm)
        for r in cusum(df, target=10.0, slack=0.5, threshold=8.0, ts_col="ts").collect()
    }
    sp = sn = 0.0
    for i, v in enumerate(vals):
        sp = max(0.0, sp + (v - 10.5))
        sn = max(0.0, sn + (9.5 - v))
        g = got[float(i)]
        assert abs(g[0] - sp) < 1e-9 and abs(g[1] - sn) < 1e-9, (i, g, sp, sn)
        assert g[2] == (round(sp, 6) > 8.0 or round(sn, 6) > 8.0)
    assert any(g[2] for g in got.values())  # the drift does alarm


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: vertices of the shared edge sit in 2
    triangles... construct exactly: square 0-1-2-3 with diagonal 0-2
    gives triangles (0,1,2) and (0,2,3)."""
    from datastream_spark.operators.graphs import triangle_counts

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "src int, dst int"
    )
    got = {r.vertex_id: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 2, 1: 1, 2: 2, 3: 1}


def test_triangle_counts_ignores_dups_loops_direction(spark):
    """Self-loops, duplicate edges, and reversed duplicates must not
    change counts: the graph is undirected and simple by contract."""
    from datastream_spark.operators.graphs import triangle_counts

    clean = [(0, 1), (1, 2), (0, 2)]
    noisy = clean + [(1, 0), (2, 1), (0, 0), (1, 1), (0, 1), (2, 0)]
    t1 = {r.vertex_id: r.n_triangles
          for r in triangle_counts(
              spark.createDataFrame(clean, "src int, dst int")).collect()}
    t2 = {r.vertex_id: r.n_triangles
          for r in triangle_counts(
              spark.createDataFrame(noisy, "src int, dst int")).collect()}
    assert t1 == {0: 1, 1: 1, 2: 1}
    assert t2 == t1


def test_triangle_counts_matches_bruteforce(spark):
    """Deterministic pseudo-random graph vs an O(n^3) reference."""
    import itertools

    from datastream_spark.operators.graphs import triangle_counts

    n = 25
    edges = [
        (i, j)
        for i, j in itertools.combinations(range(n), 2)
        if (i * 31 + j * 17) % 5 < 2
    ]
    eset = set(edges)
    expect = {v: 0 for v in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if {(a, b), (a, c), (b, c)} <= eset:
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    present = {v for e in edges for v in e}
    expect = {v: c for v, c in expect.items() if v in present}
    got = {
        r.vertex_id: r.n_triangles
        for r in triangle_counts(
            spark.createDataFrame(edges, "src int, dst int")
        ).collect()
    }
    assert got == expect


def test_seasonal_decompose_recovers_pure_signal(spark):
    """v = pure seasonal pattern + constant level: trend ~ level,
    seasonal ~ pattern (centered), residual ~ 0 — and the additive
    identity holds exactly wherever components are defined."""
    import pyspark.sql.functions as F

    from datastream_spark.operators.decompose import seasonal_decompose

    period, n = 5, 40
    pat = [2.0, -1.0, 0.5, -1.5, 0.0]  # sums to 0
    rows = [("a", i * 60, 10.0 + pat[i % period]) for i in range(n)]
    df = spark.createDataFrame(rows, "key string, bucket_epoch long, v double")
    out = seasonal_decompose(
        df, "key", "bucket_epoch", "v", bucket_seconds=60,
        period=period, trend_half=2,
    ).collect()
    defined = [r for r in out if r.trend is not None]
    assert len(defined) == n - 4  # 2 lost at each edge
    for r in defined:
        # trend window (5) == period, so the MA is exactly the level
        assert abs(r.trend - 10.0) < 1e-9
        assert abs(r.residual) < 1e-9
        assert abs(r.seasonal - pat[(r.bucket_epoch // 60) % period]) < 1e-9
        assert abs(r.v - (r.trend + r.seasonal + r.residual)) < 1e-9
    # seasonal component centered: slot means sum to ~0
    slot_means = {round(r.seasonal, 9) for r in defined}
    assert abs(sum(slot_means)) < 1e-9


def test_seasonal_decompose_flat_series_zero_components(spark):
    from datastream_spark.operators.decompose import seasonal_decompose

    df = spark.createDataFrame(
        [("k", i * 10, 7.5) for i in range(30)],
        "key string, bucket_epoch long, v double",
    )
    out = seasonal_decompose(
        df, "key", "bucket_epoch", "v", bucket_seconds=10, period=6,
        trend_half=3,
    ).collect()
    for r in out:
        if r.trend is not None:
            assert abs(r.trend - 7.5) < 1e-12
            assert abs(r.seasonal) < 1e-12
            assert abs(r.residual) < 1e-12


def test_association_rules_hand_computed(spark):
    from datastream_spark.operators.mining import pair_association_rules

    # baskets: u1{a,b}, u2{a,b}, u3{a}, u4{b,c} -> n=4
    rows = [
        (1, "a"), (1, "b"), (1, "b"),  # dup collapses
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "u int, item string")
    got = {
        (r.item_a, r.item_b): (r.n_a, r.n_b, r.n_ab, r.confidence, r.lift)
        for r in pair_association_rules(df, "u", "item").collect()
    }
    na, nb, nab = 3, 3, 2
    assert got[("a", "b")] == (na, nb, nab, nab / na, nab * 4 / (na * nb))
    assert got[("b", "c")][2] == 1
    assert ("a", "c") not in got
    # threshold filters the singleton pair
    got2 = {
        (r.item_a, r.item_b)
        for r in pair_association_rules(
            df, "u", "item", min_pair_baskets=2
        ).collect()
    }
    assert got2 == {("a", "b")}


def test_rolling_autocorr_edges_and_ramp(spark):
    from datastream_spark.operators.rollingstats import rolling_autocorr

    # linear ramp: lag-1 correlation exactly 1 once enough pairs exist
    ramp = [("k", i, float(i)) for i in range(30)]
    # constant series: zero variance -> NULL always
    flat = [("c", i, 5.0) for i in range(30)]
    df = spark.createDataFrame(ramp + flat, "key string, seq int, value double")
    out = rolling_autocorr(
        df, "key", ["seq"], "value", frame=10, lag=1, min_n=5
    ).collect()
    by = {(r.key, r.seq): r.autocorr for r in out}
    assert by[("k", 2)] is None  # only 2 pairs < min_n
    for i in range(6, 30):
        assert abs(by[("k", i)] - 1.0) < 1e-9
    assert all(by[("c", i)] is None for i in range(30))


def test_profile_columns_known_stats(spark):
    import datetime

    from datastream_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [
            (1, 2.5, "x", datetime.datetime(2024, 1, 1)),
            (2, None, "y", datetime.datetime(2024, 1, 2)),
            (2, 4.0, None, None),
        ],
        "i long, d double, s string, t timestamp",
    )
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert prof["i"].n_rows == 3 and prof["i"].n_null == 0
    assert prof["i"].n_distinct == 2
    assert (prof["i"].min_num, prof["i"].max_num) == (1.0, 2.0)
    assert prof["i"].min_str is None
    assert prof["d"].n_null == 1 and prof["d"].max_num == 4.0
    assert prof["s"].n_null == 1 and prof["s"].min_str == "x"
    assert prof["s"].min_num is None
    assert prof["t"].n_null == 1
    assert prof["t"].min_num == 1704067200000000.0
    # approx path still produces the full shape
    approx = {r.column: r for r in profile_columns(df, exact_distinct=False).collect()}
    assert approx["i"].n_distinct >= 1


def test_profile_columns_guards(spark):
    import pytest as _pytest

    from datastream_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1, [1, 2])], "i long, arr array<int>")
    prof = profile_columns(df)  # array column silently excluded
    assert [r.column for r in prof.collect()] == ["i"]
    with _pytest.raises(ValueError, match="no profilable"):
        profile_columns(df, cols=["arr"])


def test_profile_columns_binary_payloads(spark):
    """A binary payload column (multimodal tables) profiles alongside
    string columns: the _str bounds are string-typed in every branch
    of the per-column union, so the union doesn't type-clash."""
    from datastream_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(b"\x00\x01", "a"), (b"\x00\x02", "b"), (None, "b")],
        "payload binary, s string",
    )
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert prof["payload"].n_null == 1 and prof["payload"].n_distinct == 2
    assert prof["s"].min_str == "a" and prof["s"].max_str == "b"


def test_rolling_slope_known_line(spark):
    from datastream_spark.operators.rollingstats import rolling_slope

    # y = 3 + 2x with one point per hour -> slope 2/hour, intercept 3
    # (at the key's first point); a flat series -> slope 0; a key
    # whose points share one timestamp -> zero time-variance -> NULL.
    base = dt.datetime(2024, 3, 1)
    rows = (
        [("line", i, base + dt.timedelta(hours=i), 3.0 + 2.0 * i) for i in range(12)]
        + [("flat", i, base + dt.timedelta(hours=i), 7.5) for i in range(12)]
        + [("tied", i, base, float(i)) for i in range(12)]
    )
    df = spark.createDataFrame(rows, "key string, seq int, ts timestamp, value double")
    out = rolling_slope(
        df, "key", ["ts", "seq"], "value", frame=8, min_n=4, x_unit_seconds=3600.0
    ).collect()
    by = {(r.key, r.seq): (r.slope, r.intercept) for r in out}
    assert by[("line", 2)] == (None, None)  # 3 points < min_n
    for i in range(4, 12):
        s, c = by[("line", i)]
        assert abs(s - 2.0) < 1e-9 and abs(c - 3.0) < 1e-9
    for i in range(4, 12):
        s, c = by[("flat", i)]
        assert abs(s) < 1e-9 and abs(c - 7.5) < 1e-9
    assert all(by[("tied", i)] == (None, None) for i in range(12))


def test_concurrency_sweepline_hand_case(spark):
    from datastream_spark.operators.sessionize import concurrency

    # u1: one session [0s, 100s]; u2: one session at exactly [50s];
    # u3: session starting exactly when u1's ends (touching counts).
    base = dt.datetime(2024, 3, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        ("u1", t(0)), ("u1", t(100)),
        ("u2", t(50)),
        ("u3", t(100)), ("u3", t(160)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r["ts"]: (r.n_starts, r.n_ends, r.concurrent)
           for r in concurrency(df, gap_seconds=1800, key="user_id").collect()}
    assert out[t(0)] == (1, 0, 1)
    assert out[t(50)] == (1, 1, 2)    # u2's point session overlaps u1
    assert out[t(100)] == (1, 1, 2)   # u1 ends AND u3 starts: both active
    assert out[t(160)] == (0, 1, 1)
    # a >gap split makes two sessions, not one long one
    df2 = spark.createDataFrame(
        [("u", t(0)), ("u", t(10_000))], "user_id string, ts timestamp"
    )
    out2 = concurrency(df2, gap_seconds=1800, key="user_id").collect()
    assert sum(r.n_starts for r in out2) == 2


def test_concurrency_ranged_sweep_matches_single_partition(spark):
    """Round-10 cluster path (VERDICT r9 #5): the range-partitioned
    sweep (per-range local running sums + broadcast exclusive prefix
    offsets) must equal the single-ordered-partition reference on a
    boundary set spread across many ranges — including instants that
    straddle range boundaries and ranges with heavy start/end
    imbalance."""
    import random

    from datastream_spark.operators.sessionize import concurrency

    base = dt.datetime(2024, 3, 1)
    rnd = random.Random(7)
    rows = []
    for u in range(200):
        t0 = rnd.randrange(0, 50_000)
        for k in range(rnd.randrange(1, 6)):
            rows.append((f"u{u}", base + dt.timedelta(seconds=t0 + k * 60)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    ranged = {
        tuple(r)
        for r in concurrency(df, 1800, key="user_id", range_partitions=16).collect()
    }
    single = {
        tuple(r)
        for r in concurrency(df, 1800, key="user_id", range_partitions=1).collect()
    }
    assert ranged == single
    # curve sanity: total starts == total ends == number of sessions
    assert sum(r[1] for r in ranged) == sum(r[2] for r in ranged)


def test_kmv_sketch_exact_merge_and_overlap(spark):
    from datastream_spark.operators import kmv

    # groups: A = {0..599}, B = {300..899} -> |A∩B| = 300, |A∪B| = 900,
    # J = 1/3. C tiny (distinct < k -> exact path).
    rows = (
        [("A", f"e{i}") for i in range(600)]
        + [("B", f"e{i}") for i in range(300, 900)]
        + [("C", f"e{i}") for i in range(5)]
        + [("C", f"e{i}") for i in range(5)]  # repeats collapse
    )
    df = spark.createDataFrame(rows, "g string, el string")
    k = 128
    sk = kmv.kmv_sketch(df, ["g"], F.col("el"), k=k)
    per_g = {r.g: r for r in kmv.kmv_estimate(sk, ["g"], k=k).collect()}
    assert per_g["C"].n_hashes == 5 and per_g["C"].est_distinct == 5.0
    # KMV estimator: relative standard error ~ 1/sqrt(k-2) ≈ 9%; the
    # hash is deterministic so this is a fixed draw, bound it at 4 s.e.
    for g, truth in [("A", 600), ("B", 600)]:
        assert abs(per_g[g].est_distinct - truth) / truth < 0.36

    # merge theorem: merging per-group sketches == sketching the union
    merged = kmv.kmv_merge(sk.where(F.col("g") != "C"), [], k=k)
    direct = kmv.kmv_sketch(
        df.where(F.col("g") != "C").withColumn("g", F.lit("all")), ["g"],
        F.col("el"), k=k,
    )
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.select("h").collect()
    )

    ov = {(r.g_a, r.g_b): r for r in kmv.kmv_pair_overlap(sk, "g", k=k).collect()}
    ab = ov[("A", "B")]
    assert abs(ab.est_intersect - 300) / 300 < 0.5
    assert abs(ab.est_union - 900) / 900 < 0.36
    assert abs(ab.jaccard_e6 / 1e6 - 1 / 3) < 0.15
    # disjoint pair: zero intersection estimated as exactly zero
    ac = ov[("A", "C")]
    assert ac.est_intersect == 0.0 and ac.jaccard_e6 == 0


def test_check_suite_hand_computed(spark):
    """check_suite: every check family counted by hand on a 6-row
    frame — NULL predicate results violate row checks, NULL child
    keys do NOT violate ref integrity, uniqueness counts ALL rows of
    over-represented keys, passed flags derive from violations."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datastream_spark.operators import quality as Q

    rows = [
        (1, 10.0, "O", "a1"),
        (2, 50.0, "F", "b2"),
        (2, 70.0, "X", "c3"),      # dup id, bad status
        (3, None, "O", "zz"),      # NULL price -> range violates; bad code
        (4, 500.0, "O", "d4"),     # out of range
        (None, 20.0, "F", "e5"),   # NULL id
    ]
    df = spark.createDataFrame(
        rows, "id long, price double, status string, code string"
    )
    parent = spark.createDataFrame(
        [(1,), (2,), (3,)], "pid long"
    )
    rep = {
        (r["check"], r.target): (r.violations, r.total, r.passed)
        for r in Q.check_suite(
            df,
            [
                Q.expect_not_null("id"),
                Q.expect_in_range("price", 0, 100),
                Q.expect_values_in("status", ["O", "F"]),
                Q.expect_matches("code", "[a-z][0-9]"),
                Q.expect_unique("id"),
                Q.expect_ref_integrity("id", parent, "pid"),
            ],
        ).collect()
    }
    assert rep[("not_null", "id")] == (1, 6, False)
    # price: NULL violates, 500 violates -> 2
    assert rep[("in_range", "price")] == (2, 6, False)
    assert rep[("values_in", "status")] == (1, 6, False)
    # code: 'zz' fails the full match -> 1
    assert rep[("matches", "code")] == (1, 6, False)
    # id=2 twice -> both rows count as violations; NULLs group but
    # appear once here.
    assert rep[("unique", "id")] == (2, 6, False)
    # child keys {1,2,2,3,4,NULL}: 4 is orphaned, NULL ignored.
    assert rep[("ref_integrity", "id->pid")] == (1, 6, False)

    # An all-green suite on the clean subset.
    clean = df.where(F.col("id").isin(1, 3) & F.col("price").isNotNull())
    rep2 = {
        r["check"]: r.passed
        for r in Q.check_suite(
            clean,
            [Q.expect_not_null("id"), Q.expect_unique("id")],
        ).collect()
    }
    assert rep2 == {"not_null": True, "unique": True}

    # Guards.
    with _pytest.raises(ValueError):
        Q.check_suite(df, [])
    with _pytest.raises(ValueError):
        Q.expect_values_in("status", [])
    with _pytest.raises(ValueError):
        Q.expect_unique()
    with _pytest.raises(TypeError):
        Q.check_suite(df, ["not a check"])

    # broadcast_parent=False still computes the same answer.
    rep3 = Q.check_suite(
        df,
        [Q.expect_ref_integrity("id", parent, "pid", broadcast_parent=False)],
    ).collect()
    assert (rep3[0].violations, rep3[0].total) == (1, 6)


def test_bottomk_prefilter_parity_and_fallback(spark, monkeypatch):
    """The threshold prefilter is a pure execution strategy: its
    output is row-identical to the full-sort path, and a forced
    undershoot (factor/floor monkeypatched to 0 -> threshold keeps
    ~1 expected row) is caught by the guard and recomputed via the
    full path — never a silently short sample."""
    from pyspark.sql import functions as F

    from datastream_spark.operators import kmv

    df = spark.createDataFrame(
        [(f"g{i % 2}", i) for i in range(6000)], "g string, id long"
    )

    def sample_set(**kw):
        return {
            (r.g, r.id, r._h)
            for r in kmv.bottomk_sample(df, ["g"], "id", k=4, **kw).collect()
        }

    fast, slow = sample_set(prefilter=True), sample_set(prefilter=False)
    assert fast == slow and len(fast) == 8
    # tiny groups: the G*m >= N self-disable kicks in and still agrees
    small = spark.createDataFrame(
        [(f"g{i % 50}", i) for i in range(200)], "g string, id long"
    )
    a = {(r.g, r.id) for r in kmv.bottomk_sample(small, ["g"], "id", k=4).collect()}
    b = {
        (r.g, r.id)
        for r in kmv.bottomk_sample(
            small, ["g"], "id", k=4, prefilter=False
        ).collect()
    }
    assert a == b
    # forced undershoot -> guard fires -> full-path result
    monkeypatch.setattr(kmv, "_PREFILTER_FACTOR", 0)
    monkeypatch.setattr(kmv, "_PREFILTER_FLOOR", 1)
    assert sample_set(prefilter=True) == slow


def test_expect_matches_trailing_newline(spark):
    """expect_matches is a TRUE full match: a value ending in a line
    terminator violates. Java regex '$' (the old anchor) also matches
    just before a trailing '\\n', which silently diverged from the
    DuckDB oracle's regexp_full_match — the \\A...\\z anchors close
    that (ADVICE r6)."""
    from datastream_spark.operators import quality as Q

    df = spark.createDataFrame(
        [("a1",), ("a1\n",), ("b2\r\n",)], "code string"
    )
    rep = Q.check_suite(df, [Q.expect_matches("code", "[a-z][0-9]")]).collect()
    assert (rep[0].violations, rep[0].total) == (2, 3)


def test_kmv_pair_overlap_max_groups_guard(spark):
    """kmv_pair_overlap refuses a high-cardinality group column (the
    pair matrix is G²/2 rows) unless max_groups is raised/disabled —
    the fuzzyjoin max_block_rows refusal discipline."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datastream_spark.operators import kmv

    df = spark.createDataFrame(
        [(f"g{i % 5}", f"e{i}") for i in range(100)], "g string, el string"
    )
    sk = kmv.kmv_sketch(df, ["g"], F.col("el"), k=16)
    with _pytest.raises(ValueError, match="max_groups"):
        kmv.kmv_pair_overlap(sk, "g", k=16, max_groups=3)
    # at/under the cap (and with the guard disabled) it runs: 5 groups
    # -> C(5,2) = 10 pairs either way
    assert kmv.kmv_pair_overlap(sk, "g", k=16, max_groups=5).count() == 10
    assert kmv.kmv_pair_overlap(sk, "g", k=16, max_groups=None).count() == 10


def test_correlation_matrix_hand_computed(spark):
    """correlation_matrix: exact +1/-1 recovery on quantized-exact
    lines, numpy cross-check on a general frame, pairwise-complete
    NULL handling, zero-variance -> NULL, guards."""
    import numpy as np
    import pytest as _pytest

    from datastream_spark.operators.profile import correlation_matrix

    # y = 2x (exact on the grid) -> corr 1; z = -x -> corr -1 with x.
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame(
        [(x, 2 * x, -x, 7.0) for x in xs], "x double, y double, z double, c double"
    )
    got = {
        (r.col_a, r.col_b): (r.n, r.corr_e6)
        for r in correlation_matrix(df, ["x", "y", "z", "c"], scale=100).collect()
    }
    # floor-gate semantics at the poles: +1 floors to 999999 when the
    # IEEE sqrt product lands a hair above the true denominator; -1
    # floors to exactly -1000000. Both are deterministic by doctrine.
    assert got[("x", "y")] == (5, 999999)
    assert got[("x", "z")] == (5, -1000000)
    # Constant column: zero variance -> NULL corr, n still counted.
    assert got[("x", "c")] == (5, None)
    assert got[("y", "z")] == (5, -1000000)

    # General values: matches numpy on the SAME quantized grid.
    rng = [(0.13, 1.7), (0.55, 0.2), (0.91, 2.9), (0.37, 1.1), (0.78, 2.2)]
    df2 = spark.createDataFrame(rng, "a double, b double")
    r = correlation_matrix(df2, ["a", "b"], scale=10000).collect()[0]
    qa = np.floor(np.array([x for x, _ in rng]) * 10000)
    qb = np.floor(np.array([y for _, y in rng]) * 10000)
    want = int(np.floor(np.corrcoef(qa, qb)[0, 1] * 1e6))
    assert r.corr_e6 == want and r.n == 5

    # Pairwise-complete: a NULL in one column drops the row for that
    # pair only.
    df3 = spark.createDataFrame(
        [(1.0, 2.0, 10.0), (2.0, None, 20.0), (3.0, 6.0, 30.0),
         (4.0, 8.0, None)],
        "p double, q double, r double",
    )
    got3 = {
        (x.col_a, x.col_b): x.n
        for x in correlation_matrix(df3, ["p", "q", "r"], scale=100).collect()
    }
    assert got3 == {("p", "q"): 3, ("p", "r"): 3, ("q", "r"): 2}

    with _pytest.raises(ValueError):
        correlation_matrix(df, ["x"])
    with _pytest.raises(ValueError):
        correlation_matrix(df, ["x", "y"], scale={"x": 100})


def test_interval_overlap_join_semantics(spark):
    """interval_overlap_join: closed-interval semantics (touching
    matches), once-only emission for pairs sharing many bins,
    bin-width invariance, empty-interval drop, suffix guard."""
    import datetime as dt

    import pytest as _pytest

    from datastream_spark.operators.rangejoin import interval_overlap_join

    t0 = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, t0 + dt.timedelta(seconds=s), t0 + dt.timedelta(seconds=e))
                for i, s, e in rows
            ],
            "id long, s timestamp, e timestamp",
        )

    left = mk([
        (1, 0, 1000),      # long interval spanning many 60s bins
        (2, 2000, 2010),
        (3, 5000, 4000),   # empty (end < start): dropped
    ])
    right = mk([
        (10, 500, 1500),   # overlaps 1
        (11, 1000, 1100),  # touches 1 at exactly t=1000 -> matches
        (12, 2011, 2020),  # misses 2 by one second
        (13, 3000, 6000),  # would overlap 3 if not dropped
    ])
    got = {
        (r.id_l, r.id_r)
        for r in interval_overlap_join(
            left, right, "s", "e", "s", "e", bin_width_s=60
        ).collect()
    }
    assert got == {(1, 10), (1, 11)}

    # Once-only: pair (1,10) shares ~9 bins at width 60 but appears
    # exactly once; and the output is invariant to bin width.
    rows = interval_overlap_join(
        left, right, "s", "e", "s", "e", bin_width_s=60
    ).collect()
    assert len(rows) == 2
    for wsec in (1, 500, 10_000):
        alt = {
            (r.id_l, r.id_r)
            for r in interval_overlap_join(
                left, right, "s", "e", "s", "e", bin_width_s=wsec
            ).collect()
        }
        assert alt == got, wsec

    with _pytest.raises(ValueError):
        interval_overlap_join(
            left, right, "s", "e", "s", "e", suffixes=("_x", "_x")
        )


def test_bradley_terry_paths_and_closed_form(spark):
    """bradley_terry_scores: two-item closed form (s_a -> wins_a/n),
    transitive strength ordering, and EXACT parity between the
    size-gated driver path and the distributed join path."""
    import pytest as _pytest

    from datastream_spark.operators.preference import bradley_terry_scores

    # Two items, 30 games, A wins 20: stationary s_a = 2/3.
    two = spark.createDataFrame(
        [(1, 2)] * 20 + [(2, 1)] * 10, "winner long, loser long"
    )
    got2 = {
        r.item: (r.wins, r.games, r.score_e6, r.rank)
        for r in bradley_terry_scores(two, iters=12).collect()
    }
    assert got2[1][:2] == (20, 30) and got2[2][:2] == (10, 30)
    assert got2[1][3] == 1 and got2[2][3] == 2
    assert abs(got2[1][2] - 666666) <= 5      # 2/3 on the e6 grid
    assert abs(got2[2][2] - 333333) <= 5

    # Rock-paper-scissors-free hierarchy: A>B, B>C, A>C.
    tri = spark.createDataFrame(
        [(1, 2)] * 9 + [(2, 1)] * 3
        + [(2, 3)] * 9 + [(3, 2)] * 3
        + [(1, 3)] * 9 + [(3, 1)] * 3,
        "winner long, loser long",
    )
    ranks = {r.item: r.rank for r in bradley_terry_scores(tri).collect()}
    assert ranks == {1: 1, 2: 2, 3: 3}

    # Path parity: identical scores bit-for-bit (the shared quantized
    # update is the spec, not an approximation).
    a = bradley_terry_scores(tri, iters=6).collect()
    b = bradley_terry_scores(tri, iters=6, driver_max_pairs=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # Self-games dropped; guards loud.
    selfy = spark.createDataFrame([(1, 1)], "winner long, loser long")
    with _pytest.raises(ValueError):
        bradley_terry_scores(selfy)
    with _pytest.raises(ValueError):
        bradley_terry_scores(two, iters=0)


def test_round6_review_regressions(spark):
    """Pins for the round-6 review findings: NULL elements never enter
    a KMV sketch; check_suite on an empty frame reports 0/passed for
    every family; duplicated BM25 query terms are idempotent."""
    from pyspark.sql import functions as F

    from datastream_spark.operators import quality as Q
    from datastream_spark.operators.kmv import kmv_sketch
    from datastream_spark.operators.retrieval import bm25_topk

    # NULL element: dropped, not seated at rank 1 of the sketch.
    d = spark.createDataFrame(
        [("en", "a"), ("en", None), ("en", "b")], "lang string, t string"
    )
    sk = kmv_sketch(d, ["lang"], F.col("t"), k=8, portable=True).collect()
    assert len(sk) == 2 and all(r.h is not None for r in sk)

    # Empty frame: every check family reports 0 violations / passed.
    empty = spark.createDataFrame([], "id long, price double")
    parent = spark.createDataFrame([(1,)], "pid long")
    rep = Q.check_suite(
        empty,
        [
            Q.expect_not_null("id"),
            Q.expect_unique("id"),
            Q.expect_ref_integrity("id", parent, "pid"),
        ],
    ).collect()
    assert all((r.violations, r.total, r.passed) == (0, 0, True) for r in rep)

    # Duplicate query terms: same scores and ranks as the deduped query.
    docs = spark.createDataFrame(
        [(1, "spark spark engine"), (2, "spark"), (3, "room")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bm25_topk(docs, ["spark"], k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs, ["spark", "spark"], k=5).collect()))
    assert a == b


def test_holt_forecast_hand_computed(spark):
    """holt_forecast: exact recurrence vs a python reference, constant
    series -> zero trend, single-point series -> (x0, 0), guards."""
    import datetime as dt

    import pytest as _pytest

    from datastream_spark.operators.ewma import holt_forecast

    t0 = dt.date(2024, 1, 1)
    xs = [10.0, 12.0, 11.0, 15.0, 18.0]
    rows = [("a", t0 + dt.timedelta(days=i), v) for i, v in enumerate(xs)]
    rows += [("c", t0 + dt.timedelta(days=i), 7.0) for i in range(6)]
    rows += [("one", t0, 42.0)]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    got = {
        r.k: (r.n, r.level, r.trend, r.forecast_1)
        for r in holt_forecast(
            df, 0.3, 0.2, key="k", order_col="d", value_col="v"
        ).collect()
    }

    l, b = xs[0], 0.0
    for x in xs[1:]:
        ln = 0.3 * x + 0.7 * (l + b)
        bn = 0.2 * ((0.3 * x + 0.7 * (l + b)) - l) + 0.8 * b
        l, b = ln, bn
    assert got["a"] == (5, l, b, l + b)
    # Constant series: level == the constant, trend == 0 exactly.
    assert got["c"] == (6, 7.0, 0.0, 7.0)
    # Single point: init state, zero trend.
    assert got["one"] == (1, 42.0, 0.0, 42.0)

    with _pytest.raises(ValueError):
        holt_forecast(df, 0.0, 0.5, key="k", order_col="d", value_col="v")
    with _pytest.raises(ValueError):
        holt_forecast(df, 0.5, 1.5, key="k", order_col="d", value_col="v")


def test_bottomk_sample_and_quantiles(spark):
    """bottomk_sample: deterministic, mergeable (bottom-k of a union
    == re-minimized pool of per-shard bottom-ks); sample_quantiles:
    nearest-rank selection vs numpy on the same definition, p=1.0 ->
    max, tiny-p -> min, guards."""
    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datastream_spark.operators.kmv import bottomk_sample, sample_quantiles

    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 2 == 0).cast("string").alias("g"),
        (F.col("id") * 7 % 101).cast("double").alias("v"),
    )
    s = bottomk_sample(df, ["g"], "id", k=50)
    rows = s.collect()
    assert {r.g for r in rows} == {"true", "false"}
    per_g = {g: sorted(r.id for r in rows if r.g == g) for g in ("true", "false")}
    assert all(len(v) == 50 for v in per_g.values())
    # Deterministic across runs.
    again = {
        g: sorted(r.id for r in bottomk_sample(df, ["g"], "id", k=50).collect() if r.g == g)
        for g in ("true", "false")
    }
    assert again == per_g

    # Merge theorem row-wise: shard samples pooled + re-ranked ==
    # whole-input sample.
    a = bottomk_sample(df.where("id < 500"), ["g"], "id", k=50)
    b = bottomk_sample(df.where("id >= 500"), ["g"], "id", k=50)
    from pyspark.sql import Window

    pooled = a.unionByName(b)
    w = Window.partitionBy("g").orderBy("_h", "id")
    merged = (
        pooled.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 50)
        .drop("_rn")
    )
    assert {(r.g, r.id) for r in merged.collect()} == {
        (r.g, r.id) for r in rows
    }

    # Nearest-rank quantiles vs numpy's ceil-rank on identical samples.
    got = {
        r.g: (r.n, r.p50, r.p90, r.p100)
        for r in sample_quantiles(s, ["g"], "v", [0.5, 0.9, 1.0]).collect()
    }
    for g in ("true", "false"):
        vs = np.sort(
            [r.v for r in rows if r.g == g]
        )
        n = len(vs)
        want = tuple(
            vs[max(int(np.ceil(p * n - 1e-9)), 1) - 1]
            for p in (0.5, 0.9, 1.0)
        )
        assert got[g] == (n, *want), g
        assert got[g][3] == vs[-1]  # p=1.0 is the max

    # Tiny p selects the minimum (index clamps to 1); sub-percent
    # probabilities get distinct %g labels instead of colliding.
    tiny = sample_quantiles(s, ["g"], "v", [0.0001]).collect()
    for r in tiny:
        vs = sorted(x.v for x in rows if x.g == r.g)
        assert r.p0_01 == vs[0]
    two_tails = sample_quantiles(s, ["g"], "v", [0.001, 0.004])
    assert {"p0_1", "p0_4"} <= set(two_tails.columns)

    with _pytest.raises(ValueError):
        sample_quantiles(s, ["g"], "v", [])
    with _pytest.raises(ValueError):
        sample_quantiles(s, ["g"], "v", [1.5])
    with _pytest.raises(ValueError):
        # distinct probs colliding to one label refuse loudly
        sample_quantiles(s, ["g"], "v", [0.5, 0.5])


def test_bfs_distances_hand_graph(spark):
    """bfs_distances: exact hop levels on a hand graph (path + branch
    + unreachable island), multi-source min semantics, directed vs
    undirected, max_hops cutoff, isolated source at 0, guards."""
    import pytest as _pytest

    from datastream_spark.operators.graphs import bfs_distances

    #  1-2-3-4-5   6-7 (island)   8 (isolated)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "src long, dst long"
    )
    got = {
        r.vertex_id: r.dist
        for r in bfs_distances(edges, [1], max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops

    # Multi-source: distance is to the NEAREST source.
    multi = {
        r.vertex_id: r.dist
        for r in bfs_distances(edges, [1, 5], max_hops=2).collect()
    }
    assert multi == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}

    # Directed: 2 cannot reach back to 1.
    dd = {
        r.vertex_id: r.dist
        for r in bfs_distances(edges, [2], max_hops=4, directed=True).collect()
    }
    assert dd == {2: 0, 3: 1, 4: 2, 5: 3}

    # An isolated source still reports distance 0.
    iso = {
        r.vertex_id: r.dist
        for r in bfs_distances(edges, [8], max_hops=2).collect()
    }
    assert iso == {8: 0}

    with _pytest.raises(ValueError):
        bfs_distances(edges, [], max_hops=2)
    with _pytest.raises(ValueError):
        bfs_distances(edges, [1], max_hops=0)


def test_holt_null_observations_dropped(spark):
    """A NULL value or NULL order row carries no signal: the fold runs
    on the remaining points instead of poisoning the key to NULL."""
    import datetime as dt

    from datastream_spark.operators.ewma import holt_forecast

    t0 = dt.date(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(days=0), 10.0),
        ("a", t0 + dt.timedelta(days=1), None),
        ("a", t0 + dt.timedelta(days=2), 12.0),
        ("a", None, 99.0),
    ]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    clean = spark.createDataFrame(
        [r for r in rows if r[1] is not None and r[2] is not None],
        "k string, d date, v double",
    )
    got = holt_forecast(df, 0.5, 0.5, key="k", order_col="d", value_col="v").collect()[0]
    want = holt_forecast(clean, 0.5, 0.5, key="k", order_col="d", value_col="v").collect()[0]
    assert (got.n, got.level, got.trend) == (want.n, want.level, want.trend)
    assert got.level is not None


def test_sample_quantiles_integer_product_rank(spark):
    """The IEEE ceil hazard pin: p*n that is mathematically an integer
    (0.07 * 100) selects the exact ceil(p*n)-th rank, not one above."""
    from pyspark.sql import functions as F

    from datastream_spark.operators.kmv import sample_quantiles

    df = spark.range(1, 101).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    r = sample_quantiles(df, ["g"], "v", [0.07]).collect()[0]
    assert r.p7 == 7.0  # rank 7 of 1..100, not 8


def test_deterministic_shuffle_is_a_reproducible_permutation(spark):
    """(shard, pos) covers every row exactly once, pos is dense
    1..len(shard) per shard, the order replays across calls, and a
    different seed permutes differently."""
    from datastream_spark.operators.sampling import deterministic_shuffle

    df = spark.range(200).withColumnRenamed("id", "k")
    a = deterministic_shuffle(df, "k", seed="e0", n_shards=4)
    rows = a.collect()
    assert len(rows) == 200 and len({r["k"] for r in rows}) == 200
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = {(r["k"]): (r["shard"], r["pos"]) for r in a.collect()}
    assert again == {r["k"]: (r["shard"], r["pos"]) for r in rows}
    other = {
        r["k"]: (r["shard"], r["pos"])
        for r in deterministic_shuffle(df, "k", seed="e1", n_shards=4).collect()
    }
    assert other != again

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(df, "k", seed="e0", n_shards=0)


def test_bottomk_prefilter_handles_null_groups(spark):
    """A NULL group key is a real group: the prefilter's null-safe
    joins must sample it identically to the full-sort path instead of
    dropping its rows and falling back with a spurious warning."""
    from datastream_spark.operators import kmv
    from datastream_spark.operators.kmv import bottomk_sample

    rows = [(None if i % 3 == 0 else f"g{i % 2}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id long")
    # force the prefilter branch (default sizing self-disables on an
    # input this small: groups*m >= rows)
    old = kmv._PREFILTER_FACTOR, kmv._PREFILTER_FLOOR
    kmv._PREFILTER_FACTOR, kmv._PREFILTER_FLOOR = 2, 0
    try:
        fast = bottomk_sample(df, ["g"], "id", k=5, prefilter=True)
        slow = bottomk_sample(df, ["g"], "id", k=5, prefilter=False)

        def key(frame):
            return {(r["g"], r["id"]) for r in frame.collect()}

        got = key(fast)
        assert got == key(slow)
        assert any(g is None for g, _ in got)
    finally:
        kmv._PREFILTER_FACTOR, kmv._PREFILTER_FLOOR = old
