"""ScalableStreamRegistry: set-oriented find-or-create, snapshot
isolation, OCC retry convergence, and tag-subset finds as Catalyst
filters — the millions-of-streams registry path (SCALE.md §1)."""

import pytest
from pyspark.sql import functions as F

from datastream_spark.registry_table import (
    ScalableStreamRegistry,
    specs_frame,
    tag_signature,
)


def _specs(n, src="sensor"):
    return [
        {
            "tags": {"source": src, "node": f"n{i}", "meta": {"dc": f"dc{i % 3}"}},
            "highest_granularity": "seconds",
        }
        for i in range(n)
    ]


def test_ensure_bulk_idempotent_and_incremental(spark, tmp_path):
    reg = ScalableStreamRegistry(spark, str(tmp_path / "reg"))
    assert reg.count() == 0

    created = reg.ensure_bulk(specs_frame(spark, _specs(100)))
    assert created == 100 and reg.count() == 100

    # re-ensure: all specs exist -> zero created, zero new commits
    v = reg.table.current_version()
    assert reg.ensure_bulk(specs_frame(spark, _specs(100))) == 0
    assert reg.table.current_version() == v and reg.count() == 100

    # overlapping batch: only the 50 new specs are created
    assert reg.ensure_bulk(specs_frame(spark, _specs(150))) == 50
    assert reg.count() == 150

    # stream_ids are stable across re-ensures (find-or-create, not
    # create): the id assigned first is the id returned forever
    sig = tag_signature({"source": "sensor", "node": "n7", "meta": {"dc": "dc1"}})
    ids = {
        r.stream_id
        for r in reg.frame().where(F.col("tag_sig") == sig).collect()
    }
    assert len(ids) == 1


def test_find_is_subset_match_over_flattened_tags(spark, tmp_path):
    reg = ScalableStreamRegistry(spark, str(tmp_path / "reg"))
    reg.ensure_bulk(specs_frame(spark, _specs(30)))

    assert reg.find({"source": "sensor"}).count() == 30
    assert reg.find({"meta": {"dc": "dc0"}}).count() == 10
    assert reg.find({"node": "n3", "meta": {"dc": "dc0"}}).count() == 1
    assert reg.find({"node": "nope"}).count() == 0
    # value types survive the JSON encoding: int 3 != string "3"
    reg.ensure_bulk(
        specs_frame(spark, [{"tags": {"port": 3}}, {"tags": {"port": "3"}}])
    )
    assert reg.find({"port": 3}).count() == 1
    assert reg.find({"port": "3"}).count() == 1


def test_concurrent_ensure_converges_without_duplicates(spark, tmp_path):
    """Two writers racing the same spec batch: OCC makes one commit
    lose and retry; the re-run anti-join must absorb the winner's rows
    so the registry ends with ONE stream per spec."""
    root = str(tmp_path / "reg")
    a = ScalableStreamRegistry(spark, root)
    b = ScalableStreamRegistry(spark, root)

    # interleave: a reads snapshot, b commits first, a's commit
    # conflicts and retries. Simulate by committing b mid-way using
    # the retry loop's own semantics: ensure via b, then ensure the
    # SAME batch via a — a's anti-join sees b's rows and creates 0.
    nb = b.ensure_bulk(specs_frame(spark, _specs(40)))
    na = a.ensure_bulk(specs_frame(spark, _specs(40)))
    assert nb == 40 and na == 0
    assert a.count() == 40
    sigs = [r.tag_sig for r in a.frame().select("tag_sig").collect()]
    assert len(sigs) == len(set(sigs)) == 40

    # true commit race on DIFFERENT specs: force a stale base by
    # pre-reading, then have the other writer commit
    from datastream_spark.sources.manifest import CommitConflict

    base = a.table.current_version()
    files = a.table._write_files(
        a.table.spark.createDataFrame([], a.frame().schema)
    )
    b.ensure_bulk(specs_frame(spark, _specs(5, src="other")))
    with pytest.raises(CommitConflict):
        a.table._commit(a.table.current_files() + files, base)
    # the public path retries internally and lands cleanly
    assert a.ensure_bulk(specs_frame(spark, _specs(10, src="third"))) == 10
    assert a.count() == 55


def test_touch_latest_merges_monotonically(spark, tmp_path):
    reg = ScalableStreamRegistry(spark, str(tmp_path / "reg"))
    reg.ensure_bulk(specs_frame(spark, _specs(10)))
    ids = [r.stream_id for r in reg.frame().select("stream_id").collect()]

    up1 = spark.createDataFrame(
        [(i, 1000, 100) for i in ids],
        "stream_id string, latest_us long, earliest_us long",
    )
    reg.touch_latest(up1)
    # regressions are ignored (greatest/least merge), advances land
    up2 = spark.createDataFrame(
        [(ids[0], 500, 500), (ids[1], 2000, 50)],
        "stream_id string, latest_us long, earliest_us long",
    )
    reg.touch_latest(up2)
    rows = {r.stream_id: r for r in reg.frame().collect()}
    assert rows[ids[0]].latest_us == 1000 and rows[ids[0]].earliest_us == 100
    assert rows[ids[1]].latest_us == 2000 and rows[ids[1]].earliest_us == 50
    assert rows[ids[2]].latest_us == 1000


def test_append_validation_frame_shape(spark, tmp_path):
    reg = ScalableStreamRegistry(spark, str(tmp_path / "reg"))
    reg.ensure_bulk(
        specs_frame(
            spark,
            [{"tags": {"a": 1}}, {"tags": {"a": 2}, "derive_op": "sum"}],
        )
    )
    rows = {
        r.is_derived
        for r in reg.append_validation_frame().collect()
    }
    assert rows == {True, False}


def test_datastream_api_on_table_registry(spark, tmp_path):
    """The FULL API surface drives the table-backed registry unchanged:
    ensure/find/append/derive propagation/downsample/get_data/delete,
    persistence across re-open (delta-log replay), O(dirty) saves
    (log rows ≈ changed descriptors, not registry size), and compact()
    folding the log."""
    import datetime as dt

    from datastream_spark.datastream import Datastream
    from datastream_spark.granularity import Granularity

    t0 = dt.datetime(2024, 1, 1)
    root = str(tmp_path / "store")
    ds = Datastream(spark, root, registry_backend="table")

    a = ds.ensure_stream({"name": "a"})
    b = ds.ensure_stream({"name": "b"})
    assert ds.ensure_stream({"name": "a"}) == a  # find-or-create
    assert {d.stream_id for d in ds.registry.find({"name": "a"})} == {a}

    ds.append_multiple(
        [
            {"stream_id": s, "value": v, "timestamp": t0 + dt.timedelta(seconds=i)}
            for i, v in enumerate([1.0, 2.0, 3.0])
            for s in (a, b)
        ]
    )
    summed = ds.ensure_stream(
        {"name": "a+b"}, derive_from=[a, b], derive_op="sum",
        highest_granularity=Granularity.Seconds,
    )
    assert [p["v"] for p in ds.get_data(summed, Granularity.Seconds)] == [
        2.0, 4.0, 6.0,
    ]
    # propagation on append flows through the table registry
    ds.append_multiple(
        [{"stream_id": a, "value": 9.0, "timestamp": t0 + dt.timedelta(seconds=3)}]
    )
    assert [p["v"] for p in ds.get_data(summed, Granularity.Seconds)][-1] == 9.0

    ds.downsample_streams(until=t0 + dt.timedelta(seconds=600))
    got = list(ds.get_data(a, Granularity.Seconds10))
    assert got and got[0]["v"]["count"] == 4  # a has 4 points

    # O(dirty): the log appends only CHANGED descriptors per save —
    # stream `b` is touched by its create, the derive wiring, one
    # append watermark and one downsample watermark; a registry-sized
    # rewrite per save would leave one b-row per commit instead
    log = ds.registry.table.read()
    n_commits = ds.registry.table.current_version() + 1
    b_rows = log.where(F.col("stream_id") == b).count()
    assert b_rows <= 5 < n_commits + 1

    # persistence: a fresh handle replays the delta log
    ds2 = Datastream(spark, root, registry_backend="table")
    assert {d.stream_id for d in ds2.registry.all()} == {a, b, summed}
    assert ds2.registry.get(summed).derive_op == "sum"
    assert [p["v"] for p in ds2.get_data(summed, Granularity.Seconds)][-1] == 9.0

    # deletion tombstones survive reload; compact folds the log
    ds2.registry.delete([summed])
    ds2.registry.compact()
    ds3 = Datastream(spark, root, registry_backend="table")
    assert {d.stream_id for d in ds3.registry.all()} == {a, b}
    v0 = ds3.registry.table.current_version()
    ds3.registry.save()  # nothing dirty -> no commit
    assert ds3.registry.table.current_version() == v0


def test_table_registry_save_contention(spark, tmp_path):
    """Two handles over the same log: expect_unchanged save raises
    StreamAppendContended after the other writer commits, and reload
    converges."""
    from datastream_spark.exceptions import StreamAppendContended
    from datastream_spark.registry_table import TableStreamRegistry

    root = str(tmp_path / "store")
    r1 = TableStreamRegistry(spark, root)
    r2 = TableStreamRegistry(spark, root)
    r1.ensure({"n": "x"}, None, ["count"], "seconds")
    d2 = r2.ensure({"n": "y"}, None, ["count"], "seconds")
    # r1 commits again AFTER r2's last sync
    r1.load()
    r1.ensure({"n": "z"}, None, ["count"], "seconds")
    d2.latest_us = 123
    with pytest.raises(StreamAppendContended):
        r2.save(expect_unchanged=True)  # r1's commit advanced the log
    r2.load()
    # reload dropped the unsaved mutation and sees all three streams
    assert len(list(r2.all())) == 3
    # a plain (metadata LWW) save retries through the conflict
    r2.get(d2.stream_id).latest_us = 456
    r1.ensure({"n": "w"}, None, ["count"], "seconds")
    r2.save()
    r1.load()
    assert r1.get(d2.stream_id).latest_us == 456


def test_table_registry_lazy_cold_load(spark, tmp_path):
    """A fresh handle hydrates nothing at load: get() is a point
    lookup that caches one descriptor, a locally-deleted stream stays
    dead through a later full hydration, and find()/all() hydrate on
    demand without clobbering local mutations."""
    from datastream_spark.exceptions import StreamNotFound
    from datastream_spark.registry_table import TableStreamRegistry

    root = str(tmp_path / "store")
    r1 = TableStreamRegistry(spark, root)
    ds = [r1.ensure({"n": f"s{i}"}, None, ["count"], "seconds") for i in range(6)]

    r2 = TableStreamRegistry(spark, root)
    assert r2._streams == {} and not r2._hydrated  # nothing parsed yet
    got = r2.get(ds[2].stream_id)
    assert got.tags == {"n": "s2"}
    assert set(r2._streams) == {ds[2].stream_id}  # exactly one hydrated

    # local mutation + local delete, then a full hydration via find():
    # neither is clobbered/resurrected by the log's own rows
    got.latest_us = 777
    r2.get(ds[3].stream_id)
    r2.delete([ds[3].stream_id]) # save()s; r2 now fully aware of s3 death
    found = {d.tags["n"] for d in r2.find()}
    assert found == {"s0", "s1", "s2", "s4", "s5"}
    assert r2.get(ds[2].stream_id).latest_us == 777

    with pytest.raises(StreamNotFound):
        r2.get("no-such-stream")
    with pytest.raises(StreamNotFound):
        r2.get(ds[3].stream_id)  # tombstoned

    # a third handle replays the saved state
    r3 = TableStreamRegistry(spark, root)
    assert {d.tags["n"] for d in r3.all()} == {"s0", "s1", "s2", "s4", "s5"}


def test_table_registry_auto_compacts_past_threshold(spark, tmp_path):
    """save() folds the delta log itself once the live file count
    passes AUTO_COMPACT_FILES, so K saves + reload stays O(snapshot)
    read cost — tombstones folded, nothing lost, no manual compact."""
    from datastream_spark.registry_table import TableStreamRegistry

    root = str(tmp_path / "store")
    r = TableStreamRegistry(spark, root)
    r.AUTO_COMPACT_FILES = 4  # keep the test cheap
    d0 = r.ensure({"n": "keep"}, None, ["count"], "seconds")
    dead = r.ensure({"n": "dead"}, None, ["count"], "seconds")
    r.delete([dead.stream_id])
    for i in range(8):  # each save appends >= 1 file
        r.get(d0.stream_id).latest_us = 1000 + i
        r.save()
    n_files = len(r.table.current_files())
    assert n_files <= 4, f"log never folded: {n_files} live files"
    # log content is ONE live row per stream, tombstones gone
    log = r.table.read()
    assert log.where("stream_id = '%s'" % dead.stream_id).count() == 0
    fresh = TableStreamRegistry(spark, root)
    assert {d.tags["n"] for d in fresh.all()} == {"keep"}
    assert fresh.get(d0.stream_id).latest_us == 1007


def test_compact_never_folds_away_a_racing_commit(spark, tmp_path):
    """compact() derives its fold from a pinned snapshot and commits
    conditionally: a racer's save landing in between surfaces as a
    conflict and the retry folds the RACER'S state too — committed
    rows are never silently erased by the fold."""
    from datastream_spark.registry_table import TableStreamRegistry

    root = str(tmp_path / "store")
    a = TableStreamRegistry(spark, root)
    b = TableStreamRegistry(spark, root)
    d = a.ensure({"n": "x"}, None, ["count"], "seconds")
    b.load()

    # simulate the race deterministically: monkeypatch a's overwrite to
    # let b commit first on a's FIRST attempt only
    orig_overwrite = a.table.overwrite
    fired = {"done": False}

    def racing_overwrite(df, expected_base=a.table._UNSET):
        if not fired["done"]:
            fired["done"] = True
            b.get(d.stream_id).latest_us = 999  # racer's committed write
            b.save()
        return orig_overwrite(df, expected_base=expected_base)

    a.table.overwrite = racing_overwrite
    a.compact()
    a.table.overwrite = orig_overwrite

    fresh = TableStreamRegistry(spark, root)
    assert fresh.get(d.stream_id).latest_us == 999  # racer's write survived
    # and the log is genuinely folded: one live row, no tombstones
    assert fresh.table.read().count() == 1


def test_lazy_hydration_is_single_snapshot(spark, tmp_path):
    """All reads on one handle resolve at the handle's pinned snapshot
    version: a racer's later commit is invisible until load()/save()
    advances the pin — no mixed-version descriptor views."""
    from datastream_spark.exceptions import StreamNotFound
    from datastream_spark.registry_table import TableStreamRegistry

    root = str(tmp_path / "store")
    w = TableStreamRegistry(spark, root)
    d1 = w.ensure({"n": "one"}, None, ["count"], "seconds")

    reader = TableStreamRegistry(spark, root)  # pinned here
    d2 = w.ensure({"n": "two"}, None, ["count"], "seconds")  # after pin

    assert reader.get(d1.stream_id).tags == {"n": "one"}
    with pytest.raises(StreamNotFound):
        reader.get(d2.stream_id)  # not in the pinned snapshot
    assert {x.tags["n"] for x in reader.find()} == {"one"}
    reader.load()  # advance the pin
    assert {x.tags["n"] for x in reader.find()} == {"one", "two"}
