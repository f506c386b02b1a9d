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


# ---------------------------------------------------------------------------
# Curation invariants (operators/curation.py): Spark output must equal a
# direct Python reference implementation on arbitrary small corpora.
# ---------------------------------------------------------------------------

_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12),
    min_size=1,
    max_size=8,
)


@given(docs=_docs, n=st.integers(min_value=1, max_value=3))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ngram_repetition_matches_python_reference(spark, docs, n):
    from collections import Counter

    from datastream_spark.operators.curation import ngram_repetition

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"], r["top_count"])
        for r in ngram_repetition(df, n=n).collect()
    }
    for i, toks in enumerate(docs):
        grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        if not grams:
            assert i not in got
            continue
        c = Counter(grams)
        assert got[i] == (len(grams), len(c), max(c.values()))


@given(docs=_docs, budget=st.integers(min_value=1, max_value=20))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_matches_python_reference(spark, docs, budget):
    from datastream_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, " ".join(toks), "x") for i, toks in enumerate(docs)],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, budget=budget, shard_col="lang").collect()
    }
    off = 0
    for i, toks in enumerate(docs):  # doc_id order == enumeration order
        assert got[i] == (len(toks), off // budget, off % budget)
        off += len(toks)


_series = st.lists(
    st.integers(min_value=-100, max_value=100), min_size=1, max_size=40
)


@given(vals=_series)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cusum_identity_matches_recurrence(spark, vals):
    """Prefix-sum/running-min CUSUM == the literal max(0, S+d)
    recurrence for ANY integer series (integer inputs keep the double
    sums associative-exact, so equality is exact)."""
    from datastream_spark.operators.anomaly import cusum

    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(vals)],
        "stream_id string, ts double, value double",
    )
    got = {
        r.ts: (r.cusum_pos, r.cusum_neg)
        for r in cusum(df, target=3.0, slack=1.0, ts_col="ts").collect()
    }
    sp = sn = 0.0
    for i, v in enumerate(vals):
        sp = max(0.0, sp + (v - 4.0))
        sn = max(0.0, sn + (2.0 - v))
        assert got[float(i)] == (round(sp, 6), round(sn, 6)), (i, vals)


@given(vals=_series, n_out=st.integers(min_value=3, max_value=8))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lttb_size_and_endpoint_invariants(spark, vals, n_out):
    """Both LTTB variants: output size == min(n, n_out); first and
    last points always kept; every output point is an input point."""
    from datastream_spark.operators.lttb import lttb, lttb_exact

    pts = [(float(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        [("s", x, y) for x, y in pts], "stream_id string, x double, y double"
    )
    for fn in (lttb, lttb_exact):
        out = sorted((r.x, r.y) for r in fn(df, n_out).collect())
        assert len(out) == min(len(pts), n_out), (fn.__name__, vals)
        assert out[0] == pts[0] and out[-1] == pts[-1]
        assert set(out) <= set(pts)


@given(vals=_series)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ewma_bounds_and_head_exactness(spark, vals):
    """Truncated EWMA stays within [min, max] of the series (convex
    combination) and equals the literal recurrence on every row while
    the window reaches the series start (forced: lookback > n)."""
    from datastream_spark.operators.ewma import ewma

    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(vals)],
        "stream_id string, ts double, value double",
    )
    got = {
        r.ts: r.ewma
        for r in ewma(df, alpha=0.25, lookback=64, order_col="ts").collect()
    }
    y = None
    for i, v in enumerate(vals):
        y = v if y is None else 0.25 * v + 0.75 * y
        assert abs(got[float(i)] - y) < 1e-9, (i, vals)
        assert min(vals) - 1e-9 <= got[float(i)] <= max(vals) + 1e-9


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=120
    ),
    portable=st.booleans(),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cms_merge_exact_and_one_sided(spark, keys, portable):
    """Count-min invariants (cms.py): (1) merging per-shard sketches
    equals sketching the whole input (cell-exact, both hash families);
    (2) estimates never under-count — est >= true frequency for every
    key (the one-sided CMS guarantee, deterministic given the data)."""
    from datastream_spark.operators.cms import (
        cms_estimate, cms_merge, cms_sketch,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    half = max(1, len(keys) // 2)
    a = spark.createDataFrame([(k,) for k in keys[:half]], "k long")
    b = spark.createDataFrame([(k,) for k in keys[half:]], "k long")

    kw = dict(depth=3, width=64, portable=portable)
    whole = {(r.d, r.w): r.cnt for r in cms_sketch(df, "k", **kw).collect()}
    shards = [cms_sketch(s, "k", **kw) for s in (a, b) if s.count()]
    merged = {(r.d, r.w): r.cnt for r in cms_merge(*shards).collect()}
    assert merged == whole

    est = {
        r.k: r.est
        for r in cms_estimate(cms_sketch(df, "k", **kw), df, "k", **kw).collect()
    }
    from collections import Counter

    truth = Counter(keys)
    assert set(est) == set(truth)
    for k, n in truth.items():
        assert est[k] >= n, (k, n, est[k])


_TEXT_POOL = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "pack my box with five dozen liquor jugs",
    "pack my box with five dozen liquor mugs",
    "sphinx of black quartz judge my vow",
    "ab",  # shorter than shingle_k: contributes no bands
]


@given(
    n_docs=st.integers(min_value=4, max_value=18),
    cut=st.integers(min_value=1, max_value=16),
    variants=st.lists(
        st.integers(min_value=0, max_value=len(_TEXT_POOL) - 1),
        min_size=18, max_size=18,
    ),
    keep_mod=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_maintainers_equal_rebuild(
    spark, n_docs, cut, variants, keep_mod
):
    """Property: for ANY two-commit split of ANY near-dup corpus, the
    CDC-maintained LSH band state reproduces the from-scratch
    candidate pairs exactly (pairs(old) ∪ incremental == rebuild), and
    the maintained IVF assignment survives an arbitrary OVERWRITE
    (delete + re-insert of a random keep-subset) row-identically —
    the decomposability claims of sources/cdc.py under hypothesis
    rather than one hand-picked split."""
    import math
    import shutil
    import tempfile

    from datastream_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signature_arrays,
    )
    from datastream_spark.operators.similarity import assign_ivf_cells
    from datastream_spark.sources import cdc
    from datastream_spark.sources.manifest import ManifestedTable

    cut = min(cut, n_docs - 1)
    rows = [(i, _TEXT_POOL[variants[i]]) for i in range(n_docs)]
    work = tempfile.mkdtemp(prefix="prop_inc_")
    try:
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        dt_ = ManifestedTable(spark, f"{work}/docs")
        bt = ManifestedTable(spark, f"{work}/bands")
        v0 = dt_.append(docs.where(f"doc_id < {cut}"))
        dt_.append(docs.where(f"doc_id >= {cut}"))
        geo = dict(num_hashes=8, rows_per_band=4, shingle_k=3)
        p0 = cdc.incremental_lsh_pairs(
            dt_, bt, since=None, until=v0, portable_hash=True, **geo
        )
        p1 = cdc.incremental_lsh_pairs(
            dt_, bt, since=v0, portable_hash=True, **geo
        )
        def pairset(df):
            return {(r.id_a, r.id_b, r.n_shared_bands) for r in df.collect()}
        sigs = minhash_signature_arrays(
            dt_.read(), "doc_id", "text",
            num_hashes=8, shingle_k=3, portable_hash=True,
        )
        full = pairset(
            minhash_candidate_pairs(sigs, id_col="doc_id", rows_per_band=4)
        )
        assert pairset(p0) | pairset(p1) == full

        # IVF maintenance through the same split PLUS a random overwrite
        dim = 4

        def vec(i):
            return [math.sin((i + 1) * (d + 1) * 0.7) for d in range(dim)]

        emb = spark.createDataFrame(
            [(i, vec(i)) for i in range(n_docs)],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(c, vec(100 + 13 * c)) for c in range(3)],
            "cell_id int, _cv array<double>",
        )
        et = ManifestedTable(spark, f"{work}/emb")
        e0 = et.append(emb.where(f"vec_id < {cut}"))
        et.append(emb.where(f"vec_id >= {cut}"))
        a0 = cdc.incremental_ivf_assign(
            et, None, since=None, until=e0, centroids=cents
        )
        a1 = cdc.incremental_ivf_assign(et, a0, since=e0, centroids=cents)
        v2 = et.current_version()
        et.overwrite(emb.where(f"vec_id % {keep_mod} != 0"))
        a2 = cdc.incremental_ivf_assign(et, a1, since=v2, centroids=cents)
        want = {
            (r.vec_id, r.cell_id)
            for r in assign_ivf_cells(et.read(), centroids=cents).collect()
        }
        assert {(r.vec_id, r.cell_id) for r in a2.collect()} == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Round-7 operators: classifier training parity, shuffle permutation
# ---------------------------------------------------------------------------

_clf_feats = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),    # doc id
        st.integers(min_value=0, max_value=15),   # bucket
        st.integers(min_value=1, max_value=9),    # count
    ),
    min_size=1,
    max_size=40,
)


@given(feats=_clf_feats, labels_seed=st.integers(0, 2**16))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_classifier_replay_parity_property(spark, feats, labels_seed):
    """For ANY sparse feature matrix and label assignment, the Spark
    trainer's integer weights equal the pure-Python quantized fold
    exactly — the cross-engine replay doctrine, property-tested.
    (Duplicate (doc, bucket) rows are aggregated first: the featurizer
    contract is one row per pair.)"""
    from datastream_spark.operators.classifier import train_text_classifier
    from tests.test_llm_ops import _py_train_clf

    agg: dict[tuple[int, int], int] = {}
    for d, b, c in feats:
        agg[(d, b)] = agg.get((d, b), 0) + c
    rows = [(d, b, c) for (d, b), c in sorted(agg.items())]
    labels = {d: (d * 2654435761 + labels_seed) % 2 for d, _, _ in rows}
    fdf = spark.createDataFrame(rows, "doc_id long, b long, cnt long")
    ldf = spark.createDataFrame(
        sorted(labels.items()), "doc_id long, label long"
    )
    got = {
        r["b"]: r["w_e6"]
        for r in train_text_classifier(fdf, ldf, iters=3, lr=0.5).collect()
    }
    assert got == _py_train_clf(rows, labels, 3, 0.5)


@given(
    n=st.integers(min_value=1, max_value=120),
    shards=st.integers(min_value=1, max_value=7),
    seed=st.text(alphabet="abcxyz", min_size=1, max_size=6),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_deterministic_shuffle_permutation_property(spark, n, shards, seed):
    """For ANY size, shard count, and seed: every row appears exactly
    once, pos is dense 1..len per shard, and the assignment is a pure
    function of (seed, key) — recomputing yields the identical map."""
    from datastream_spark.operators.sampling import deterministic_shuffle

    df = spark.range(n).withColumnRenamed("id", "k")
    out = deterministic_shuffle(df, "k", seed=seed, n_shards=shards)
    rows = out.collect()
    assert len(rows) == n and len({r["k"] for r in rows}) == n
    per = {}
    for r in rows:
        assert 0 <= r["shard"] < shards
        per.setdefault(r["shard"], []).append(r["pos"])
    for ps in per.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    again = {r["k"]: (r["shard"], r["pos"]) for r in out.collect()}
    assert again == {r["k"]: (r["shard"], r["pos"]) for r in rows}


# ---------------------------------------------------------------------------
# Round-8 delete-aware LSH maintenance: random histories
# ---------------------------------------------------------------------------

_history_ops = st.lists(
    st.sampled_from(["append", "delete", "rewrite"]),
    min_size=2,
    max_size=4,
)


@given(
    ops=_history_ops,
    seed=st.integers(min_value=0, max_value=10_000),
    family=st.sampled_from(["lsh", "simhash"]),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_neardup_maintenance_random_histories(spark, ops, seed, family):
    """For ANY interleaving of appends, localized takedowns, and no-op
    rewrites, against EITHER near-dup maintainer: (a) the maintained
    band/fingerprint table's live rows equal a from-scratch build over
    the surviving corpus, and (b) the union of every maintenance
    call's returned pairs, restricted to finally-alive ids, equals the
    from-scratch candidate pairs on the survivors — counts/hamming
    included, and (c) a cluster table maintained through the SAME
    history (``incremental_clusters`` on each call's new pairs,
    ``delete_from_clusters`` at each takedown) equals
    ``connected_components`` rebuilt on the survivors' pairs.
    Exercises the round-8 netting, survivor verification, tombstoning,
    and marker anti-joins — and the round-9 delete-aware cluster leg —
    across histories no hand-written test enumerates."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datastream_spark.operators.dedup import (
        band_key_frame,
        connected_components,
        delete_from_clusters,
        incremental_clusters,
        minhash_candidate_pairs,
        minhash_signature_arrays,
        simhash,
        simhash_band_rows,
        simhash_candidate_pairs,
    )
    from datastream_spark.sources import cdc
    from datastream_spark.sources.manifest import ManifestedTable

    rng = seed

    def text_of(i):
        # 4 near-dup classes -> cross-batch pairs exist in every run
        return f"alpha beta gamma delta epsilon zeta {(i + rng) % 4}"

    work = tempfile.mkdtemp(prefix="prop_neardup_")
    try:
        dt_ = ManifestedTable(spark, f"{work}/docs")
        bt = ManifestedTable(spark, f"{work}/bands")
        next_id = 12
        alive = set(range(12))
        dt_.append(
            spark.createDataFrame(
                [(i, text_of(i)) for i in range(12)],
                "doc_id long, text string",
            ).repartition(2)
        )
        emitted = []
        acc = []  # the accumulated pairs table, compacted per takedown
        clusters = None  # maintained (node, component) table

        def maintain(since):
            nonlocal clusters
            if family == "lsh":
                p = cdc.incremental_lsh_pairs(
                    dt_, bt, since=since, portable_hash=False,
                    num_hashes=8, rows_per_band=4, shingle_k=3,
                )
                cols = ("id_a", "id_b", "n_shared_bands")
            else:
                p = cdc.incremental_simhash_pairs(
                    dt_, bt, since=since, bits=60, bands=4, max_hamming=3
                )
                cols = ("id_a", "id_b", "hamming")
            if p is not None:
                rows = [tuple(r[c] for c in cols) for r in p.collect()]
                emitted.extend(rows)
                acc.extend(rows)
                if rows:
                    clusters = incremental_clusters(
                        clusters,
                        spark.createDataFrame(
                            [(a, b) for a, b, _ in rows],
                            "id_a long, id_b long",
                        ),
                    )

        maintain(None)
        for op in ops:
            v = dt_.current_version()
            if op == "append":
                batch = [(next_id + k, text_of(next_id + k)) for k in range(5)]
                alive |= {i for i, _ in batch}
                next_id += 5
                dt_.append(
                    spark.createDataFrame(
                        batch, "doc_id long, text string"
                    ).repartition(2)
                )
            elif op == "delete":
                live_sorted = sorted(alive)
                doomed = set(live_sorted[: max(1, len(live_sorted) // 4)])
                alive -= doomed
                dt_.delete_where(F.col("doc_id").isin([int(d) for d in doomed]))
                if clusters is not None and acc:
                    # cluster-level takedown leg: pass the accumulated
                    # pairs table PRE-compaction for THIS takedown
                    # (its dead rows anti-joined away inside), then
                    # compact it — exactly the
                    # compact_band_tombstones(pairs_table=...) order
                    clusters = delete_from_clusters(
                        clusters,
                        spark.createDataFrame(
                            [(a, b) for a, b, _ in acc],
                            "id_a long, id_b long",
                        ),
                        [int(d) for d in doomed],
                    )
                    acc[:] = [
                        (a, b, n) for a, b, n in acc
                        if a not in doomed and b not in doomed
                    ]
            else:  # rewrite: full overwrite, identical content
                dt_.overwrite(dt_.read().repartition(3))
            maintain(v)

        # (a) live rows == rebuild on survivors
        stored = bt.read()
        tomb = stored.where(F.col("band") == cdc.TOMBSTONE_BAND).select(
            "doc_id"
        )
        live = stored.where("band >= 0").join(tomb, "doc_id", "left_anti")
        if family == "lsh":
            want_rows = band_key_frame(
                minhash_signature_arrays(
                    dt_.read(), "doc_id", "text",
                    num_hashes=8, shingle_k=3, portable_hash=False,
                ),
                "doc_id",
                4,
            )
            key = lambda r: (r.doc_id, r.band, r.band_hash)  # noqa: E731
        else:
            want_rows = simhash_band_rows(
                simhash(dt_.read(), bits=60), "doc_id", 60, 4
            )
            key = lambda r: (r.doc_id, r.simhash, r.band, r.band_val)  # noqa: E731
        assert {key(r) for r in live.collect()} == {
            key(r) for r in want_rows.collect()
        }
        assert {r.doc_id for r in dt_.read().collect()} == alive

        # (b) emitted pairs among finally-alive ids == rebuild pairs
        if family == "lsh":
            rebuilt = minhash_candidate_pairs(
                minhash_signature_arrays(
                    dt_.read(), "doc_id", "text",
                    num_hashes=8, shingle_k=3, portable_hash=False,
                ),
                id_col="doc_id",
                rows_per_band=4,
            )
            want_pairs = {
                (r.id_a, r.id_b, r.n_shared_bands) for r in rebuilt.collect()
            }
        else:
            rebuilt = simhash_candidate_pairs(
                simhash(dt_.read(), bits=60), bits=60, bands=4, max_hamming=3
            )
            want_pairs = {
                (r.id_a, r.id_b, r.hamming) for r in rebuilt.collect()
            }
        got_pairs = {
            (a, b, n) for a, b, n in emitted if a in alive and b in alive
        }
        assert got_pairs == want_pairs

        # (c) maintained clusters == connected_components on survivors
        if clusters is not None:
            got_cl = {(r.node, r.component) for r in clusters.collect()}
            want_cl = {
                (r.node, r.component)
                for r in connected_components(
                    rebuilt.select("id_a", "id_b")
                ).collect()
            }
            assert got_cl == want_cl
    finally:
        shutil.rmtree(work, ignore_errors=True)


_mops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.integers(min_value=1, max_value=3),  # files in the commit
            st.lists(
                st.tuples(
                    st.integers(min_value=-50, max_value=1050),  # id
                    st.integers(min_value=0, max_value=9),       # bucket
                ),
                min_size=1,
                max_size=12,
            ),
        ),
        st.tuples(
            st.just("delete"),
            st.integers(min_value=-50, max_value=1050),  # lo
            st.integers(min_value=0, max_value=200),     # span
        ),
        st.tuples(st.just("pack"), st.just(0), st.just(0)),
        st.tuples(st.just("sort"), st.just(0), st.just(0)),
        st.tuples(st.just("zorder"), st.just(0), st.just(0)),
    ),
    min_size=2,
    max_size=6,
)
_preds = st.lists(
    st.tuples(
        st.sampled_from(["doc_id", "bucket"]),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        st.integers(min_value=-60, max_value=1060),
    ),
    min_size=1,
    max_size=3,
)


@given(ops=_mops, preds=_preds)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_manifest_pruning_exact_over_random_histories(spark, ops, preds):
    """The data-skipping invariant the storage layer's correctness
    rests on: for ANY history of appends / range deletes / layout
    rewrites (pack / sort_by / zorder) and ANY conjunction of simple
    predicates, `read(where=)` returns exactly `read()` filtered
    row-wise — files_where may keep too many files, never too few.
    Also pins the layout-rewrite invariants along the way: optimize
    never changes row multiset, and the change feed never emits rows
    for a data_change: false commit."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datastream_spark.sources import cdc
    from datastream_spark.sources.manifest import ManifestedTable

    work = tempfile.mkdtemp()
    try:
        t = ManifestedTable(spark, work + "/t")
        rows: list[tuple[int, int]] = []
        versions_rows: dict[int, int] = {}
        for kind, a, b in ops:
            if kind == "append":
                data = b
                df = spark.createDataFrame(
                    data, "doc_id long, bucket long"
                ).repartition(a)
                t.append(df)
                rows.extend(data)
            elif t.current_version() is None:
                continue
            elif kind == "delete":
                t.delete_where(
                    (F.col("doc_id") >= a) & (F.col("doc_id") < a + b),
                    prune=[("doc_id", ">=", a), ("doc_id", "<", a + b)],
                )
                rows = [r for r in rows if not (a <= r[0] < a + b)]
            elif kind == "pack":
                t.optimize(target_file_bytes=4096)
            elif kind == "sort":
                t.optimize(sort_by=["doc_id"], target_file_bytes=2048)
            elif kind == "zorder":
                t.optimize(
                    zorder=["doc_id", "bucket"], bits=8,
                    target_file_bytes=2048,
                )
            if t.current_version() is not None:
                versions_rows[t.current_version()] = len(rows)

        if t.current_version() is None:
            return
        # row multiset survives every history (layout rewrites incl.)
        got_all = sorted(
            (r.doc_id, r.bucket) for r in t.read().collect()
        )
        assert got_all == sorted(rows)
        # pruned read == full read filtered row-wise, for any conjuncts
        def keep(row):
            import operator as op
            table = {"=": op.eq, "!=": op.ne, "<": op.lt,
                     "<=": op.le, ">": op.gt, ">=": op.ge}
            vals = {"doc_id": row[0], "bucket": row[1]}
            return all(table[o](vals[c], v) for c, o, v in preds)

        got = sorted(
            (r.doc_id, r.bucket)
            for r in t.read(where=list(preds)).collect()
        )
        assert got == sorted(r for r in rows if keep(r))
        # candidate set is a superset of the files holding matches
        assert set(t.files_where(list(preds))) <= set(t.current_files())
        # the change feed replays the surviving row multiset exactly
        # (layout commits contribute nothing)
        feed = cdc.table_changes(t, since=None)
        net: dict[tuple, int] = {}
        if feed is not None:
            for r in feed.collect():
                k = (r.doc_id, r.bucket)
                net[k] = net.get(k, 0) + (
                    1 if r._change_type == "insert" else -1
                )
        want: dict[tuple, int] = {}
        for r in rows:
            want[r] = want.get(r, 0) + 1
        assert {k: v for k, v in net.items() if v} == want
    finally:
        shutil.rmtree(work, ignore_errors=True)
