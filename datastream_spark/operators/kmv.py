"""KMV / theta distinct sketches with set operations (union, intersect).

The HLL ladder (rollup.py A+ family, probes q_e1/q_e2) answers
per-group distinct counts and unions, but HLL fundamentally cannot
intersect: "how many users did BOTH X and Y this week" needs a fresh
scan per pair. The K-Minimum-Values sketch (Beyer, Haas, Reinwald,
Sismanis, Gemulla — "On synopses for distinct value estimation under
multiset operations", SIGMOD 2007) closes that gap: keep the ``k``
smallest hash values of each group's element set; then

- estimate  = (k-1) / theta      where theta = kth-smallest / 2^60
  (exact count when the group has fewer than ``k`` distinct hashes),
- union     = re-minimize the pooled hash sets,
- intersect = count common hashes below the pair's shared theta
  (the theta-sketch composition of Dasgupta et al., the public
  DataSketches construction).

SURVEY.md §2 A+ (approx-aggregate family); the reference's
downsamplers are exact — this extends the sketch ladder the same way
cms.py does for frequencies.

Representation is LONG FORM, ≤ ``k`` rows of (group, h) per group —
same doctrine as cms.py: building is one distinct-style aggregation
plus a rank-filter whose ``row_number() <= k`` Spark rewrites into a
map-side WindowGroupLimit (each shuffle map task emits at most ``k``
rows per group BEFORE the exchange, so the shuffle carries
O(groups*k) rows regardless of input size); merging is a union +
re-rank; every estimate/set-op below runs on ≤ groups*k rows and is
broadcast-joinable by construction.

Hash-family doctrine matches cms.py/dedup.py: ``portable=True`` uses
the md5-hex→60-bit-bigint chain (`functions.md5_bucket`) that DuckDB
replays verbatim — and because KMV is hash-deterministic, the oracle
then replays ESTIMATES bit-for-bit, no tolerance gate needed (unlike
the engine-private HLL bytes of q_e1/q_e2). ``portable=False`` uses
``shiftrightunsigned(xxhash64(s), 4)`` (uniform on [0, 2^60), one JVM
intrinsic per row) for the 100 TB path.

Cross-engine float doctrine: every estimate below is derived from
exact BIGINT sketch state (counts and hash values) through single
IEEE double ops (one multiply, one divide) — both engines produce
bit-identical doubles, so probes may gate ``floor(est)`` /
``floor(ratio * 1e6)`` without the ROUND-half or sum-associativity
hazards documented in tools/float_divergence.py.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..functions import md5_bucket

_LOG = logging.getLogger("datastream_spark.kmv")

__all__ = [
    "kmv_hash",
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_pair_overlap",
    "bottomk_sample",
    "sample_quantiles",
]

#: Hash domain: 60 bits, so the portable (15-hex md5) and production
#: (xxhash64 >> 4) families share one theta arithmetic.
HASH_SPACE = float(1 << 60)


def kmv_hash(element: Column, portable: bool = True) -> Column:
    """Uniform 60-bit BIGINT hash of a string element."""
    if portable:
        return md5_bucket(element)
    return F.shiftrightunsigned(F.xxhash64(element), 4)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    element: Column,
    k: int = 256,
    portable: bool = True,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct element
    hashes, as long-form rows (group_cols..., h BIGINT).

    Two keyed exchanges, both on the group key family: a hash-distinct
    on (group, h) with map-side partial aggregation (collapses repeat
    elements — the common case on fact tables — before the shuffle),
    then the rank filter, which Spark's WindowGroupLimit rewrite
    bounds to ``k`` rows per group per map task pre-shuffle.
    """
    # NULL elements carry no identity: kmv_hash(NULL) is NULL, and an
    # ascending orderBy would otherwise seat NULL at rank 1 and poison
    # every estimate. Dropped here (and in the streaming twin) so the
    # two paths agree on NULL-bearing data.
    hashed = (
        df.select(*group_cols, kmv_hash(element, portable).alias("h"))
        .where(F.col("h").isNotNull())
        .groupBy(*group_cols, "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(sketch: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Merge sketches down to a coarser grouping (possibly empty =
    one global sketch): pool the hash sets, dedup, re-take the k
    smallest. Exactly the sketch the coarser grouping would have
    built from raw data — the KMV merge theorem — so cascades
    (hour→day→week) never re-read facts."""
    pooled = sketch.groupBy(*group_cols, "h").agg(F.lit(1).alias("_one")).drop("_one")
    w = Window.partitionBy(*group_cols).orderBy("h") if group_cols else (
        Window.partitionBy().orderBy("h")
    )
    return (
        pooled.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Distinct-count estimate per group from a long-form sketch.

    Returns (group_cols..., n_hashes BIGINT, theta_h BIGINT,
    est_distinct DOUBLE): exact ``n_hashes`` when the sketch is not
    full (fewer than k distinct elements — small groups pay zero
    estimation error), else the KMV estimator (k-1) * 2^60 / kth.
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count("h").alias("n_hashes"),
        F.max("h").alias("theta_h"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("theta_h").cast("double"))
    return agg.withColumn("est_distinct", est)


def kmv_pair_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
    max_groups: int | None = 1024,
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups of one
    sketch frame: (g_a, g_b, est_a, est_b, est_intersect, est_union,
    jaccard_e6) for g_a < g_b.

    Theta-sketch composition: the pair's threshold is
    theta = min(theta_a, theta_b) (2^60+1, i.e. no cut, for non-full
    sketches); hashes below theta from either side form a uniform
    sample of the pair's union, so with D = |pooled hashes < theta|
    and C = |common hashes < theta|:

        est_union = D / (theta / 2^60),  est_intersect = C / (theta/2^60),
        jaccard   = C / D.

    All inputs to the arithmetic are exact BIGINTs; jaccard_e6 is
    floor(C/D * 1e6).

    Execution shape — the sketch is consumed EXACTLY ONCE: one
    aggregation collapses each group to a single row carrying its
    hash set as an ≤ k-element array (so the expensive fact-derived
    lineage is never re-evaluated per consumer branch — the dedup.py
    lesson), then the pair matrix is a tiny self-join of
    one-row-per-group frames and every set operation is an in-memory
    ``array_intersect``/``size`` over bounded arrays. No fact-table
    rescan per pair, no big shuffle, no session cache pinned.

    The pair matrix is G²/2 rows of ≤k-element arrays for G groups —
    meant for comparing a handful of segments, not a high-cardinality
    group column (G=10⁴ is already 5·10⁷ array intersections).
    ``max_groups`` refuses past that cliff (the fuzzyjoin
    ``max_block_rows`` discipline: a deterministic refusal, never a
    silent quadratic); counting groups costs one tiny agg over the
    already-bounded sketch frame. Pass ``max_groups=None`` to
    deliberately accept the G² product.
    """
    g = sketch.groupBy(group_col).agg(
        F.count("h").alias("n_hashes"),
        F.max("h").alias("theta_h"),
        F.collect_list("h").alias("hs"),
    )
    if max_groups is not None:
        # Materialize the one-row-per-group frame ONCE and take the
        # guard count from it: the previous count_distinct guard was a
        # separate driver action over the raw sketch, so the expensive
        # fact-derived sketch lineage ran for the guard, then AGAIN
        # for each side of the pair join. The checkpointed frame is at
        # most max_groups rows of ≤k-element arrays; past the bound we
        # still refuse before any quadratic work (the checkpoint cost
        # is one sketch pass — the same price the guard alone paid).
        # The guard count rides the checkpoint's own materializing
        # action as an Observation (the dedup.py cc_round idiom) —
        # one job, not checkpoint-then-count.
        obs = Observation("kmv_pair_groups")
        g = g.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        n_groups = obs.get["n"]
        if n_groups > max_groups:
            raise ValueError(
                f"kmv_pair_overlap: {n_groups} distinct groups exceeds "
                f"max_groups={max_groups} — the pair matrix is G²/2 rows "
                f"of ≤k-element array intersections "
                f"(~{n_groups * (n_groups - 1) // 2} pairs here). Compare "
                "fewer segments (filter the sketch first), or pass "
                "max_groups=None to accept the quadratic product."
            )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("theta_h").cast("double")
    )
    cut = F.when(F.col("n_hashes") < k, F.lit((1 << 60) + 1)).otherwise(
        F.col("theta_h")
    )
    meta = g.select(
        F.col(group_col), est.alias("est"), cut.alias("_cut"), "hs"
    )
    a = meta.select(
        F.col(group_col).alias("g_a"),
        F.col("est").alias("est_a"),
        F.col("_cut").alias("_cut_a"),
        F.col("hs").alias("_hs_a"),
    )
    b = meta.select(
        F.col(group_col).alias("g_b"),
        F.col("est").alias("est_b"),
        F.col("_cut").alias("_cut_b"),
        F.col("hs").alias("_hs_b"),
    )
    theta = F.least("_cut_a", "_cut_b")
    pairs = a.join(b, F.col("g_a") < F.col("g_b")).withColumn("_theta", theta)
    fa = F.filter(F.col("_hs_a"), lambda x: x < F.col("_theta"))
    fb = F.filter(F.col("_hs_b"), lambda x: x < F.col("_theta"))
    c_common = F.size(F.array_intersect(fa, fb))
    d_pool = F.size(fa) + F.size(fb) - c_common
    scale = F.col("_theta").cast("double") / F.lit(HASH_SPACE)
    return (
        pairs.withColumn("_c", c_common.cast("bigint"))
        .withColumn("_d", d_pool.cast("bigint"))
        .select(
            "g_a",
            "g_b",
            "est_a",
            "est_b",
            (F.col("_c").cast("double") / scale).alias("est_intersect"),
            (F.col("_d").cast("double") / scale).alias("est_union"),
            F.when(
                F.col("_d") > 0,
                F.floor(
                    F.col("_c").cast("double")
                    / F.col("_d").cast("double")
                    * F.lit(1_000_000.0)
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("jaccard_e6"),
        )
    )


#: Prefilter sizing: expected retained rows per group is
#: _PREFILTER_FACTOR * k + _PREFILTER_FLOOR. Module-level so the
#: fallback path is testable by forcing an undershoot.
_PREFILTER_FACTOR = 8
_PREFILTER_FLOOR = 256
#: The per-group thresholds broadcast; a counts frame bigger than
#: this cannot (Spark's broadcast limit / driver memory), so the
#: prefilter self-disables. ~1M rows of (group, thr) is tens of MB.
_PREFILTER_MAX_GROUPS = 1_000_000


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int = 512,
    portable: bool = True,
    prefilter: bool = True,
) -> DataFrame:
    """Uniform, MERGEABLE per-group row sample: the rows whose hashed
    ``id_col`` ranks among the group's ``k`` smallest. The same
    min-k merge theorem as the distinct sketch applies row-wise —
    the bottom-k of a union is the re-minimized pool of per-shard
    bottom-ks — so shards sample independently and merge without
    re-reading facts, which is what a coordinated `TABLESAMPLE`
    cannot do. ``id_col`` must be row-unique within the group
    (duplicate ids would bias the draw; the hash makes the draw
    deterministic and engine-portable). Rows keep all their columns;
    the hash rides along as ``_h`` for re-merging.

    Execution (round 7): the WindowGroupLimit rank path bounds the
    SHUFFLE at k rows per group per map task, but its required local
    sort still compares every input row — measured as the dominant
    cost at sf10 (13 of 25 s; row width was NOT the cost: pruning to
    3 columns saved only 2.4 s). ``prefilter=True`` (default) kills
    that sort with a threshold cut: one skinny counts pass gives each
    group's row count n, each group keeps rows with
    ``_h < 2^60 * m / n`` where m = 8k+256 (expected m survivors —
    Chernoff puts P(fewer than k) below exp(-(7k+256)^2 / (2m)),
    ~1e-700 at k=512), and the rank sort then runs over ~m rows per
    group instead of all of them. EXACTNESS IS NOT PROBABILISTIC: the
    prefilter path runs eagerly (the sample is localCheckpoint'ed),
    a bounded guard compares per-group retained counts against
    least(n, k), and any undershoot falls back to the full-sort path
    — the threshold only ever decides how fast the exact answer
    arrives. The prefilter also self-disables (full-sort path) when
    groups * m >= input rows (many tiny groups: nothing to cut — and
    the counts frame must broadcast, so group cardinality is capped
    by the same check). sf10 measured: 25.7 -> 11.2 s (md5 gate
    family), 13.3 -> 3.5 s (production xxhash).
    """
    h = kmv_hash(F.col(id_col).cast("string"), portable)
    hashed = df.withColumn("_h", h).where(F.col("_h").isNotNull())
    w = Window.partitionBy(*group_cols).orderBy("_h", id_col)

    def ranked(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )

    if not prefilter:
        return ranked(hashed)
    m = _PREFILTER_FACTOR * k + _PREFILTER_FLOOR
    # Skinny counts pass: group cols only, no hashing (h(id) is NULL
    # iff id is NULL, so the not-null universes agree).
    counts = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("g"), F.sum("_n").alias("n")
    ).collect()[0]
    if tot["g"] is None or tot["n"] is None or tot["g"] * m >= tot["n"]:
        # nothing to cut (or empty input): the filter would keep
        # ~everything while paying two scans — use the plain path
        return ranked(hashed)
    if tot["g"] > _PREFILTER_MAX_GROUPS:
        # the per-group thresholds ride a broadcast join, so group
        # cardinality — NOT just groups*m vs rows — must stay
        # broadcast-sized; past this the plain one-shuffle
        # WindowGroupLimit path is the right plan anyway
        return ranked(hashed)
    thr = F.when(F.col("_n") <= F.lit(m), F.lit(1 << 62)).otherwise(
        (
            F.lit(float(1 << 60)) * F.lit(float(m)) / F.col("_n").cast("double")
        ).cast("bigint")
        + F.lit(1)
    )
    # Null-safe key equality: a NULL group is a real group to the
    # window path, but a plain equi-join never matches NULL keys —
    # without <=> every NULL-group row would be dropped here, the
    # guard would read _got=0, and EVERY call would pay the prefilter
    # then fall back with a spurious hash warning.
    keys = counts.select(
        *[F.col(c).alias(f"_k_{c}") for c in group_cols], thr.alias("_thr")
    )
    on_keys = None
    for c in group_cols:
        cond = F.col(c).eqNullSafe(F.col(f"_k_{c}"))
        on_keys = cond if on_keys is None else on_keys & cond
    filtered = (
        hashed.join(F.broadcast(keys), on_keys)
        .where(F.col("_h") < F.col("_thr"))
        .drop("_thr", *[f"_k_{c}" for c in group_cols])
    )
    # Eager: materialize the (bounded, <= groups*k rows) sample once;
    # the guard below re-reads the checkpoint, not the fact scan.
    sample = ranked(filtered).localCheckpoint(eager=True)
    retained = sample.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_got"))
    on_guard = None
    for c in group_cols:
        cond = counts[c].eqNullSafe(retained[c])
        on_guard = cond if on_guard is None else on_guard & cond
    short = (
        counts.join(retained, on_guard, "left")
        .where(
            F.coalesce(F.col("_got"), F.lit(0)) < F.least(F.col("_n"), F.lit(k))
        )
        .limit(1)
        .count()
    )
    if short:
        _LOG.warning(
            "bottomk_sample: threshold prefilter undershot a group "
            "(P ~ exp(-%d) — check the hash inputs); recomputing via "
            "the full-sort path",
            (_PREFILTER_FACTOR - 1) * k + _PREFILTER_FLOOR,
        )
        return ranked(hashed)
    return sample


def sample_quantiles(
    sample: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
) -> DataFrame:
    """Nearest-rank quantiles over a (bounded) per-group sample:
    q_p = the ceil(p·n)-th smallest value. Selection, not
    interpolation — the output values are actual sample members, so
    estimates replay bit-for-bit cross-engine with no float gate
    beyond the single ceil(p·n) index op. Feed it ``bottomk_sample``
    output for the mergeable approximate-quantile path (the sketch
    ladder's answer to percentile queries: HLL→counts,
    CMS→frequencies, KMV→distincts, bottom-k→quantiles), or any
    bounded frame for exact small-group quantiles."""
    if not probs:
        raise ValueError("sample_quantiles: need at least one probability")
    for p in probs:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"sample_quantiles: p={p} outside (0, 1]")
    def _label(p: float) -> str:
        # %g keeps sub-percent quantiles distinct (0.001 -> 'p0_1');
        # a round-to-int label would collide them (p00, p00).
        return "p" + f"{p * 100:g}".replace(".", "_")

    labels = [_label(p) for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"sample_quantiles: duplicate quantile labels {labels}"
        )
    arr = F.sort_array(F.collect_list(F.col(value_col).cast("double")))
    base = sample.groupBy(*group_cols).agg(arr.alias("_vals"))
    n = F.size("_vals")
    cols = [F.col(c) for c in group_cols] + [n.cast("long").alias("n")]
    for p, label in zip(probs, labels):
        # The 1e-9 backoff keeps ceil from jumping a rank when p*n is
        # mathematically an integer but lands a hair above it in IEEE
        # (0.07 * 100 = 7.000000000000001 -> rank 8 without it); a
        # true fractional part below 1e-9 never occurs for sample
        # sizes within the sketch's bounds. Oracles replay the same
        # expression, so the gate stays bit-exact either way.
        idx = F.greatest(
            F.ceil(F.lit(float(p)) * n - F.lit(1e-9)), F.lit(1)
        ).cast("int")
        cols.append(F.element_at("_vals", idx).alias(label))
    return base.select(*cols)
