"""Column-expression helpers shared across operators and probes.

All JVM-side (``pyspark.sql.functions`` compositions) — no Python UDFs.
Portability doctrine: every helper here has a straightforward DuckDB
equivalent so the oracle probes can mirror it (SURVEY.md §2.11 rules).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column
from pyspark.sql import functions as F

_LOG = logging.getLogger("datastream_spark.functions")

__all__ = [
    "checkpoint_spread",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "md5_bucket",
    "norm_text",
    "round6",
    "spread",
    "ws_tokens",
]


#: Logical-plan node names whose presence means partitioning is
#: already governed by spark.sql.shuffle.partitions downstream of an
#: exchange — spread()'s raw-scan fan-out is then moot, and the
#: partition-count probe (``df.rdd``, a FULL physical-planning pass)
#: would be pure driver overhead. FlatMapGroupsInPandas implies a
#: groupBy exchange; Deduplicate analyzes from distinct().
_WIDE_NODES = frozenset(
    {
        "Join",
        "Aggregate",
        "Window",
        "Sort",
        "Deduplicate",
        "RepartitionByExpression",
        "FlatMapGroupsInPandas",
    }
)


def _shuffle_governed(df, max_nodes: int = 64) -> bool:
    """True when df's ANALYZED plan contains a shuffle-inducing node
    (or is too deep to be the raw-scan case spread exists for). The
    walk is O(nodes) py4j calls over the logical tree — milliseconds —
    where the alternative ``df.rdd`` pays full physical planning
    (measured 5.2 s on the round-8 curation-funnel lineage, and it
    grows with a CDC range's union width)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        seen = 0
        while stack:
            node = stack.pop()
            seen += 1
            if seen > max_nodes:
                return True  # deep narrow plan: multi-scan unions are
                # already >= one partition per leaf scan
            name = node.getClass().getSimpleName()
            if name in _WIDE_NODES:
                return True
            if name == "Repartition":
                # df.repartition(n) analyzes to Repartition(shuffle=
                # true) — governed; df.coalesce(n) to the SAME node
                # with shuffle=false, and a coalesced frame's
                # parallelism is whatever the user pinned REGARDLESS
                # of any wide node beneath it (a coalesce caps the
                # stage's task count from above), so it must NOT take
                # the fast path: skip the subtree instead of walking
                # into it, where a groupBy below would wrongly flip
                # the answer back to governed (round-9 advice; the
                # round-8 fix only handled coalesce-over-narrow).
                try:
                    if node.shuffle():
                        return True
                    continue  # coalesce: this subtree can't re-govern
                except Exception:
                    # unknown surface: walk the children — worst case
                    # spread() pays one partition probe on a frame it
                    # could have skipped, vs silently leaving a
                    # 1-task coalesce in place
                    _LOG.debug(
                        "_shuffle_governed(): Repartition without a "
                        "readable shuffle flag; walking children"
                    )
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return False
    except Exception:
        return False  # unknown plan surface: fall back to the probe


def free_local_checkpoint(df) -> None:
    """Release the executor-storage blocks behind a frame produced by
    ``df.localCheckpoint(...)``. Iterative operators (connected
    components, Bradley-Terry, PageRank) checkpoint once per round to
    truncate lineage; without an explicit free the blocks of EVERY
    round accumulate until nondeterministic py4j/JVM GC notices, so a
    long run carries the whole history in executor storage. Call this
    on round N-1's frame only AFTER round N has materialized — the
    freed frame becomes unreadable.

    No-op (never raises) when the frame is not a flat LogicalRDD —
    e.g. a caller passed a non-checkpointed frame — so loops can call
    it unconditionally on whatever they replaced."""
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() == "LogicalRDD":
            node.rdd().unpersist(False)
    except Exception:  # pragma: no cover - py4j surface drift
        _LOG.debug("free_local_checkpoint(): no-op on unknown surface")


def checkpoint_spread(df, min_partitions: int | None = None):
    """``spread(df.localCheckpoint(eager=True))`` — the named idiom
    for handing a join-bearing frame to a compute-heavy narrow stage:
    the flat LogicalRDD makes spread()'s partition probe cheap AND
    restores the fan-out its join-skip fast path would forgo (see the
    trade documented on ``spread``). Use when the frame is consumed
    more than once or its AQE partitioning may have collapsed to a
    few partitions (broadcast joins keep the probe side's raw-scan
    count)."""
    return spread(df.localCheckpoint(eager=True), min_partitions)


def spread(df, min_partitions: int | None = None):
    """Ensure enough input partitions for compute-heavy narrow stages.

    A small parquet table arrives as ONE scan partition, so an
    operator that explodes shingles / hashes tokens / scores embedding
    pairs on top of it runs its entire pre-shuffle stage in a single
    task — 1 of 32 cores on the test box, 1 of N-thousand on a real
    cluster. This round-robins the (narrow, already-projected) input
    across ``defaultParallelism`` first.

    Scale posture: a 100 TB table scans as tens of thousands of
    partitions, so the condition is false and this is a no-op — the
    repartition only ever fires on inputs small enough that the extra
    shuffle is trivially cheap. Plans that already contain a shuffle
    are returned UNTOUCHED without probing the partition count: their
    parallelism is spark.sql.shuffle.partitions by construction, and
    the probe itself is a full physical-planning pass whose cost grows
    with lineage depth (the round-8 q_x24 lesson).

    Documented trade: a join/aggregate in the tree that AQE executes
    as a BROADCAST leaves the probe side at its raw-scan partitioning,
    and this fast path skips the fan-out there. If the next stage is
    compute-heavy over a SMALL broadcast-joined frame, localCheckpoint
    it first (flat plans keep the cheap probe + fan-out — the
    curation funnel does exactly this); paying seconds of planning on
    every deep-lineage call to rescue that one case is the wrong
    default.
    """
    if _shuffle_governed(df):
        # diagnosable on purpose: a 1-partition regression composed
        # over a broadcast-joined lineage shows up here first (the
        # round-8 survivor re-verification lesson — fix with
        # checkpoint_spread, not by removing the fast path)
        _LOG.debug("spread(): shuffle-governed/deep plan, fan-out skipped")
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def dot(a: Column, b: Column) -> Column:
    """Dot product of two ARRAY<numeric> columns (zip_with + aggregate,
    whole-stage-codegen'd — the built-in path for X3 cosine).
    DuckDB mirror: ``list_dot_product``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def round6(c: Column) -> Column:
    """Probe-output float canonicalization (SURVEY.md §2.11: 6 d.p.)."""
    return F.round(c, 6)


def norm_text(c: Column) -> Column:
    """Dedup normalization: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def ws_tokens(c: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(norm_text(c), " ")


def md5_bucket(c: Column, bits_hex: int = 15) -> Column:
    """Deterministic 60-bit integer hash of a string via md5 — the
    engine-portable hash primitive (DuckDB mirror:
    ``('0x' || substring(md5(s),1,15))::bigint`` or from_hex arith).
    15 hex digits = 60 bits, fits BIGINT in both engines."""
    return F.conv(F.substring(F.md5(c), 1, bits_hex), 16, 10).cast("bigint")
