"""Bradley-Terry preference aggregation (MM algorithm, Hunter 2004).

RLHF-style curation aggregates millions of pairwise preferences
("response A beat response B", "annotator preferred source X") into
per-item strength scores; Bradley-Terry is the canonical model and
the minorization-maximization update its standard solver:

    s_i  <-  W_i / sum_j  n_ij / (s_i + s_j)

(W_i = item i's total wins, n_ij = games between i and j), normalized
each round. SURVEY.md §2.10 extended surface — net-new.

Execution shape: the ONLY fact-sized work is counting — one groupBy
for the unordered pair matrix, one for per-item wins. The iterations
run on the aggregated frames, which are item-bounded by definition
(a preference corpus compares a bounded catalog of items, each many
times). Two paths share one arithmetic spec:

- ``pairs <= driver_max_pairs`` (default 1e6, ~1.4k items dense):
  the aggregated matrix collects to the driver and iterates in numpy
  — the size-gated control-plane pattern of dedup.connected_components
  and similarity's query-set LUTs.
- bigger catalogs: the same update as ``iters`` rounds of
  broadcast-item joins, persist-truncated lineage, never a collect.
  Parity between the two paths is pinned by test on identical input.

Cross-engine doctrine (tools/float_divergence.py) — what makes an
ITERATIVE float algorithm hash-gateable at all: every cross-row SUM
in the update is made exact by quantize-then-integer-sum, and every
float op is a per-row chain from identical integers:

    t_ij  = floor(n_ij / (s_i + s_j) * 1e6)        -- BIGINT terms
    d_i   = SUM_j t_ij                             -- exact BIGINT
    r_i   = floor(W_i / (d_i / 1e6) * 1e9)         -- BIGINT
    total = SUM_i r_i                              -- exact BIGINT
    s_i   = clamp(r_i / total, 1e-4, 1.0)          -- identical doubles

so a fixed-iteration run replays bit-for-bit in DuckDB (unrolled
CTEs), in numpy (IEEE doubles), and in the join path. The 1e-4 clamp
bounds every term against BIGINT overflow (safe while any single
pair's n_ij < ~1.8e9) and keeps zero-win items at a loud floor
instead of a vanishing denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import free_local_checkpoint

__all__ = ["bradley_terry_scores"]

_S_FLOOR = 1e-4


def _counts(
    comparisons: DataFrame, winner_col: str, loser_col: str
) -> tuple[DataFrame, DataFrame]:
    """(unordered pair counts, per-item wins+games) — derived from ONE
    fact-sized aggregation: the ORDERED (winner, loser, n) pair-count
    table, materialized once (localCheckpoint) at <= m² rows. The old
    formulation aggregated the facts three separate ways, so the
    `items` frame carried fact lineage and its materialization in the
    joins path paid a SECOND full fact pass (measured at sf10: 101 s —
    round-9 fix, VERDICT r8 #3); wins/games are sums over the ordered
    counts, so every downstream frame is item-catalog-bounded and the
    values are bit-identical integer counts either way."""
    g = comparisons.select(
        F.col(winner_col).alias("_w"), F.col(loser_col).alias("_l")
    ).where(F.col("_w") != F.col("_l"))
    ordered = (
        g.groupBy(F.col("_w").alias("_a"), F.col("_l").alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        ordered.select(
            F.least("_a", "_b").alias("i"),
            F.greatest("_a", "_b").alias("j"),
            "_n",
        )
        .groupBy("i", "j")
        .agg(F.sum("_n").alias("n"))
    )
    wins = ordered.groupBy(F.col("_a").alias("item")).agg(
        F.sum("_n").alias("wins")
    )
    games = (
        ordered.select(F.col("_a").alias("item"), "_n")
        .unionByName(ordered.select(F.col("_b").alias("item"), "_n"))
        .groupBy("item")
        .agg(F.sum("_n").alias("games"))
    )
    items = games.join(wins, "item", "left").select(
        "item",
        F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
        F.col("games").cast("long").alias("games"),
    )
    return pairs, items


def bradley_terry_scores(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 8,
    driver_max_pairs: int = 1_000_000,
) -> DataFrame:
    """Per-item Bradley-Terry strengths from a (winner, loser) frame.

    Output: (item, wins, games, score_e6 BIGINT, rank BIGINT) —
    ``score_e6 = floor(s * 1e6)`` after exactly ``iters`` MM rounds of
    the quantized update in the module docstring, ranks on
    (score desc, item). Self-games are dropped. Deterministic and
    engine-replayable by construction; see the doctrine note above.
    """
    if iters < 1:
        raise ValueError("bradley_terry_scores: iters must be >= 1")
    spark = comparisons.sparkSession
    pairs, items = _counts(comparisons, winner_col, loser_col)
    pairs = pairs.persist()
    n_pairs = pairs.count()

    if n_pairs <= int(driver_max_pairs):
        out = _bt_driver(spark, pairs, items, iters)
    else:
        out = _bt_joins(pairs, items, iters)
    pairs.unpersist()
    w = Window.orderBy(F.col("score_e6").desc(), F.col("item"))
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


def _bt_driver(spark, pairs: DataFrame, items: DataFrame, iters: int) -> DataFrame:
    """Size-gated control-plane path: numpy MM over the aggregated
    pair matrix (bounded rows by the caller's gate, never the facts)."""
    import math

    from pyspark.sql import types as T

    prows = pairs.collect()
    irows = items.collect()
    if not irows:
        raise ValueError("bradley_terry_scores: no valid comparisons")
    idx = {r["item"]: k for k, r in enumerate(irows)}
    wins = [float(r["wins"]) for r in irows]
    m = len(irows)
    s = [1.0 / m] * m
    plist = [(idx[r["i"]], idx[r["j"]], float(r["n"])) for r in prows]
    for _ in range(iters):
        d = [0] * m
        for a, b, n in plist:
            t = math.floor(n / (s[a] + s[b]) * 1e6)
            d[a] += int(t)
            d[b] += int(t)
        r_ = [
            math.floor(wins[k] / (d[k] / 1e6) * 1e9) if d[k] > 0 else 0
            for k in range(m)
        ]
        total = sum(int(x) for x in r_)
        # float() both operands BEFORE dividing: the join path and the
        # oracle cast each BIGINT to double first, and python int/int
        # true division rounds the exact rational instead — a 1-ulp
        # divergence once r/total exceed 2^53, which the doctrine of
        # per-row-identical float chains exists to exclude.
        s = [
            min(max(float(r_[k]) / float(total), _S_FLOOR), 1.0)
            for k in range(m)
        ]
    score = {r["item"]: math.floor(s[idx[r["item"]]] * 1e6) for r in irows}
    schema = T.StructType(
        list(items.schema.fields)
        + [T.StructField("score_e6", T.LongType(), False)]
    )
    return spark.createDataFrame(
        [
            (r["item"], r["wins"], r["games"], int(score[r["item"]]))
            for r in irows
        ],
        schema,
    )


def _bt_joins(pairs: DataFrame, items: DataFrame, iters: int) -> DataFrame:
    """Distributed path: the identical quantized update as item-frame
    joins. ``sym`` holds each pair in both orientations keyed on the
    focal item; every round is broadcast-sized because the item
    catalog is, by definition, aggregate-bounded."""
    sym = (
        pairs.select("i", "j", "n")
        .unionByName(
            pairs.select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.col("n")
            )
        )
        .persist()
    )
    # items derives from the fact-sized comparisons frame and is read
    # 2+ times per iteration (the r join and, transitively, the eager
    # checkpoint) plus the final join — materialize it ONCE so the
    # contract "the only fact-sized work is counting" holds in the
    # join path too.
    items = items.localCheckpoint()
    m = items.count()
    s = items.select("item", F.lit(1.0 / m).alias("s"))
    for _ in range(iters):
        sb = F.broadcast(s)
        d = (
            sym.join(sb.select(F.col("item").alias("i"), F.col("s").alias("_si")), "i")
            .join(
                sb.select(F.col("item").alias("j"), F.col("s").alias("_sj")),
                "j",
            )
            .select(
                F.col("i").alias("item"),
                F.floor(F.col("n") / (F.col("_si") + F.col("_sj")) * 1e6)
                .cast("long")
                .alias("_t"),
            )
            .groupBy("item")
            .agg(F.sum("_t").alias("_d"))
        )
        # checkpoint r BEFORE fanning it out: both the total broadcast
        # and s's materialization read r, and without the barrier each
        # would re-execute d's shuffle (two shuffle jobs per round for
        # one round's arithmetic — measured round-9)
        r = (
            items.join(d, "item", "left")
            .select(
                "item",
                F.when(
                    F.col("_d") > 0,
                    F.floor(
                        F.col("wins") / (F.col("_d") / 1e6) * 1e9
                    ).cast("long"),
                )
                .otherwise(F.lit(0))
                .alias("_r"),
            )
            .localCheckpoint()
        )
        # r is materialized (eager checkpoint), so the PREVIOUS
        # round's s — consumed only through d — can release its
        # executor blocks now; without this every round's checkpoint
        # accumulates until nondeterministic JVM GC notices (no-op on
        # round 1, where s is a plain projection of items).
        free_local_checkpoint(s)
        total = r.agg(F.sum("_r").alias("_total"))
        # localCheckpoint truncates the LOGICAL plan each round — s is
        # referenced twice next round (both join sides), so without
        # the barrier the plan tree doubles per iteration (the
        # PageRank lesson, operators/graphs.py:129).
        s = (
            r.crossJoin(F.broadcast(total))
            .select(
                "item",
                F.least(
                    F.greatest(
                        F.col("_r") / F.col("_total"), F.lit(_S_FLOOR)
                    ),
                    F.lit(1.0),
                ).alias("s"),
            )
            .localCheckpoint()
        )
        # s is materialized; this round's r (read by total + the s
        # checkpoint) is done.
        free_local_checkpoint(r)
    sym.unpersist()  # the final join reads only items + checkpointed s
    return items.join(s, "item").select(
        "item",
        "wins",
        "games",
        F.floor(F.col("s") * 1e6).cast("long").alias("score_e6"),
    )
