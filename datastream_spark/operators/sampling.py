"""Deterministic sampling for training-data pipelines (SURVEY.md §2.10
extended surface — net-new, no reference citation).

Training corpora are sampled by CONTENT-STABLE hash, not RNG: the same
document always lands on the same side of the cut, so samples are
reproducible across runs, engines, and cluster sizes, and upstream/
downstream jobs can re-derive membership without a join. This is the
industry-standard trick (hash-mod bucketing) and — unlike
``DataFrame.sample`` — it is oracle-checkable, because md5 is identical
everywhere.

Both operators are pure scan-side filters: no shuffle, no state, fully
pushed into the scan stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash-space resolution: fractions quantize to 1/10000.
BUCKETS = 10_000


def hash_bucket(key: Column) -> Column:
    """Stable bucket in [0, BUCKETS): md5 of the key's string form.
    Portable: DuckDB computes the identical value from the identical
    expression (probe q_x11)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("bigint")
        % BUCKETS
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket
    space. Deterministic and stable under re-runs and unions."""
    return df.where(hash_bucket(F.col(key_col)) < int(fraction * BUCKETS))


def weighted_sample(df: DataFrame, key_col: str, weight: Column) -> DataFrame:
    """Quality-weighted deterministic sampling (importance resampling):
    keep each row with probability ``weight`` (a per-row Column in
    [0, 1], e.g. a quality score), decided by the row's content-stable
    hash instead of RNG. The standard trick for skimming a 100 TB
    corpus toward its high-quality tail while staying reproducible:
    membership is a pure function of (key, weight expression), so
    re-runs, engines, and partial re-processing all agree row-by-row.

    Keep rule: ``hash_bucket(key) < floor(weight * BUCKETS)`` — one
    codegen'd scan-side filter, no shuffle, no state. A NULL weight is
    coalesced to 0.0 (row dropped, same outcome) so missing scores read
    as an explicit zero-probability decision rather than a silent
    NULL-comparison filter that masquerades as low sampling odds.
    """
    return df.where(
        hash_bucket(F.col(key_col))
        < F.floor(F.coalesce(weight, F.lit(0.0)) * BUCKETS).cast("bigint")
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]] | dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row gets a
    split label from consecutive hash-bucket ranges, so membership is
    a pure function of the key — stable across runs, engines, cluster
    sizes, and incremental re-processing (a new batch of rows never
    reshuffles old rows between splits, the classic RNG-split bug).

    ``splits`` is ordered (name, fraction) pairs; fractions quantize
    to 1/BUCKETS and must sum to ≤ 1. Rows past the cumulative sum
    get NULL (held out entirely) — summing to exactly 1 covers every
    NON-NULL-keyed row. A NULL key hashes to NULL, so the row lands
    in the NULL holdout too — an explicit "unkeyed rows belong to no
    split" rule (the same doctrine as ``weighted_sample``'s NULL
    weight), not an accident; filter or key-fill upstream if every
    row must be split. Pure projection: no shuffle, no state,
    codegen'd CASE over the same scan-side hash as ``hash_sample``.
    """
    items = list(splits.items()) if isinstance(splits, dict) else list(splits)
    if not items:
        raise ValueError("assign_splits: need at least one split")
    names = [name for name, _ in items]
    if len(set(names)) != len(names):
        raise ValueError(f"assign_splits: duplicate split names in {names}")
    if any(frac <= 0 for _, frac in items):
        raise ValueError("assign_splits: fractions must be positive")
    if sum(frac for _, frac in items) > 1 + 1e-9:
        raise ValueError("assign_splits: fractions must sum to <= 1")

    bucket = hash_bucket(F.col(key_col))
    expr = None
    cum = 0.0
    prev_threshold = 0
    for name, frac in items:
        cum += frac
        threshold = int(round(cum * BUCKETS))
        if threshold <= prev_threshold:
            # A fraction below the 1/BUCKETS quantum would make this
            # split silently unreachable — fail loudly instead.
            raise ValueError(
                f"assign_splits: split {name!r} fraction {frac} quantizes "
                f"to zero buckets (resolution is 1/{BUCKETS})"
            )
        prev_threshold = threshold
        cond = bucket < threshold
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value -> keep fraction (missing strata are dropped). The per-row
    threshold is a CASE expression, so the whole operator stays one
    codegen'd filter over the scan."""
    thr: Column = F.lit(-1)
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        n = int(frac * BUCKETS)
        expr = F.when(cond, n) if expr is None else expr.when(cond, n)
    thr = expr.otherwise(F.lit(-1)) if expr is not None else thr
    return df.where(hash_bucket(F.col(key_col)) < thr)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    *,
    seed: str,
    n_shards: int,
    id_tiebreak: bool = True,
) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: assign
    every row a ``(shard, pos)`` — shard by one salted content hash,
    order inside the shard by a second — so the training order is a
    pure function of ``(seed, key)``. Re-runs, engines, resumed jobs,
    and differently-sized clusters all produce the identical epoch
    order; changing ``seed`` is a fresh epoch permutation. This is the
    shuffle a 100 TB pretraining pipeline actually wants: no RNG, no
    global sort, shard files writable independently.

    Adds ``shard INT`` and ``pos BIGINT`` (1-based within shard; read
    order = (shard, pos)). ``pos`` is a row_number window PARTITIONED
    BY shard — at scale each shard sorts independently in parallel
    (pick ``n_shards`` ≈ output files; a 100 TB corpus at 4k shards
    sorts ~25 GB per shard, spill-safe), never a single-partition
    global window. The ordering hash is salted differently from the
    shard hash so within-shard order is not correlated with shard
    assignment; ties on the ordering hash (60-bit — birthday-rare)
    break on the key itself for total determinism.
    """
    if n_shards < 1:
        raise ValueError("deterministic_shuffle: n_shards must be >= 1")
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    shard_h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|shard|"), key)), 1, 15), 16, 10
    ).cast("bigint")
    order_h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|order|"), key)), 1, 15), 16, 10
    ).cast("bigint")
    out = df.withColumn("shard", (shard_h % n_shards).cast("int")).withColumn(
        "_ord", order_h
    )
    order_cols = [F.col("_ord")] + ([F.col(key_col)] if id_tiebreak else [])
    w = Window.partitionBy("shard").orderBy(*order_cols)
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("_ord")
