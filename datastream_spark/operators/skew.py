"""Skew-aware join helpers (SURVEY.md §4 optimizer notes).

AQE's skew-join splitting handles *sort-merge* skew at runtime, but
two shapes still need structural help at 100 TB:

- ``salted_join``: an aggregate-then-join (or join on a key where ONE
  side has hot keys and the other is per-key small) — salt the hot
  side's key into ``n_salts`` sub-keys and replicate the small side
  once per salt. The classic fix when a handful of keys own a double-
  digit share of the rows and a single reducer would own them.
- ``hot_keys``: find the keys worth salting by a cheap sampled count —
  salting everything costs an ``n_salts``-fold replication of the
  small side, so production jobs salt ONLY the measured heavy hitters
  and route the long tail through a plain join.

Both are plain DataFrame compositions (explode of a literal salt range
— no Python, no RNG: the salt is ``pmod(xxhash64(row-identity), n)``
so re-runs are deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hot_keys", "salted_join", "salted_join_auto"]


def hot_keys(
    df: DataFrame,
    key_col: str,
    threshold: int,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Keys whose (optionally sampled) row count exceeds ``threshold``.

    At 100 TB run this over ``sample_fraction`` of the fact side (the
    count estimate only needs to separate hot from cold, so 1% is
    plenty); the result is a tiny frame to collect or broadcast into
    ``salted_join``'s hot-path filter.
    """
    base = df if sample_fraction is None else df.sample(fraction=sample_fraction, seed=7)
    scale = 1.0 if sample_fraction is None else 1.0 / sample_fraction
    return (
        base.groupBy(key_col)
        .agg((F.count("*") * F.lit(scale)).cast("bigint").alias("est_rows"))
        .where(F.col("est_rows") > threshold)
    )


def _salt_of(cols: list[str], n_salts: int) -> Column:
    # deterministic per-row salt: hash of the full row identity, not
    # RNG — re-runs and retries land every row in the same sub-key
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s ``on`` key is skewed and ``small`` is
    per-key small (dimension-like) but too large to broadcast whole.

    The hot side's join key becomes ``(key, salt)`` with a
    deterministic per-row salt in ``[0, n_salts)``; the small side
    replicates each row ``n_salts`` times via a literal-range explode.
    A key that owned one reducer now spreads across ``n_salts`` of
    them; shuffle volume on the small side grows by ``n_salts``×,
    which is why production callers restrict salting to measured
    ``hot_keys`` and union the unsalted long tail.

    Output columns = the plain ``big.join(small, on, how)`` (salt
    column dropped); row multiset identical to the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn("_salt", _salt_of(big_cols, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, [on, "_salt"], how).drop("_salt")


def salted_join_auto(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_threshold: int,
    n_salts: int = 16,
    sample_fraction: float | None = 0.01,
    how: str = "inner",
) -> DataFrame:
    """``salted_join`` restricted to measured heavy hitters: sample the
    fact side, find keys above ``hot_threshold``, salt ONLY those, and
    route the long tail through a plain join — then union.

    This is the production form: full-table salting replicates the
    small side ``n_salts``x for every key, but skew is concentrated in
    a handful of keys by definition, so paying replication only for
    them keeps the fix proportional to the problem. The hot-key set is
    collected to the driver (heavy hitters above a count threshold are
    few by construction) and pushed into both sides as an ``isin``
    filter, which Catalyst folds into the scans.

    Row multiset equals the plain ``big.join(small, on, how)``.
    """
    hot = [
        r[0]
        for r in hot_keys(
            big, on, hot_threshold, sample_fraction=sample_fraction
        ).select(on).collect()
    ]
    if not hot:
        return big.join(small, on, how)
    is_hot = F.col(on).isin(hot)
    salted = salted_join(
        big.where(is_hot), small.where(is_hot), on, n_salts=n_salts, how=how
    )
    # NULL keys: isin() is NULL for them, so ~is_hot alone would drop
    # them from both paths. They can never match an equi-join, but a
    # LEFT join must still emit them — route them through the plain
    # path on the big side; on the small side dropping them is safe.
    plain = big.where(F.coalesce(~is_hot, F.lit(True))).join(
        small.where(~is_hot), on, how
    )
    return salted.unionByName(plain)
