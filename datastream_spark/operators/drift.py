"""Distribution-drift monitoring between data snapshots (PSI).

The population stability index is the standard drift alarm between a
reference snapshot and a fresh one (training data vs incoming batch,
yesterday's commit vs today's — pair it with sources/cdc.py to score
exactly the delta a commit introduced, and with operators/profile.py
for the scalar-stats side of the same report):

    PSI = sum_bins (p_ref - p_cur) * ln(p_ref / p_cur)

with proportions epsilon-floored so empty bins contribute a large
finite number instead of infinity. Rule-of-thumb thresholds (<0.1
stable, 0.1-0.25 shifting, >0.25 drifted) are the caller's business;
this module reports per-bin contributions plus the total so alerts
can say WHICH part of the distribution moved.

Scale posture: each side collapses to its n_bins-row histogram with
one two-phase hash agg (map-side partial over the scan); everything
after — totals, proportions, the PSI sum — is arithmetic over
2 x n_bins rows joined on bin id. Fixed, caller-supplied bounds keep
the binning a pure codegen projection; use the profile's min/max to
choose them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def value_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, n) fixed-width histogram over [lo, hi]; values at/under
    lo land in bin 0, at/over hi in bin n_bins-1, NULLs are skipped.
    One two-phase hash agg; output has exactly the non-empty bins."""
    if not (hi > lo) or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    w = (hi - lo) / n_bins
    v = F.col(value_col)
    b = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / w), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.where(v.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_drift(
    hist_ref: DataFrame, hist_cur: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """Per-bin PSI contributions between two ``value_histogram``
    outputs over the same binning: (bin, p_ref, p_cur, contrib).
    Sum ``contrib`` for the headline index. Bins empty on BOTH sides
    are omitted (they contribute 0); bins empty on one side use the
    epsilon floor."""
    # full-outer bin alignment as union + re-group: a FULL join cannot
    # broadcast (Spark plans SortMergeJoin FullOuter even for n_bins
    # rows) while the union re-group stays a pure hash aggregate.
    ref = hist_ref.select(
        "bin", F.col("n").alias("n_ref"), F.lit(0).cast("long").alias("n_cur")
    )
    cur = hist_cur.select(
        "bin", F.lit(0).cast("long").alias("n_ref"), F.col("n").alias("n_cur")
    )
    both = (
        ref.unionByName(cur)
        .groupBy("bin")
        .agg(F.sum("n_ref").alias("n_ref"), F.sum("n_cur").alias("n_cur"))
    )
    tot = both.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return (
        both.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            p_ref.alias("p_ref"),
            p_cur.alias("p_cur"),
            ((p_ref - p_cur) * F.log(p_ref / p_cur)).alias("contrib"),
        )
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """One-call drift score between two frames: a single row
    (psi, n_bins_used)."""
    contribs = psi_drift(
        value_histogram(ref, value_col, lo, hi, n_bins),
        value_histogram(cur, value_col, lo, hi, n_bins),
        eps,
    )
    return contribs.agg(
        F.sum("contrib").alias("psi"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )
