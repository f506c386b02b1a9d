"""Association-rule mining over (basket, item) co-occurrence.

Market-basket statistics for event analytics: which event types (or
sources, or tags) co-occur in the same basket (user / session /
document) beyond chance. Support, confidence, and lift for item
PAIRS — the useful, bounded fragment of Apriori: higher-order
itemsets explode combinatorially and a pipeline that wants them
should iterate this operator on derived baskets instead.

Scale posture: the stream collapses to DISTINCT (basket, item) FIRST
(the same cardinality discipline as cohort retention, funnel.py), so
the self-join's per-basket fan-out is C(items_in_basket, 2) with
items bounded by the item-vocabulary size, never by event volume.
The totals side is a one-row aggregate broadcast into the final
projection; per-item supports broadcast-join onto the pair counts
(|vocabulary| rows). Everything is hash joins + two-phase aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_baskets: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_a, n_b, n_ab, confidence, lift) for every
    unordered item pair (item_a < item_b) co-occurring in at least
    ``min_pair_baskets`` baskets.

    ``confidence`` = P(b in basket | a in basket) = n_ab / n_a;
    ``lift`` = n_ab * n_baskets / (n_a * n_b) — > 1 means the pair
    co-occurs more than independent items would.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    supports = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    total = items.select(
        F.countDistinct("basket").alias("n_baskets")
    )
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_baskets)
    )
    return (
        pairs.join(
            F.broadcast(supports.select(F.col("item").alias("item_a"),
                                        F.col("n_item").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(supports.select(F.col("item").alias("item_b"),
                                        F.col("n_item").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            (F.col("n_ab") / F.col("n_a")).alias("confidence"),
            (
                F.col("n_ab") * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
