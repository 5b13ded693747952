"""Market-basket co-occurrence: frequent pairs, confidence, lift.

Classic warehouse analytics the reference lacks (SURVEY §2.9). The
naive pair generator explodes on big baskets (a basket of k items
emits k(k−1)/2 pairs — one pathological 10⁵-item basket is 5·10⁹
rows); the scale discipline here is the Apriori property: an item
below min-support cannot appear in a frequent pair, so items are
support-filtered BEFORE pair generation (broadcast semi-join — the
frequent-item set is small by definition), and a ``max_basket``
guard drops degenerate baskets outright (same reasoning as the dedup
family's Σ|bucket|² bound: document the cap, don't let one hot key
quadratically own the job).

Pair statistics over n baskets:
    support(a,b) = n_ab / n
    confidence(a→b) = n_ab / n_a
    lift(a,b) = n·n_ab / (n_a·n_b)   (symmetric, >1 ⇔ positive assoc)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_lakehouse_project_spark.cacheutil import release_on_gc


def basket_pair_stats(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_count: int = 2,
    min_pair_count: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Frequent co-occurring item pairs with support/confidence/lift.

    One distinct (basket, item) projection → item support counts →
    Apriori filter (broadcast) → self-join per basket (item_a < item_b)
    → pair counts → stats joined from the tiny item-count table.

    Output: (item_a, item_b, n_a, n_b, n_ab, lift, conf_a_to_b) —
    pairs with n_ab ≥ min_pair_count.
    """
    pairs_src = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    item_counts = pairs_src.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    frequent = item_counts.where(F.col("n_item") >= min_item_count)
    kept = pairs_src.join(
        F.broadcast(frequent.select("item")), "item", "left_semi"
    )
    sizes = kept.groupBy("basket").agg(F.count(F.lit(1)).alias("_bs"))
    kept = kept.join(
        F.broadcast(sizes.where(F.col("_bs") <= max_basket)
                    .select("basket")),
        "basket",
        "left_semi",
    )
    # the self-join references `kept` twice: persist it (released with
    # the result — cacheutil convention) so the distinct + semi-join
    # prefix runs once, not once per side
    kept = kept.persist()
    a = kept.select("basket", F.col("item").alias("item_a"))
    b = kept.select("basket", F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    # total-basket scalar rides a 1-row broadcast — no count() action,
    # no second pass (repo convention, cf. frequent_items_exact)
    n_baskets = pairs_src.agg(
        F.countDistinct("basket").cast("double").alias("_n_baskets")
    )
    ca = F.broadcast(
        frequent.select(
            F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
        )
    )
    cb = F.broadcast(
        frequent.select(
            F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
        )
    )
    out = (
        pair_counts.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            (
                F.col("_n_baskets")
                * F.col("n_ab")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
            (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
        )
    )
    return release_on_gc(out, kept)
