"""Market-basket pair stats (ext/basket.py): hand-computed lift and
the Apriori / max-basket guards."""

from __future__ import annotations

import pytest


def _baskets(spark, baskets):
    rows = [(b, i) for b, items in baskets for i in items]
    return spark.createDataFrame(rows, "basket long, item string")


def test_pair_stats_hand_computed(spark):
    from data_lakehouse_project_spark.ext.basket import basket_pair_stats

    df = _baskets(
        spark,
        [
            (1, ["x", "y"]),
            (2, ["x", "y"]),
            (3, ["x", "z"]),
            (4, ["y"]),
            (5, ["q"]),  # infrequent: must not appear in any pair
        ],
    )
    rows = {
        (r.item_a, r.item_b): r
        for r in basket_pair_stats(
            df, "basket", "item", min_item_count=2, min_pair_count=2
        ).collect()
    }
    assert set(rows) == {("x", "y")}
    r = rows[("x", "y")]
    # n_baskets=5, n_x=3, n_y=3, n_xy=2 → lift = 5*2/9
    assert (r.n_a, r.n_b, r.n_ab) == (3, 3, 2)
    assert r.lift == pytest.approx(10.0 / 9.0)
    assert r.conf_a_to_b == pytest.approx(2.0 / 3.0)


def test_duplicate_items_in_basket_count_once(spark):
    from data_lakehouse_project_spark.ext.basket import basket_pair_stats

    df = _baskets(spark, [(1, ["x", "x", "y", "y"]), (2, ["x", "y"])])
    r = basket_pair_stats(
        df, "basket", "item", min_item_count=1, min_pair_count=1
    ).head()
    assert (r.item_a, r.item_b, r.n_ab) == ("x", "y", 2)


def test_max_basket_guard_drops_degenerate(spark):
    from data_lakehouse_project_spark.ext.basket import basket_pair_stats

    big = (1, [f"i{k}" for k in range(50)])
    small = (2, ["i1", "i2"])
    df = _baskets(spark, [big, small, (3, ["i1", "i2"])])
    out = basket_pair_stats(
        df, "basket", "item",
        min_item_count=1, min_pair_count=1, max_basket=10,
    ).collect()
    # only the small baskets pair up; the 50-item basket contributes 0
    assert {(r.item_a, r.item_b, r.n_ab) for r in out} == {("i1", "i2", 2)}
