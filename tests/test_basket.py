"""Market-basket pair mining (round 14): hand-checked counts /
support / lift, the mega-basket guard, oracle parity on the real
lineitem, and plan shape."""

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import basket

SF = "/root/testdata/sf0.001"


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, it long")


def test_basket_pairs_hand_checked(spark):
    # baskets: 1:{10,20,30} 2:{10,20} 3:{10,20} 4:{30} (and a dup
    # (2,10) row that must count once) -> pairs: (10,20)x3,
    # (10,30)x1, (20,30)x1; min_support=2 keeps only (10,20)
    rows = [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (2, 10),
            (3, 10), (3, 20), (4, 30)]
    out = basket.basket_pairs_topk(
        _baskets(spark, rows), "b", "it", k=5, min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_ab, r.rank) == (10, 20, 3, 1)
    # 4 kept baskets -> support 3/4 = 750000 ppm; lift =
    # 1000*3*4/(3*3) = 1333 (n_10 = 3 baskets, n_20 = 3)
    assert r.support_ppm == 750_000
    assert r.lift_milli == 1333
    # min_support=1 surfaces all three pairs in (n desc, a, b) order
    all3 = [(r.item_a, r.item_b, r.n_ab, r.rank)
            for r in basket.basket_pairs_topk(
                _baskets(spark, rows), "b", "it",
                k=5, min_support=1).collect()]
    assert all3 == [(10, 20, 3, 1), (10, 30, 1, 2), (20, 30, 1, 3)]


def test_basket_mega_basket_guard(spark):
    # one 50-item basket above the cap contributes NOTHING (neither
    # pairs nor the basket denominator); the two small baskets still
    # pair
    rows = ([(9, i) for i in range(50)]
            + [(1, 1), (1, 2), (2, 1), (2, 2)])
    out = basket.basket_pairs_topk(
        _baskets(spark, rows), "b", "it", k=10, min_support=1,
        max_basket=10).collect()
    assert [(r.item_a, r.item_b, r.n_ab) for r in out] == [(1, 2, 2)]
    assert out[0].support_ppm == 1_000_000      # 2 of 2 KEPT baskets
    with pytest.raises(ValueError, match="max_basket"):
        basket.basket_pairs_topk(_baskets(spark, rows), "b", "it",
                                 max_basket=1)
    with pytest.raises(ValueError, match="k must"):
        basket.basket_pairs_topk(_baskets(spark, rows), "b", "it",
                                 k=0)
    with pytest.raises(ValueError, match="min_support"):
        basket.basket_pairs_topk(_baskets(spark, rows), "b", "it",
                                 min_support=0)


def test_basket_oracle_matches_engine(spark):
    """Engine == DuckDB over the real lineitem order/part baskets —
    dedup, cap, pair counts, truncating support/lift, rank.
    Registration candidate for r15."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    li = load_table(spark, SF, "lineitem")
    eng = [tuple(r) for r in basket.basket_pairs_topk(
        li, "l_orderkey", "l_partkey", k=15, min_support=2).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    got = con.sql(basket.basket_pairs_oracle_sql(
        "l_orderkey", "l_partkey", "lineitem",
        k=15, min_support=2)).fetchall()
    assert got == eng and len(eng) == 15
    assert all(r[5] == i + 1 for i, r in enumerate(eng))   # ranks
    assert any(r[4] > 1000 for r in eng)     # real lift signal


def test_basket_plan_is_bounded(spark):
    """The pair join is a basket-keyed equi hash join (no cartesian
    product, no nested loop beyond the one-row broadcast literals);
    the only unpartitioned window sorts the <= k-row LIMIT result."""
    import contextlib
    import io

    rows = [(1, 10), (1, 20), (2, 10), (2, 20)]
    out = basket.basket_pairs_topk(_baskets(spark, rows), "b", "it",
                                   k=5, min_support=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_basket(rows, k, min_support, max_basket):
    """Independent model: dedup, cap, pair counts, truncating
    support/lift, (n desc, a, b) top-k rank."""
    from collections import defaultdict
    baskets = defaultdict(set)
    for b, it in rows:
        baskets[b].add(it)
    kept = {b: s for b, s in baskets.items() if len(s) <= max_basket}
    nb = len(kept)
    freq = defaultdict(int)
    for s in kept.values():
        for it in s:
            freq[it] += 1
    pairs = defaultdict(int)
    for s in kept.values():
        items = sorted(s)
        for i, a in enumerate(items):
            for c in items[i + 1:]:
                pairs[(a, c)] += 1
    cand = sorted(((n, a, b) for (a, b), n in pairs.items()
                   if n >= min_support),
                  key=lambda t: (-t[0], t[1], t[2]))[:k]
    return [(a, b, n, 1_000_000 * n // nb,
             1000 * n * nb // (freq[a] * freq[b]), r + 1)
            for r, (n, a, b) in enumerate(cand)]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 6)),
                min_size=1, max_size=40),
       st.integers(2, 5))
def test_basket_matches_python_model(spark, rows, cap):
    """Engine == an independent per-basket recount on arbitrary
    (basket, item) multisets, including cap, tie ranks and
    truncating ratios."""
    got = [tuple(r) for r in basket.basket_pairs_topk(
        _baskets(spark, rows), "b", "it", k=6, min_support=1,
        max_basket=cap).collect()]
    assert got == _py_basket(rows, 6, 1, cap)


def test_basket_apriori_prune_is_result_invariant(spark):
    """prune_items drops only items that monotonicity proves cannot
    reach min_support pairs — the result is IDENTICAL with and
    without it, on a long-tail shape where it actually prunes."""
    # items 1,2 co-occur 3x; items 50..80 are singles (prunable)
    rows = ([(b, it) for b in (1, 2, 3) for it in (1, 2)]
            + [(b, 50 + b) for b in range(4, 35)])
    base = [tuple(r) for r in basket.basket_pairs_topk(
        _baskets(spark, rows), "b", "it", k=5, min_support=2).collect()]
    pruned = [tuple(r) for r in basket.basket_pairs_topk(
        _baskets(spark, rows), "b", "it", k=5, min_support=2,
        prune_items=True).collect()]
    assert pruned == base and len(base) == 1
