"""Behavioral analytics: ordered funnels and frequent event paths
(functions/behavior.py).  All outputs are integer-exact, so the tests
pin exact counts, permilles, and epoch-second lags.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import behavior

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), u, ty)
         for i, (ts, u, ty) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string")


def test_funnel_hand_checked(spark):
    """u1 converts through all three steps; u2 stalls after view; u3's
    purchase PRECEDES the view, so order blocks step 3; u4 never
    signs up (not in the funnel at all)."""
    ev = _ev(spark, [
        ("2024-01-01 00:00:00", 1, "signup"),
        ("2024-01-01 00:00:10", 1, "view"),
        ("2024-01-01 00:01:00", 1, "purchase"),
        ("2024-01-01 00:00:00", 2, "signup"),
        ("2024-01-01 00:00:05", 2, "view"),
        ("2024-01-01 00:00:00", 3, "signup"),
        ("2024-01-01 00:00:01", 3, "purchase"),   # before the view
        ("2024-01-01 00:00:02", 3, "view"),
        ("2024-01-01 00:00:00", 4, "view"),
        ("2024-01-01 00:00:01", 4, "purchase"),
    ])
    out = {r.step: (r.event_type, r.n_users, r.conversion_permille,
                    r.sum_lag_seconds)
           for r in behavior.funnel_steps(
               ev, "user_id", "ts", "event_type",
               ["signup", "view", "purchase"]).collect()}
    assert out[1] == ("signup", 3, 1000, 0)
    assert out[2] == ("view", 3, 1000, 10 + 5 + 2)
    assert out[3] == ("purchase", 1, 333, 60)
    with pytest.raises(ValueError, match="at least 2"):
        behavior.funnel_steps(ev, "user_id", "ts", "event_type",
                              ["signup"])
    with pytest.raises(ValueError, match="distinct"):
        behavior.funnel_steps(ev, "user_id", "ts", "event_type",
                              ["signup", "signup"])


def test_funnel_conversion_window(spark):
    """within_seconds counts from the user's STEP-0 time: u1's
    purchase at +90 s falls outside a 60 s window even though it is
    only 80 s after the view."""
    ev = _ev(spark, [
        ("2024-01-01 00:00:00", 1, "signup"),
        ("2024-01-01 00:00:10", 1, "view"),
        ("2024-01-01 00:01:30", 1, "purchase"),
        ("2024-01-01 00:00:00", 2, "signup"),
        ("2024-01-01 00:00:10", 2, "view"),
        ("2024-01-01 00:00:50", 2, "purchase"),
    ])
    out = {r.step: r.n_users for r in behavior.funnel_steps(
        ev, "user_id", "ts", "event_type",
        ["signup", "view", "purchase"],
        within_seconds=60).collect()}
    assert out == {1: 2, 2: 2, 3: 1}
    with pytest.raises(ValueError, match="within_seconds"):
        behavior.funnel_steps(ev, "user_id", "ts", "event_type",
                              ["signup", "view"], within_seconds=0)


def test_funnel_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events table, with and without a
    conversion window — cascade, lags and permilles replay exactly."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    ev = load_table(spark, SF, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    steps = ["signup", "view", "click", "purchase"]
    for within in (None, 3600 * 24 * 30):
        eng = sorted(tuple(r) for r in behavior.funnel_steps(
            ev, "user_id", "ts", "event_type", steps,
            within_seconds=within).collect())
        got = sorted(con.sql(behavior.funnel_steps_oracle_sql(
            steps, within_seconds=within)).fetchall())
        assert got == eng and len(eng) == 4
    assert eng[0][2] > 0          # signup cohort is non-empty


def test_path_topk_hand_checked(spark):
    """Paths are per-user consecutive triples in (ts, tiebreak)
    order; boundaries do not cross users; ties rank by path string."""
    ev = _ev(spark, [
        ("2024-01-01 00:00:00", 1, "a"),
        ("2024-01-01 00:00:01", 1, "b"),
        ("2024-01-01 00:00:02", 1, "c"),
        ("2024-01-01 00:00:03", 1, "a"),
        ("2024-01-01 00:00:00", 2, "b"),
        ("2024-01-01 00:00:01", 2, "c"),
        ("2024-01-01 00:00:02", 2, "a"),
    ])
    out = [(r.path, r.n_occurrences, r.rank)
           for r in behavior.path_topk(
               ev, "user_id", "ts", "event_type", n=3, k=5,
               order_break_col="event_id").collect()]
    # u1: a>b>c, b>c>a ; u2: b>c>a  ->  b>c>a ×2, a>b>c ×1
    assert out == [("b>c>a", 2, 1), ("a>b>c", 1, 2)]
    with pytest.raises(ValueError, match="n must"):
        behavior.path_topk(ev, "user_id", "ts", "event_type", n=1)
    with pytest.raises(ValueError, match="k must"):
        behavior.path_topk(ev, "user_id", "ts", "event_type", k=0)


def test_path_topk_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events table for bigrams and
    trigrams with the event_id tiebreak."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    ev = load_table(spark, SF, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    for n in (2, 3):
        eng = [tuple(r) for r in behavior.path_topk(
            ev, "user_id", "ts", "event_type", n=n, k=10,
            order_break_col="event_id").collect()]
        got = con.sql(behavior.path_topk_oracle_sql(
            n=n, k=10, order_break_col="event_id")).fetchall()
        assert got == eng and len(eng) == 10


def test_behavior_plans_are_scale_safe(spark):
    """Funnel: no window at all (pure filtered-agg cascade), no
    cartesian product.  Paths: the only data-sized window is
    partitioned by the user id; final ranking is TakeOrdered +
    a ≤ k-row window."""
    import contextlib
    import io
    import re

    from kafkadirect_spark.sources.batch import load_table

    ev = load_table(spark, SF, "events")
    fu = behavior.funnel_steps(ev, "user_id", "ts", "event_type",
                               ["signup", "view", "purchase"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fu.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan
    pt = behavior.path_topk(ev, "user_id", "ts", "event_type",
                            order_break_col="event_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pt.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert any("user_id" in s for s in specs)
    # the rank window runs over the ≤ k-row TakeOrdered result; every
    # other (data-sized) window must be user-partitioned
    data_sized = [s for s in specs
                  if "user_id" not in s and "n_occurrences" not in s]
    assert not data_sized, data_sized
