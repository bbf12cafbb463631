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


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_funnel(events, steps, within=None):
    """Independent model: per user, replay events in (ts, event_id)
    order through the strict-after cascade."""
    by_user: dict = {}
    for eid, ts, u, ty in events:
        by_user.setdefault(u, []).append((ts, eid, ty))
    out = []
    per_user = {}
    for u, evs in by_user.items():
        done = []
        for ts, _eid, ty in sorted(evs):
            k = len(done)
            if k >= len(steps) or ty != steps[k]:
                continue
            if k > 0 and ts <= done[-1]:
                continue
            if within is not None and k > 0 and ts - done[0] > within:
                continue
            done.append(ts)
        per_user[u] = done
    n0 = sum(1 for d in per_user.values() if len(d) >= 1)
    for i, s in enumerate(steps, start=1):
        conv = [d for d in per_user.values() if len(d) >= i]
        out.append((i, s, len(conv),
                    1000 * len(conv) // max(n0, 1),
                    sum(d[i - 1] - d[0] for d in conv)))
    return out


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=120),   # second
              st.integers(min_value=1, max_value=4),     # user
              st.sampled_from(["a", "b", "c", "x"])),
    min_size=1, max_size=40),
    st.one_of(st.none(), st.integers(min_value=1, max_value=90)))
def test_funnel_matches_python_model(spark, rows, within):
    """Engine == the per-user replay model on random event soups —
    min-ts semantics equal in-order replay, with and without the
    conversion window.  Seconds-granularity timestamps keep the
    model's integer lags exact."""
    from datetime import datetime, timedelta

    base = datetime.fromisoformat("2024-01-01 00:00:00")
    events = [(i, base + timedelta(seconds=sec), u, ty)
              for i, (sec, u, ty) in enumerate(rows)]
    df = spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, "
                "event_type string")
    got = sorted(tuple(r) for r in behavior.funnel_steps(
        df, "user_id", "ts", "event_type", ["a", "b", "c"],
        within_seconds=within).collect())
    model = [(i, s, n, p, lag) for i, s, n, p, lag in _py_funnel(
        [(e, int((ts - base).total_seconds()), u, ty)
         for e, ts, u, ty in events], ["a", "b", "c"], within)]
    assert got == sorted(model)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=1, max_value=3),
              st.sampled_from(["a", "b", "c"])),
    min_size=2, max_size=30))
def test_path_topk_matches_python_model(spark, rows):
    """Engine == a per-user sliding-window recount in (ts, event_id)
    order, including cross-engine tie ranks."""
    from collections import Counter
    from datetime import datetime, timedelta

    base = datetime.fromisoformat("2024-01-01 00:00:00")
    events = [(i, base + timedelta(seconds=sec), u, ty)
              for i, (sec, u, ty) in enumerate(rows)]
    df = spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, "
                "event_type string")
    got = [(r.path, r.n_occurrences, r.rank)
           for r in behavior.path_topk(
               df, "user_id", "ts", "event_type", n=2, k=50,
               order_break_col="event_id").collect()]
    by_user: dict = {}
    for eid, ts, u, ty in events:
        by_user.setdefault(u, []).append((ts, eid, ty))
    c: Counter = Counter()
    for evs in by_user.values():
        seq = [ty for _, _, ty in sorted(evs)]
        for j in range(len(seq) - 1):
            c[f"{seq[j]}>{seq[j + 1]}"] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [(p, n, i + 1) for i, (p, n) in enumerate(want)]
    assert got == want


# ---------------------------------------------------------------------------
# attribution_last_touch (round 13): last-touch conversion credit.


def test_attribution_hand_checked(spark):
    ev = _ev(spark, [
        ("2024-01-01 00:00:00", 1, "ad"),
        ("2024-01-01 00:00:30", 1, "email"),
        ("2024-01-01 00:01:00", 1, "purchase"),   # -> email, lag 30
        ("2024-01-01 00:05:00", 1, "purchase"),   # -> email, lag 270
        ("2024-01-01 00:00:10", 2, "purchase"),   # no touch -> direct
        ("2024-01-01 00:00:00", 3, "ad"),
        ("2024-01-01 02:00:00", 3, "purchase"),   # outside 1h window
    ])
    from kafkadirect_spark.functions import behavior
    out = {r.touch_type: (r.n_conversions, r.share_milli,
                          r.sum_lag_seconds)
           for r in behavior.attribution_last_touch(
               ev, "user_id", "ts", "event_type", "purchase",
               within_seconds=3600).collect()}
    assert out["email"] == (2, 500, 300)
    assert out["(direct)"] == (2, 500, 0)
    assert set(out) == {"email", "(direct)"}
    # no lookback window: user 3's ad gets the credit
    out = {r.touch_type: r.n_conversions
           for r in behavior.attribution_last_touch(
               ev, "user_id", "ts", "event_type", "purchase").collect()}
    assert out == {"email": 2, "ad": 1, "(direct)": 1}
    # a prior conversion never takes credit (nulled out of the window)
    ev2 = _ev(spark, [
        ("2024-01-01 00:00:00", 7, "purchase"),
        ("2024-01-01 00:01:00", 7, "purchase"),
    ])
    out = {r.touch_type: r.n_conversions
           for r in behavior.attribution_last_touch(
               ev2, "user_id", "ts", "event_type", "purchase").collect()}
    assert out == {"(direct)": 2}
    with pytest.raises(ValueError, match="within_seconds"):
        behavior.attribution_last_touch(ev, "user_id", "ts",
                                        "event_type", "purchase",
                                        within_seconds=0)


def test_attribution_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events table, with and without a
    lookback window — window order, whole-second lags, (direct)
    fallback and truncating shares replay exactly."""
    import duckdb

    from kafkadirect_spark.functions import behavior
    from kafkadirect_spark.sources.batch import load_table

    ev = load_table(spark, SF, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    for within in (None, 3600 * 24):
        eng = sorted(tuple(r) for r in behavior.attribution_last_touch(
            ev, "user_id", "ts", "event_type", "purchase",
            within_seconds=within,
            order_break_col="event_id").collect())
        got = sorted(con.sql(behavior.attribution_oracle_sql(
            "purchase", within_seconds=within,
            order_break_col="event_id")).fetchall())
        assert got == eng and len(eng) >= 2
    assert any(r[0] == "(direct)" for r in eng)


def test_attribution_plan_is_partitioned(spark):
    """The only data-sized window is user-partitioned; no cartesian
    product; the one-row total rides a broadcast (the funnel's
    scalar-subquery shape)."""
    import contextlib
    import io
    import re

    from kafkadirect_spark.functions import behavior

    ev = _ev(spark, [("2024-01-01 00:00:00", 1, "ad"),
                     ("2024-01-01 00:00:30", 1, "purchase")])
    out = behavior.attribution_last_touch(ev, "user_id", "ts",
                                          "event_type", "purchase")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "user_id" in spec, f"unpartitioned window: {spec}"


def _py_attribution(rows, conversion, within):
    """Independent model: per user, events in (ts, event_id) order;
    each conversion credits the latest preceding non-conversion touch
    inside the whole-second lookback, else (direct)."""
    by_user = {}
    for eid, (sec, u, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((sec, eid, ty))
    rep = {}
    for evs in by_user.values():
        evs.sort()
        for i, (sec, _eid, ty) in enumerate(evs):
            if ty != conversion:
                continue
            touch, lag = "(direct)", 0
            for psec, _pid, pty in reversed(evs[:i]):
                if pty == conversion:
                    continue
                if within is not None and sec - psec > within:
                    break       # older touches are even further back
                touch, lag = pty, sec - psec
                break
            n, s = rep.get(touch, (0, 0))
            rep[touch] = (n + 1, s + lag)
    total = sum(n for n, _ in rep.values())
    return {t: (n, 1000 * n // max(total, 1), s)
            for t, (n, s) in rep.items()}


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=120),
                          st.integers(min_value=1, max_value=3),
                          st.sampled_from(["a", "b", "p"])),
                min_size=1, max_size=25),
       st.sampled_from([None, 30]))
def test_attribution_matches_python_model(spark, evs, within):
    """Engine == an independent python model on random multi-user
    event sequences (ties broken by event id in both), with and
    without a lookback window."""
    rows = [(f"2024-01-01 00:{sec // 60:02d}:{sec % 60:02d}", u, ty)
            for sec, u, ty in evs]
    got = {r.touch_type: (r.n_conversions, r.share_milli,
                          r.sum_lag_seconds)
           for r in behavior.attribution_last_touch(
               _ev(spark, rows), "user_id", "ts", "event_type", "p",
               within_seconds=within,
               order_break_col="event_id").collect()}
    assert got == _py_attribution(evs, "p", within)
