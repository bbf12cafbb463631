"""Property-based semantics checks (hypothesis): the engine's windowed
operators against independent in-Python reference models, over random
keyed event sequences — coverage the reference's hand-written golden
suites don't reach (SURVEY.md §5: 'no property-based testing' there)."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafkadirect_spark.core import Stream, Windows

BASE = datetime(2024, 1, 1)

events = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=7200)),  # seconds offset
    min_size=1, max_size=40,
)


def _model_sessions(rows, gap_s):
    """Reference model: sort per key; merge while next - prev <= gap
    (inclusive boundary — pinned by test_windows.py)."""
    out = {}
    for key in {k for k, _ in rows}:
        ts = sorted(s for k, s in rows if k == key)
        sessions = []
        start = prev = ts[0]
        n = 1
        for s in ts[1:]:
            if s - prev <= gap_s:
                prev = s
                n += 1
            else:
                sessions.append((start, prev, n))
                start = prev = s
                n = 1
        sessions.append((start, prev, n))
        out[key] = sessions
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events)
def test_session_windows_match_model(spark, rows):
    df = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s)) for k, s in rows],
        "key string, ts timestamp")
    got = (Stream(df, key="key", ts="ts").group_by_key()
           .windowed_by(Windows.session("10 minutes")).count(name="n"))
    actual = {}
    for r in got.collect():
        actual.setdefault(r.key, []).append(
            (int((r.window.start - BASE).total_seconds()),
             int((r.window.end - BASE).total_seconds()) - 600,
             r.n))
    for k in actual:
        actual[k].sort()
    assert actual == _model_sessions(rows, 600)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events)
def test_tumbling_equals_hopping_with_equal_advance(spark, rows):
    """TimeWindows.of(size) ≡ .advanceBy(size) — the reference defines
    tumbling as the degenerate hopping window (TimeWindows.java:150)."""
    df = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s)) for k, s in rows],
        "key string, ts timestamp")
    s1 = Stream(df, key="key", ts="ts").group_by_key()
    a = {(r.key, r.window.start, r.n) for r in
         s1.windowed_by(Windows.tumbling("7 minutes")).count(name="n").collect()}
    s2 = Stream(df, key="key", ts="ts").group_by_key()
    b = {(r.key, r.window.start, r.n) for r in
         s2.windowed_by(Windows.hopping("7 minutes", "7 minutes")).count(name="n").collect()}
    assert a == b
