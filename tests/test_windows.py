"""Windowed aggregation golden tests — kv_ints with crafted clusters
(FIXTURES.md §1/§5).  Mirrors KStreamWindowAggregateTest.java and
KStreamSessionWindowAggregateProcessorTest.java golden sequences."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.core import Stream, Windows

KV = "key string, value int, ts timestamp, offset bigint"


def t(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


@pytest.fixture(scope="module")
def clicks(spark):
    rows = [
        ("u1", 1, t("10:00:00"), 0),
        ("u1", 1, t("10:20:00"), 1),   # within 30m gap → same session
        ("u1", 1, t("10:50:00"), 2),   # exactly 30m after prev → MERGES
        # (gap boundary is inclusive in Spark's session_window — verified
        # empirically; events strictly more than `gap` apart split)
        ("u1", 1, t("12:00:00"), 3),
        ("u2", 1, t("10:59:59"), 4),
        ("u2", 1, t("11:00:00"), 5),   # next hour bucket
    ]
    return Stream(spark.createDataFrame(rows, KV), key="key", ts="ts")


def test_tumbling_count(clicks):
    out = clicks.group_by_key().windowed_by(Windows.tumbling("1 hour")).count()
    got = {(r.key, r.window.start.hour): r["count"] for r in out.collect()}
    assert got == {("u1", 10): 3, ("u1", 12): 1, ("u2", 10): 1, ("u2", 11): 1}


def test_hopping_windows_cover_record(clicks):
    out = clicks.group_by_key().windowed_by(
        Windows.hopping("1 hour", "30 minutes")).count()
    rows = [r for r in out.collect() if r.key == "u2"]
    # u2@10:59:59 → windows starting 10:00 and 10:30; u2@11:00 → 10:30, 11:00
    starts = sorted((r.window.start.hour, r.window.start.minute, r["count"])
                    for r in rows)
    assert starts == [(10, 0, 1), (10, 30, 2), (11, 0, 1)]


def test_session_merge_and_boundary_split(clicks):
    out = clicks.group_by_key().windowed_by(Windows.session("30 minutes")).count()
    u1 = sorted((r.window.start.time().isoformat(), r["count"])
                for r in out.collect() if r.key == "u1")
    # 10:00+10:20+10:50 merge (boundary inclusive); 12:00 splits
    assert u1 == [("10:00:00", 3), ("12:00:00", 1)]


def test_session_bridge_record_merges(spark):
    rows = [
        ("u", 1, t("09:00:00"), 0),
        ("u", 1, t("10:00:00"), 1),   # separate session (gap 1h)
        ("u", 1, t("09:29:00"), 2),   # bridge: 9:00..9:29..10:00 within gaps
    ]
    s = Stream(spark.createDataFrame(rows, KV), key="key", ts="ts")
    out = s.group_by_key().windowed_by(Windows.session("31 minutes")).count()
    got = [(r.window.start.time().isoformat(), r["count"]) for r in out.collect()]
    assert got == [("09:00:00", 3)]


def test_unlimited_window_landmark(clicks):
    out = clicks.group_by_key().windowed_by(
        Windows.unlimited("2024-01-01 10:30:00")).count()
    got = {r.key: r["count"] for r in out.collect()}
    # u1: 10:50 + 12:00; u2: both.  Earlier records excluded.
    assert got == {"u1": 2, "u2": 2}
    w = out.collect()[0].window
    assert w.start == t("10:30:00") and w.end is None
