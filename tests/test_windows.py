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


def _make_argmax_fold():
    """Arg-max-by-value with full row context — the Aggregator shape
    expression aggregates can't do when the fold inspects arbitrary
    row state (here: the winning row's ts AND a count).  Built as a
    closure so cloudpickle ships it by value (a module-level test
    function would pickle by reference and fail on executors)."""
    def fold(pdf):
        import pandas as pd
        best = pdf.loc[pdf.value.idxmax()]
        return pd.DataFrame({
            "key": [pdf.key.iloc[0]],
            "window_start": [pdf.window.iloc[0]["start"]],
            "window_end": [pdf.window.iloc[0]["end"]],
            "best_value": [int(best.value)],
            "best_ts": [best.ts],
            "n": [len(pdf)],
        })
    return fold


_FOLD_SCHEMA = ("key string, window_start timestamp, window_end timestamp, "
                "best_value int, best_ts timestamp, n long")


def test_aggregate_with_hopping_fold(spark):
    """Custom fold on HOPPING windows (TimeWindowedKStreamImpl.java:
    63-112): each record explodes to its covering windows; golden
    values hand-derived and cross-checked against the expression
    aggregation over F.window(size, advance)."""
    rows = [("a", 1, t("10:05:00"), 0), ("a", 9, t("10:20:00"), 1),
            ("a", 4, t("10:35:00"), 2)]
    s = Stream(spark.createDataFrame(rows, KV), key="key", ts="ts")
    win = Windows.hopping("30 minutes", "15 minutes")
    out = s.group_by_key().windowed_by(win).aggregate_with(
        _make_argmax_fold(), _FOLD_SCHEMA)
    got = {(r.window_start.time().isoformat(), r.best_value, r.n)
           for r in out.collect()}
    assert got == {("09:45:00", 1, 1), ("10:00:00", 9, 2),
                   ("10:15:00", 9, 2), ("10:30:00", 4, 1)}
    # same enumeration as the built-in hopping window operator
    expr = (s.group_by_key().windowed_by(win)
            .aggregate(F.max_by("value", "value").alias("best_value"),
                       F.count(F.lit(1)).alias("n")))
    expr_got = {(r.window.start.time().isoformat(), r.best_value, r.n)
                for r in expr.collect()}
    assert expr_got == got


def test_aggregate_with_session_fold(clicks):
    """Custom fold on SESSION windows (KStreamSessionWindowAggregate
    .java:94-141 merge): gaps-and-islands sessionization feeding the
    pandas fold; golden cross-checked against F.session_window."""
    win = Windows.session("30 minutes")
    out = clicks.group_by_key().windowed_by(win).aggregate_with(
        _make_argmax_fold(), _FOLD_SCHEMA)
    got = {(r.key, r.window_start.time().isoformat(),
            r.window_end.time().isoformat(), r.n)
           for r in out.collect()}
    # u1: 10:00+10:20+10:50 merge (boundary inclusive, end = last+gap),
    # 12:00 alone; u2: 10:59:59 + 11:00:00 merge.
    assert got == {("u1", "10:00:00", "11:20:00", 3),
                   ("u1", "12:00:00", "12:30:00", 1),
                   ("u2", "10:59:59", "11:30:00", 2)}
    expr = clicks.group_by_key().windowed_by(win).count()
    expr_got = {(r.key, r.window.start.time().isoformat(),
                 r.window.end.time().isoformat(), r["count"])
                for r in expr.collect()}
    assert expr_got == got


def test_aggregate_with_streaming_raises(spark, tmp_path):
    df = (spark.readStream.schema(KV)
          .parquet(str(tmp_path)))
    with pytest.raises(ValueError, match="batch-only"):
        (Stream(df, key="key", ts="ts").group_by_key()
         .windowed_by(Windows.tumbling("1 hour"))
         .aggregate_with(_make_argmax_fold(), _FOLD_SCHEMA))


def test_aggregate_with_hopping_tz_independent(spark):
    """Interval arithmetic must not depend on the session timezone —
    parsing an epoch *string* shifted by the local offset once made
    _interval_us negative under non-UTC sessions."""
    rows = [("a", 1, t("10:05:00"), 0), ("a", 9, t("10:20:00"), 1)]
    want = {("09:45:00", 1), ("10:00:00", 2), ("10:15:00", 1)}

    def run():
        s = Stream(spark.createDataFrame(rows, KV), key="key", ts="ts")
        out = (s.group_by_key()
               .windowed_by(Windows.hopping("30 minutes", "15 minutes"))
               .aggregate_with(_make_argmax_fold(), _FOLD_SCHEMA))
        return {(r.window_start.time().isoformat(), r.n)
                for r in out.collect()}

    assert run() == want
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        assert run() == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
