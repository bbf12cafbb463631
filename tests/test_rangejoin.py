"""Bucketed range join: exact point-in-interval semantics vs a naive
inequality join, left-join row preservation, degenerate intervals,
and the plan contract (equi-join on buckets, never a nested loop).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
    suggest_bucket_width,
)
from kafkadirect_spark.testing import explain_formatted


def _points(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate([-75, -1, 0, 3, 7, 10, 49, 50, 99,
                                       150, 1000])],
        "pid long, v long")


def _intervals(spark):
    return spark.createDataFrame(
        [(0, 0, 10),       # [0, 10)
         (1, 5, 5),        # empty
         (2, 7, 8),        # single value
         (3, -100, 1),     # negative lo crossing zero
         (4, 40, 260),     # spans many buckets
         (5, 95, 105)],    # straddles a bucket boundary
        "iid long, lo long, hi long")


def _naive(points, intervals):
    return points.join(
        intervals,
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")), "inner")


@pytest.mark.parametrize("width", [1, 7, 50, 1000])
def test_inner_matches_naive_inequality_join(spark, width):
    got = point_in_interval_join(
        _points(spark), _intervals(spark), "v", "lo", "hi",
        bucket_width=width)
    want = _naive(_points(spark), _intervals(spark))
    key = lambda r: (r.pid, r.iid)  # noqa: E731
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, want.collect()))
    # the empty interval matched nothing
    assert got.filter(F.col("iid") == 1).count() == 0


def test_left_join_keeps_unmatched_points(spark):
    got = point_in_interval_join(
        _points(spark), _intervals(spark), "v", "lo", "hi",
        bucket_width=50, how="left")
    rows = got.collect()
    # every point appears; unmatched points exactly once with null iid
    matched = {r.pid for r in _naive(_points(spark),
                                     _intervals(spark)).collect()}
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.iid)
    assert set(by_pid) == {r.pid for r in _points(spark).collect()}
    for pid, iids in by_pid.items():
        if pid not in matched:
            assert iids == [None]
        else:
            assert None not in iids
    # matched multiplicity agrees with the naive join
    want = sorted((r.pid, r.iid) for r in _naive(
        _points(spark), _intervals(spark)).collect())
    assert sorted((r.pid, r.iid) for r in rows if r.iid is not None) == want


def test_no_nested_loop_in_plan(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = point_in_interval_join(
            _points(spark), _intervals(spark), "v", "lo", "hi",
            bucket_width=50)
        plan = explain_formatted(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:1500]
    assert "Join" in plan


def test_validation_errors(spark):
    pts, ivs = _points(spark), _intervals(spark)
    with pytest.raises(ValueError, match="bucket_width"):
        point_in_interval_join(pts, ivs, "v", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="join type"):
        point_in_interval_join(pts, ivs, "v", "lo", "hi", 10, how="outer")
    with pytest.raises(ValueError, match="collision"):
        point_in_interval_join(
            pts, ivs.withColumnRenamed("iid", "pid"), "v", "lo", "hi", 10)


def test_bucket_ids_exact_above_2_53(spark):
    """Double division rounds above 2^53 — the bug the exact pmod+div
    floor replaced: these magnitudes must still meet in one bucket."""
    big = 1 << 60
    pts = spark.createDataFrame(
        [(0, big + 3), (1, big - 1), (2, -big + 3)], "pid long, v long")
    ivs = spark.createDataFrame(
        [(0, big, big + 10), (1, -big, -big + 10)], "iid long, lo long, hi long")
    got = sorted((r.pid, r.iid) for r in point_in_interval_join(
        pts, ivs, "v", "lo", "hi", bucket_width=7).collect())
    assert got == [(0, 0), (2, 1)]


def test_span_guard_raises_on_pathological_interval(spark):
    pts = spark.createDataFrame([(0, 5)], "pid long, v long")
    # open-ended sentinel hi: would explode to ~9e17 bucket rows
    ivs = spark.createDataFrame(
        [(0, 0, (1 << 62))], "iid long, lo long, hi long")
    with pytest.raises(Exception) as exc:
        point_in_interval_join(
            pts, ivs, "v", "lo", "hi", bucket_width=5,
            max_span_buckets=1000).collect()
    assert "max_span_buckets" in str(exc.value)
    # same data passes once the cap admits the span
    ivs_ok = spark.createDataFrame(
        [(0, 0, 4999)], "iid long, lo long, hi long")
    got = point_in_interval_join(
        pts, ivs_ok, "v", "lo", "hi", bucket_width=5,
        max_span_buckets=1000).collect()
    assert [(r.pid, r.iid) for r in got] == [(0, 0)]


# -- interval ⋈ interval overlap --

def _ivs_a(spark):
    return spark.createDataFrame(
        [(0, 0, 10), (1, 5, 5), (2, -30, -20), (3, 40, 260),
         (4, 95, 105), (5, 7, 8), (6, 1 << 60, (1 << 60) + 10)],
        "aid long, a_lo long, a_hi long")


def _ivs_b(spark):
    return spark.createDataFrame(
        [(0, 9, 12), (1, 5, 6), (2, -25, -24), (3, 100, 101),
         (4, 0, 300), (5, 10, 20), (6, (1 << 60) + 9, (1 << 60) + 50)],
        "bid long, b_lo long, b_hi long")


def _naive_overlap(a, b):
    return a.join(
        b,
        (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
        & (F.col("a_lo") < F.col("a_hi")) & (F.col("b_lo") < F.col("b_hi")),
        "inner")


@pytest.mark.parametrize("width", [1, 7, 50, 1000])
def test_overlap_matches_naive_and_dedups(spark, width):
    got = interval_overlap_join(
        _ivs_a(spark), _ivs_b(spark), "a_lo", "a_hi", "b_lo", "b_hi",
        bucket_width=width).collect()
    want = _naive_overlap(_ivs_a(spark), _ivs_b(spark)).collect()
    key = lambda r: (r.aid, r.bid)  # noqa: E731
    got_keys = sorted(map(key, got))
    assert got_keys == sorted(map(key, want))
    # each overlapping pair emitted exactly once, even when the pair
    # shares many buckets (aid=3 × bid=4 share up to 220/width buckets)
    assert len(got_keys) == len(set(got_keys))
    # the empty interval (aid=1) matched nothing
    assert not [k for k in got_keys if k[0] == 1]


def test_overlap_no_nested_loop_in_plan(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = interval_overlap_join(
            _ivs_a(spark), _ivs_b(spark), "a_lo", "a_hi", "b_lo", "b_hi",
            bucket_width=50)
        plan = explain_formatted(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:1500]
    assert "Join" in plan


def test_overlap_validation_errors(spark):
    a, b = _ivs_a(spark), _ivs_b(spark)
    with pytest.raises(ValueError, match="bucket_width"):
        interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 0)
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(
            a, b.withColumnRenamed("bid", "aid"),
            "a_lo", "a_hi", "b_lo", "aid", 10)


def test_overlap_left_matches_naive_left_join(spark):
    """how='left' golden: matched pairs identical to the naive left
    overlap join, unmatched left intervals (empty ones included)
    exactly once with null bid — including the >2^53 domain rows."""
    a, b = _ivs_a(spark), _ivs_b(spark)
    got = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucket_width=50, how="left", left_key="aid").collect()
    want = a.join(
        b,
        (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
        & (F.col("a_lo") < F.col("a_hi")) & (F.col("b_lo") < F.col("b_hi")),
        "left").collect()
    key = lambda r: (r.aid, r.bid)  # noqa: E731
    assert sorted(map(key, got), key=str) == sorted(map(key, want), key=str)
    # the empty interval (aid=1) survives exactly once, unmatched
    assert [k for k in map(key, got) if k[0] == 1] == [(1, None)]


def test_overlap_left_no_nested_loop_in_plan(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = interval_overlap_join(
            _ivs_a(spark), _ivs_b(spark), "a_lo", "a_hi", "b_lo", "b_hi",
            bucket_width=50, how="left", left_key="aid")
        plan = explain_formatted(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:1500]


def test_overlap_left_validation(spark):
    a, b = _ivs_a(spark), _ivs_b(spark)
    with pytest.raises(ValueError, match="left_key"):
        interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                              50, how="left")
    with pytest.raises(ValueError, match="not in left columns"):
        interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                              50, how="left", left_key="nope")
    with pytest.raises(ValueError, match="join type"):
        interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
                              50, how="outer")


def test_reserved_names_rejected(spark):
    """ADVICE r7: internal __-prefixed working columns must not
    silently overwrite same-named user columns — both operators
    reject them up front."""
    pts, ivs = _points(spark), _intervals(spark)
    with pytest.raises(ValueError, match="__bucket"):
        point_in_interval_join(
            pts.withColumn("__bucket", F.lit(1)), ivs, "v", "lo", "hi", 10)
    a, b = _ivs_a(spark), _ivs_b(spark)
    with pytest.raises(ValueError, match="__lfirst"):
        interval_overlap_join(
            a.withColumn("__lfirst", F.lit(1)), b,
            "a_lo", "a_hi", "b_lo", "b_hi", 10)


def test_long_min_domain_guard_raises(spark):
    """Bounds within bucket_width of Long.MIN would wrap the pmod
    floor silently (ADVICE r7) — they raise instead."""
    long_min = -(1 << 63)
    pts = spark.createDataFrame([(0, long_min + 3)], "pid long, v long")
    ivs = spark.createDataFrame([(0, 0, 10)], "iid long, lo long, hi long")
    with pytest.raises(Exception, match="Long.MIN"):
        point_in_interval_join(
            pts, ivs, "v", "lo", "hi", bucket_width=7).collect()
    # just outside the sliver: floors exactly, no raise
    pts_ok = spark.createDataFrame([(0, long_min + 7)], "pid long, v long")
    assert point_in_interval_join(
        pts_ok, ivs, "v", "lo", "hi", bucket_width=7).count() == 0


def test_suggest_bucket_width(spark):
    ivs = spark.createDataFrame(
        [(i, 0, s) for i, s in enumerate([10, 10, 10, 100, 1000])]
        + [(9, 5, 5)],  # empty interval excluded from the estimate
        "iid long, lo long, hi long")
    w = suggest_bucket_width(ivs, "lo", "hi")
    assert 10 <= w <= 100  # median of {10,10,10,100,1000}
    # degenerate: all empty intervals -> floor of 1
    empty = spark.createDataFrame([(0, 5, 5)], "iid long, lo long, hi long")
    assert suggest_bucket_width(empty, "lo", "hi") == 1
    with pytest.raises(ValueError, match="quantile"):
        suggest_bucket_width(ivs, "lo", "hi", quantile=1.5)
    # the suggested width actually drives a correct join
    pts = spark.createDataFrame([(0, 5), (1, 500)], "pid long, v long")
    got = sorted((r.pid, r.iid) for r in point_in_interval_join(
        pts, ivs, "v", "lo", "hi", bucket_width=w).collect())
    naive = sorted((r.pid, r.iid) for r in _naive(pts, ivs).collect())
    assert got == naive
