"""Join golden sequences — mirrors KStreamKStreamJoinTest.java (interval
inner/left/outer with in/out-of-window records), KStreamKTableJoinTest,
KStreamGlobalKTableJoinTest (null-key skip, broadcast)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.core import GlobalTable, JoinWindows, Stream, Table


def t(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


@pytest.fixture(scope="module")
def left(spark):
    rows = [
        ("k1", "L1", t("00:00:00")),
        ("k1", "L2", t("00:10:00")),
        ("k2", "L3", t("00:00:00")),
        (None, "L4", t("00:00:00")),  # null key → skipped by joins
    ]
    return Stream(spark.createDataFrame(rows, "key string, lv string, lts timestamp"),
                  key="key", ts="lts")


@pytest.fixture(scope="module")
def right(spark):
    rows = [
        ("k1", "R1", t("00:00:30")),   # within 1m of L1
        ("k1", "R2", t("00:20:00")),   # within 10m of L2 only
        ("k3", "R3", t("00:00:00")),
    ]
    return Stream(spark.createDataFrame(rows, "rkey string, rv string, rts timestamp"),
                  key="rkey", ts="rts")


def test_interval_inner(left, right):
    out = left.join_interval(right, on=F.col("key") == F.col("rkey"),
                             windows=JoinWindows.of("1 minute"))
    got = sorted((r.lv, r.rv) for r in out.df.collect())
    assert got == [("L1", "R1")]


def test_interval_asymmetric_before_after(left, right):
    # before=0, after=10m: match iff rts ∈ [lts, lts+10m]
    out = left.join_interval(right, on=F.col("key") == F.col("rkey"),
                             windows=JoinWindows(before="0 seconds", after="10 minutes"))
    got = sorted((r.lv, r.rv) for r in out.df.collect())
    assert got == [("L1", "R1"), ("L2", "R2")]


def test_interval_left_outer(left, right):
    out = left.join_interval(right, on=F.col("key") == F.col("rkey"),
                             windows=JoinWindows.of("1 minute"), how="left")
    got = sorted((r.lv, r.rv) for r in out.df.collect())
    # L4 (null key) skipped entirely; L2/L3 null-padded
    assert got == [("L1", "R1"), ("L2", None), ("L3", None)]


def test_interval_full_outer(left, right):
    out = left.join_interval(right, on=F.col("key") == F.col("rkey"),
                             windows=JoinWindows.of("1 minute"), how="full_outer")
    pairs = {(r.lv, r.rv) for r in out.df.collect()}
    assert (None, "R2") in pairs and (None, "R3") in pairs


def test_stream_table_join_null_key_skipped(spark, left):
    table = Table(spark.createDataFrame(
        [("k1", "T1"), ("k3", "T3")], "tkey string, tv string"), key="tkey")
    out = left.join_table(table, on=F.col("key") == F.col("tkey"), how="left")
    got = sorted((r.lv, r.tv) for r in out.df.collect())
    # L4 skipped (null key); k2 null-padded
    assert got == [("L1", "T1"), ("L2", "T1"), ("L3", None)]


def test_global_table_join_arbitrary_mapper(spark, left):
    gt = GlobalTable(spark.createDataFrame(
        [("1", "G1"), ("2", "G2")], "gk string, gv string"), key="gk")
    # non-key mapper join: extract digit from stream key
    out = left.filter(F.col("key").isNotNull()).join_global(
        gt, on=F.regexp_extract("key", "k(\\d)", 1) == F.col("gk"))
    got = sorted((r.lv, r.gv) for r in out.df.collect())
    assert got == [("L1", "G1"), ("L2", "G1"), ("L3", "G2")]
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # GlobalKTable ⇒ broadcast, no shuffle


def test_global_table_left_join_null_pads(spark, left):
    gt = GlobalTable(spark.createDataFrame(
        [("1", "G1")], "gk string, gv string"), key="gk")
    out = left.filter(F.col("key").isNotNull()).join_global(
        gt, on=F.regexp_extract("key", "k(\\d)", 1) == F.col("gk"), how="left")
    got = sorted((r.lv, r.gv) for r in out.df.collect())
    assert got == [("L1", "G1"), ("L2", "G1"), ("L3", None)]
