"""Golden-sequence tests for the stateless operators (§2.2) on the
kv_ints fixture shape — mirrors the reference's per-operator suites
(KStreamFilterTest.java, KStreamMapTest.java, KStreamBranchTest.java,
KStreamFlatMapTest.java — streams/src/test/.../kstream/internals/)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.core import Stream

KV = "key string, value int, ts timestamp, offset bigint"


def t(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


@pytest.fixture(scope="module")
def kv(spark):
    rows = [
        ("A", 1, t("00:00:00"), 0),
        ("B", 2, t("00:00:10"), 1),
        ("A", 3, t("00:00:20"), 2),
        ("C", None, t("00:00:30"), 3),
        (None, 5, t("00:00:40"), 4),
        ("B", 6, t("00:00:05"), 5),  # out of order
    ]
    return Stream(spark.createDataFrame(rows, KV), key="key", ts="ts")


def test_filter_and_filter_not(kv):
    kept = kv.filter(F.col("value") > 2).df.collect()
    assert sorted(r.value for r in kept) == [3, 5, 6]
    # filterNot(p) keeps the complement among non-null evaluations
    dropped = kv.filter_not(F.col("value") > 2).df.collect()
    assert sorted(r.value for r in dropped) == [1, 2]


def test_map_values_and_select_key(kv):
    out = kv.map_values(value=F.col("value") * 10).df
    assert sorted(r.value for r in out.collect() if r.value is not None) == [
        10, 20, 30, 50, 60]
    rekeyed = kv.select_key(F.upper("key"), name="key")
    assert rekeyed.key == "key"
    assert {r.key for r in rekeyed.df.collect()} == {"A", "B", "C", None}


def test_map_rekeys(kv):
    out = kv.map(F.concat_ws(":", "key", F.col("value").cast("string")),
                 key_name="key", value=F.col("value") + 1)
    got = {r.key for r in out.df.filter(F.col("key") != "").collect()}
    assert "A:1" in got and "B:6" in got


def test_flat_map_values_explodes(spark):
    s = Stream(spark.createDataFrame(
        [("x", "a b"), ("y", "c")], "key string, value string"), key="key")
    out = s.flat_map_values(F.split("value", " "), name="value").df.collect()
    assert sorted((r.key, r.value) for r in out) == [
        ("x", "a"), ("x", "b"), ("y", "c")]


def test_flat_map_rekeys_zero_to_n(spark):
    s = Stream(spark.createDataFrame([("k", 2), ("z", 0)], "key string, n int"))
    # 0..n output records: one struct per i < n, re-keyed by i
    arr = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: F.struct(i.alias("newkey"), F.col("key").alias("src")))
    out = Stream.flat_map(s, F.when(F.col("n") > 0, arr).otherwise(F.array()),
                          key="newkey").df.collect()
    assert sorted((r.newkey, r.src) for r in out) == [(1, "k"), (2, "k")]


def test_branch_first_match_wins_single_scan(kv):
    b = kv.branch(F.col("value") > 2, F.col("key") == "A")
    v_big = sorted(r.value for r in b[0].df.collect())
    v_a = sorted(r.value for r in b[1].df.collect())
    assert v_big == [3, 5, 6]       # includes A,3 (claimed by branch 0)
    assert v_a == [1]               # only A,1 remains for branch 1
    # no record in two branches, null-predicate rows in none
    total = len(b[0].df.collect()) + len(b[1].df.collect())
    assert total == 4  # C,None (null predicate) matches neither


def test_branch_tag_indexes(kv):
    tagged = kv.branch_tag(F.col("value") > 2, F.col("key") == "A")
    got = {(r.key, r.value): r.branch for r in tagged.df.collect()}
    assert got[("A", 1)] == 1 and got[("A", 3)] == 0 and got[("C", None)] == -1


def test_merge_is_union_all(kv):
    doubled = kv.merge(kv)
    assert doubled.df.count() == 12  # no dedup


def test_peek_passthrough(kv):
    seen = []
    out = kv.peek(lambda df: seen.append(df.count()))
    assert seen == [6]
    assert out.df.count() == 6


def test_foreach_runs_on_executors(kv, spark):
    acc = spark.sparkContext.accumulator(0)

    def act(row):
        acc.add(1)

    kv.foreach(act)
    assert acc.value == 6


def test_through_repartitions(kv):
    out = kv.through(num_partitions=2)
    assert out.df.rdd.getNumPartitions() == 2
    assert out.df.count() == 6


def test_flat_map_keeps_ts_when_present(spark):
    s = Stream(spark.createDataFrame(
        [("k", 2, t("00:01:00"))], "key string, n int, ts timestamp"),
        key="key", ts="ts")
    arr = F.transform(F.sequence(F.lit(1), F.col("n")),
                      lambda i: F.struct(i.alias("newkey"), F.col("ts").alias("ts")))
    out = s.flat_map(arr, key="newkey")
    assert out.ts == "ts"           # event-time column survives the re-key
    assert out.df.count() == 2
