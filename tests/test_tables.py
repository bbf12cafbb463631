"""KTable semantics — table_upserts fixture (FIXTURES.md §6): last-wins
materialization, tombstones, table-table joins, groupBy re-aggregation.
Mirrors KTableSourceTest / KTableKTable{Inner,Left,Outer}JoinTest /
KTableAggregateTest (streams/src/test/.../kstream/internals/)."""

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.core import Table

UPSERTS = "key string, attr string, value int, ts timestamp, offset bigint"


@pytest.fixture(scope="module")
def upserts(spark):
    rows = [
        ("k1", "x", 1, None, 0),
        ("k1", "y", 2, None, 3),    # last k1 → attr y, value 2
        ("k2", "x", 5, None, 1),
        ("k2", "x", None, None, 4),  # tombstone: k2 deleted
        ("k3", "y", 7, None, 2),
        (None, "x", 9, None, 5),     # null key skipped
    ]
    return spark.createDataFrame(rows, UPSERTS)


def test_from_changelog_last_wins_and_tombstone(upserts):
    t = Table.from_changelog(upserts, key="key", order_by="offset",
                             value_cols=["attr", "value"],
                             tombstone_col="value")
    got = {r.key: (r.attr, r.value) for r in t.df.collect()}
    assert got == {"k1": ("y", 2), "k3": ("y", 7)}  # k2 tombstoned, null key gone


def test_from_changelog_without_tombstone_keeps_null(upserts):
    t = Table.from_changelog(upserts, key="key", order_by="offset",
                             value_cols=["value"])
    got = {r.key: r.value for r in t.df.collect()}
    assert got == {"k1": 2, "k2": None, "k3": 7}


def test_table_filter_is_tombstone(upserts):
    t = Table.from_changelog(upserts, key="key", order_by="offset",
                             value_cols=["value"], tombstone_col="value")
    kept = t.filter(F.col("value") > 2).df.collect()
    assert {r.key for r in kept} == {"k3"}


def test_table_map_values(upserts):
    t = Table.from_changelog(upserts, key="key", order_by="offset",
                             value_cols=["value"], tombstone_col="value")
    out = t.map_values(value=F.col("value") * 100)
    assert {r.value for r in out.df.collect()} == {200, 700}


def _two_tables(spark):
    a = Table(spark.createDataFrame(
        [("k1", 1), ("k2", 2)], "key string, a int"), key="key")
    b = Table(spark.createDataFrame(
        [("k2", 20), ("k3", 30)], "key string, b int"), key="key")
    return a, b


def test_table_table_inner_left_outer(spark):
    a, b = _two_tables(spark)
    inner = {(r.key, r.a, r.b) for r in a.join(b, "inner").df.collect()}
    assert inner == {("k2", 2, 20)}
    left = {(r.key, r.a, r.b) for r in a.join(b, "left").df.collect()}
    assert left == {("k1", 1, None), ("k2", 2, 20)}
    outer = a.join(b, "outer").df
    assert outer.count() == 3


def test_table_group_by_reaggregate(upserts):
    # KTableAggregate: re-key the current snapshot by attr and sum —
    # retracted (overwritten/tombstoned) values must NOT contribute.
    t = Table.from_changelog(upserts, key="key", order_by="offset",
                             value_cols=["attr", "value"],
                             tombstone_col="value")
    out = {r.attr: r.total for r in
           t.group_by("attr").aggregate(F.sum("value").alias("total")).collect()}
    # k1 old value (attr x, 1) retracted; k2 tombstoned: only y: 2+7
    assert out == {"y": 9}


def test_to_stream_roundtrip(upserts):
    t = Table.from_changelog(upserts, key="key", order_by="offset",
                             value_cols=["value"], tombstone_col="value")
    s = t.to_stream()
    assert s.key == "key"
    assert s.df.count() == 2


def test_table_join_different_key_names(spark):
    a = Table(spark.createDataFrame(
        [("k1", 1), ("k2", 2)], "akey string, a int"), key="akey")
    b = Table(spark.createDataFrame(
        [("k2", 20), ("k3", 30)], "bkey string, b int"), key="bkey")
    got = {(r.akey, r.a, r.b) for r in a.join(b, "inner").df.collect()}
    assert got == {("k2", 2, 20)}
