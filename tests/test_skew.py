"""Skew-mitigation operators: salted join/agg must return the exact
same result as the plain shapes, with the big side spread over salts."""

from pyspark.sql import functions as F

from kafkadirect_spark.operators import skew


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1), ("miss", 2)],
        "key string, v int")
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("other", "O")], "key string, d string")
    plain = {(r.key, r.v, r.d) for r in big.join(small, "key").collect()}
    salted = {(r.key, r.v, r.d) for r in
              skew.salted_join(big, small, "key", salt=4).collect()}
    assert salted == plain and len(salted) == 501


def test_salted_join_left(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "key string, v int")
    small = spark.createDataFrame([("a", "A")], "key string, d string")
    rows = {(r.key, r.d) for r in
            skew.salted_join(big, small, "key", salt=3, how="left").collect()}
    assert rows == {("a", "A"), ("b", None)}


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i % 7) for i in range(300)] + [("cold", 42)],
        "key string, v int")
    plain = {(r.key, r.n, r.nd) for r in
             df.groupBy("key").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.size(F.collect_set("v")).alias("nd")).collect()}
    salted = {(r.key, r.n, r.nd) for r in skew.salted_agg(
        df, "key",
        agg_exprs=[F.count(F.lit(1)).alias("pn"),
                   F.collect_set("v").alias("pv")],
        merge_exprs=[F.sum("pn").alias("n"),
                     F.size(F.array_distinct(F.flatten(
                         F.collect_list("pv")))).alias("nd")],
        salt=4).collect()}
    assert salted == plain


def test_salted_join_different_key_names(spark):
    big = spark.createDataFrame([("hot", 1), ("x", 2)], "bkey string, v int")
    small = spark.createDataFrame([("hot", "H")], "skey string, d string")
    out = skew.salted_join(big, small, "bkey", small_key="skey", salt=4)
    assert "__salt" not in out.columns
    assert [(r.bkey, r.d) for r in out.collect()] == [("hot", "H")]
