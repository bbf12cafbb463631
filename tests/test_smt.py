"""Connect SMT wrappers (§2.7) — one golden test per transform,
mirroring connect/transforms/src/test/.../CastTest.java etc."""

from pyspark.sql import functions as F

from kafkadirect_spark.functions import smt


def _df(spark):
    return spark.createDataFrame(
        [(1, "7", 1700000000000, "topic-a")],
        "id int, amount string, ts_ms long, topic string")


def test_cast_fields(spark):
    out = smt.cast_fields(_df(spark), {"amount": "int", "id": "string"})
    row = out.first()
    assert row.amount == 7 and row.id == "1"


def test_extract_field(spark):
    nested = spark.createDataFrame([((1, "x"),)], "s struct<a:int,b:string>")
    assert smt.extract_field(nested, "s.a").first().a == 1


def test_flatten_nested(spark):
    nested = spark.createDataFrame(
        [((1, ("deep",)), 2)], "s struct<a:int,inner:struct<b:string>>, top int")
    out = smt.flatten(nested, delimiter=".")
    assert out.columns == ["s.a", "s.inner.b", "top"]
    assert out.first()["s.inner.b"] == "deep"


def test_hoist_field(spark):
    out = smt.hoist_field(_df(spark), "payload")
    assert out.columns == ["payload"]
    assert out.first().payload.id == 1


def test_insert_field(spark):
    out = smt.insert_field(_df(spark), "source", F.lit("kafka"))
    assert out.first().source == "kafka"


def test_mask_field(spark):
    out = smt.mask_field(_df(spark), ["id", "amount"])
    row = out.first()
    assert row.id == 0 and row.amount == ""


def test_regex_router(spark):
    out = _df(spark).select(
        smt.regex_router("topic", "^topic-(.*)$", "route-$1").alias("r"))
    assert out.first().r == "route-a"


def test_replace_field(spark):
    out = smt.replace_field(_df(spark), renames={"amount": "amt"}, drops=["topic"])
    assert out.columns == ["id", "amt", "ts_ms"]


def test_set_schema_metadata(spark):
    out = smt.set_schema_metadata(_df(spark), "com.example.Order", 2)
    meta = out.schema.fields[0].metadata
    assert meta == {"schema_name": "com.example.Order", "schema_version": 2}


def test_timestamp_converter_roundtrip(spark):
    df = _df(spark)
    ts = df.select(smt.timestamp_converter("ts_ms", "timestamp").alias("t"))
    back = ts.select(smt.timestamp_converter("t", "unix").alias("ms"))
    assert back.first().ms == 1700000000000
    s = ts.select(smt.timestamp_converter("t", "string", "yyyy-MM-dd").alias("d"))
    assert s.first().d == "2023-11-14"


def test_timestamp_router(spark):
    df = _df(spark).select(
        smt.timestamp_converter("ts_ms", "timestamp").alias("t"))
    out = df.select(smt.timestamp_router("t", "events-{}", "yyyyMMdd").alias("r"))
    assert out.first().r == "events-20231114"


def test_value_to_key(spark):
    out = smt.value_to_key(_df(spark), ["id", "topic"])
    k = out.first().key
    assert (k.id, k.topic) == (1, "topic-a")


def test_route_errors_dlq(spark):
    """errors.tolerance=all semantics: bad rows route to the DLQ with
    context instead of failing the pipeline; null predicates count as
    errors; the split is lossless."""
    from kafkadirect_spark.functions import smt

    df = spark.createDataFrame(
        [("1", "a"), ("x", "b"), (None, "c"), ("42", "d")],
        "raw string, payload string")
    parsed = df.withColumn("n", F.col("raw").try_cast("long"))
    ok, dlq = smt.route_errors(
        parsed, F.col("n").isNull(),
        context={"reason": F.lit("cast_failed"), "raw": F.col("raw")})
    ok_rows = ok.collect()
    dlq_rows = dlq.collect()
    assert sorted(r.payload for r in ok_rows) == ["a", "d"]
    assert sorted(r.payload for r in dlq_rows) == ["b", "c"]
    assert all(r.error_context.reason == "cast_failed" for r in dlq_rows)
    assert {r.error_context.raw for r in dlq_rows} == {"x", None}
    assert len(ok_rows) + len(dlq_rows) == 4
    # null error condition -> error side
    ok2, dlq2 = smt.route_errors(df, F.lit(None).cast("boolean"))
    assert ok2.count() == 0 and dlq2.count() == 4
