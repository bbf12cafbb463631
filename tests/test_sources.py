"""Format-generic batch sources: json/csv round-trips must reproduce
the parquet view exactly (schema-driven parse, no inference pass)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.sources.batch import load_table, load_table_any

SF = "/root/testdata/sf0.001"


def _assert_same(a, b):
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_json_roundtrip_exact(spark, tmp_path):
    base = load_table(spark, SF, "nation")
    p = f"{tmp_path}/nation_json"
    base.write.mode("overwrite").json(p)
    got = load_table_any(spark, p, fmt="json", schema=base.schema)
    _assert_same(got, base)


def test_csv_roundtrip_exact(spark, tmp_path):
    # doubles included: Spark writes shortest-roundtrip decimal forms,
    # so a schema-driven read reproduces the bits
    base = load_table(spark, SF, "supplier")
    p = f"{tmp_path}/supplier_csv"
    base.write.mode("overwrite").option("header", "true").csv(p)
    got = load_table_any(spark, p, fmt="csv", schema=base.schema)
    _assert_same(got, base)


def test_format_from_suffix_and_validation(spark, tmp_path):
    base = load_table(spark, SF, "region")
    p = f"{tmp_path}/region.json"
    base.write.mode("overwrite").json(p)
    got = load_table_any(spark, p, schema=base.schema)  # fmt from suffix
    _assert_same(got, base)
    with pytest.raises(ValueError, match="unsupported format"):
        load_table_any(spark, f"{tmp_path}/x.xlsx")


def test_corrupt_json_routes_to_dlq(spark, tmp_path):
    """The connector + route_errors composition: malformed lines
    surface as a corrupt-record column and route to the DLQ instead
    of failing the read."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from kafkadirect_spark.functions import smt

    p = f"{tmp_path}/raw.json"
    with open(p, "w") as fh:
        fh.write('{"k": 1, "v": "a"}\n')
        fh.write('this is not json\n')
        fh.write('{"k": 3, "v": "c"}\n')
    schema = StructType([
        StructField("k", LongType()), StructField("v", StringType()),
        StructField("_corrupt", StringType())])
    df = load_table_any(spark, p, fmt="json", schema=schema,
                        columnNameOfCorruptRecord="_corrupt")
    ok, dlq = smt.route_errors(
        df, F.col("_corrupt").isNotNull(),
        context={"reason": F.lit("malformed_json"),
                 "raw": F.col("_corrupt")})
    assert sorted(r.k for r in ok.collect()) == [1, 3]
    bad = dlq.collect()
    assert len(bad) == 1
    assert bad[0].error_context.raw == "this is not json"


def test_avro_env_blocked_message(spark, tmp_path):
    """Avro is accepted but env-blocked here (no spark-avro module
    jar, installs forbidden) — the error names the unblock recipe
    instead of Spark's bare ClassNotFound."""
    with pytest.raises(RuntimeError, match="spark-avro"):
        load_table_any(spark, f"{tmp_path}/x.avro")
