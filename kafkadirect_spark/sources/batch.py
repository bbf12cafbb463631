"""Batch parquet sources for the driver-generated TPC-H-ish tables.

Reference analogue: the broker's log-scan fetch path
(core/src/main/scala/kafka/log/Log.scala:1579 ``Log.read``) — a topic
is a table; a batch DataFrame over parquet is the bounded-scan view of
it.  Predicate/column pushdown on the parquet scan replaces the
offset/time sparse indexes (OffsetIndex.scala / TimeIndex.scala): a
timestamp filter prunes row groups the way ``fetchOffsetByTimestamp``
(Log.scala:1705) seeks the time index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer-only check —
    no data read).  Spark scans these as LongType under
    ``spark.sql.legacy.parquet.nanosAsLong=true``."""
    try:
        import pyarrow.dataset as ds
        import pyarrow.types as pt

        schema = ds.dataset(path, format="parquet").schema
        return [f.name for f in schema
                if pt.is_timestamp(f.type) and f.type.unit == "ns"]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str,
               on_invalid_ts: str | None = None, ts_col: str = "ts",
               ts_order_by: str | None = None) -> DataFrame:
    """Scan one table. Filters/projections applied by the caller reach
    the parquet reader via Catalyst pushdown — keep this a bare scan.

    The one normalization: TIMESTAMP(NANOS) columns (which Spark reads
    as raw nanos longs, see session.py) become TimestampType via
    **truncating** ns→µs division — ``ts div 1000``, not a rounding
    cast, so values agree bit-for-bit with DuckDB's µs view of the
    same file.
    """
    path = f"{sf_dir}/{name}.parquet"
    # The engine declares UTC event-time semantics (session.py): wall-
    # clock functions (date_trunc, date_format) must agree with the
    # TZ-free epoch alignment of F.window and with the DuckDB oracles.
    # Enforced here so externally-built sessions get it too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # Runtime-settable; applied here (not only in get_spark) so the
        # engine also works with an externally-built SparkSession that
        # lacks the builder-time config (e.g. the verify driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if on_invalid_ts is not None:
        # TimestampExtractor policy at the source — the same hook point
        # as RecordQueue.java:178 (extraction happens on ingest).
        from kafkadirect_spark.functions.timestamps import with_timestamp_policy
        df = with_timestamp_policy(df, ts_col, on_invalid=on_invalid_ts,
                                   order_by=ts_order_by)
    return df


def scan_table_from(spark: SparkSession, sf_dir: str, name: str,
                    ts_col: str, timestamp: str) -> DataFrame:
    """Time-travel scan — Log.fetchOffsetByTimestamp (core/.../log/
    Log.scala:1705): start at the first record with ts ≥ t, with the
    predicate **pushed to the parquet reader** so row groups are pruned
    by min/max stats (the columnar analogue of TimeIndex.scala).

    For TIMESTAMP(NANOS) columns the normalized ``ts`` is a derived
    expression (timestamp_micros(ns div 1000)), which Catalyst cannot
    push through — so the bound is applied to the *raw nanos long*
    before normalization: ts ≥ T  ⟺  ns ≥ T_µs·1000 (floor-division
    monotonicity), which is a plain comparison the scan accepts.
    """
    from datetime import datetime, timezone

    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = _nanos_timestamp_cols(path)
    bound = F.lit(timestamp).cast("timestamp")
    if ts_col not in nanos_cols:
        return load_table(spark, sf_dir, name).filter(F.col(ts_col) >= bound)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dt = datetime.fromisoformat(timestamp).replace(tzinfo=timezone.utc)
    t_ns = int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000
    df = spark.read.parquet(path).filter(F.col(ts_col) >= F.lit(t_ns))
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_table_any(spark: SparkSession, path: str, fmt: str | None = None,
                   schema=None, **options) -> DataFrame:
    """Format-generic bounded scan: ``parquet`` / ``json`` (lines) /
    ``csv`` / ``orc`` — the connector surface for corpora that arrive
    as raw export files rather than parquet (the reference's serde
    layer accepts JSON/CSV wire formats the same way;
    ``sources/kafka.py parse_records`` is the streaming sibling).

    ``fmt`` defaults from the path suffix.  For json/csv an explicit
    ``schema`` is strongly recommended: schema inference costs an
    extra full pass at 100 TB and infers types non-deterministically
    across samples — pass the target schema and Spark parses in one
    scan (malformed rows follow ``mode``/``columnNameOfCorruptRecord``
    options; combine with ``smt.route_errors`` for DLQ routing).
    Parquet/orc keep full min-max row-group pruning; json/csv scans
    prune columns but not row groups — convert to parquet (or write
    through ``cluster_by_zorder``) for the scan-bound path.

    The same UTC session contract as ``load_table`` is enforced.
    """
    if fmt is None:
        suffix = path.rsplit(".", 1)[-1].lower()
        fmt = {"jsonl": "json"}.get(suffix, suffix)
    if fmt not in ("parquet", "json", "csv", "orc", "avro"):
        raise ValueError(f"unsupported format {fmt!r}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    try:
        return reader.options(**options).format(fmt).load(path)
    except Exception as ex:
        if fmt == "avro" and "Failed to find data source" in str(ex):
            raise RuntimeError(
                "avro needs the external spark-avro module on the "
                "classpath (org.apache.spark:spark-avro_2.13 matching "
                "this Spark version) — absent in this environment, the "
                "same env-block as the Kafka connector jar "
                "(COVERAGE.md §2.1); json/csv/orc/parquet work without "
                "it") from ex
        raise
