"""Kafka topic source/sink via Structured Streaming's built-in
``format("kafka")`` connector.

Reference surface:
- subscribe topic/list/pattern — StreamsBuilder.java:79,115,159
- offset scan / seek              — KafkaConsumer.java:1635,1679,1707
- time-travel (ts → offset)       — core/.../log/Log.scala:1705
  (ListOffsets); mapped to ``startingTimestamp``
- sink                            — KStream.java:458 (to)

These wrappers translate the Kafka Streams consumption model into the
Spark source options and the (key, value, timestamp, headers) column
convention of §1.1.  They need the spark-sql-kafka connector jar and a
broker at runtime — not present in this environment, so tests cover
option construction and the batch fallbacks only.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkadirect_spark.core import Stream


def read_stream(
    spark: SparkSession,
    brokers: str,
    subscribe: str | None = None,
    pattern: str | None = None,
    starting_offsets: str = "earliest",
    starting_timestamp: int | None = None,
    value_schema: str | None = None,
) -> Stream:
    """Subscribe to topic(s) → Stream.

    ``starting_offsets`` ∈ {earliest, latest, per-partition JSON} ≙
    seekToBeginning/seekToEnd/seek; ``starting_timestamp`` (epoch ms) ≙
    offsetsForTimes time-travel.  ``value_schema`` (DDL) parses the
    JSON value payload into typed columns; without it the raw
    key/value bytes pass through (the reference's opaque-serde model).
    """
    r = (spark.readStream.format("kafka")
         .option("kafka.bootstrap.servers", brokers))
    if subscribe:
        r = r.option("subscribe", subscribe)
    elif pattern:
        r = r.option("subscribePattern", pattern)
    else:
        raise ValueError("need subscribe or pattern")
    if starting_timestamp is not None:
        r = r.option("startingTimestamp", str(starting_timestamp))
    else:
        r = r.option("startingOffsets", starting_offsets)
    df = r.load()
    if value_schema:
        return Stream(parse_records(df, value_schema), key="key", ts="ts")
    return Stream(df, key="key", ts="timestamp")


def parse_records(df: DataFrame, value_schema: str) -> DataFrame:
    """Deserialize the Kafka record shape (§1.1: key/value bytes +
    timestamp + topic/partition/offset) into typed columns: the
    consumer-side serde.  Pure transform — testable without a broker."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("timestamp").alias("ts"),
        "topic", "partition", "offset",
    ).select("key", "v.*", "ts", "topic", "partition", "offset")


def serialize_records(stream: Stream) -> DataFrame:
    """Producer-side serde: (key string, value JSON) from a typed
    Stream — the record shape KStream.to puts on the wire.  Pure
    transform — testable without a broker."""
    df = stream.df
    key = F.col(stream.key).cast("string").alias("key") if stream.key \
        else F.lit(None).cast("string").alias("key")
    value_cols = [c for c in df.columns if c != stream.key]
    return df.select(key, F.to_json(F.struct(*value_cols)).alias("value"))


def write_stream(
    stream: Stream,
    brokers: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "append",
):
    """Stream → topic (KStream.to).  Serializes all non-key columns as
    a JSON value; returns the started StreamingQuery.  At-least-once
    (checkpoint + Kafka producer retries) — the Spark Kafka sink has
    no transactional EOS, which BASELINE.json scopes out."""
    out = serialize_records(stream)
    return (out.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .start())


def write_stream_routed(
    stream: Stream,
    base_path: str,
    route_col: str,
    checkpoint: str,
    fmt: str = "parquet",
):
    """Per-record dynamic routing in streaming — TopicNameExtractor
    (KStream.java:478) over a file sink: each microbatch partitions by
    the route column, so records land under ``base_path/route=<v>/``.
    foreachBatch + partitionBy keeps the write idempotent per batch."""
    def per_batch(batch, batch_id):
        (batch.write.mode("append").partitionBy(route_col)
         .format(fmt).save(base_path))

    return (stream.df.writeStream.foreachBatch(per_batch)
            .option("checkpointLocation", checkpoint).start())


def offsets_for_times(starting: dict[str, dict[int, int]]) -> str:
    """Per-partition offset spec (KafkaConsumer.seek) as the JSON the
    source's startingOffsets option takes."""
    return json.dumps(starting)


def scan_from(df: DataFrame, ts_col: str, timestamp) -> DataFrame:
    """Batch time-travel — Log.fetchOffsetByTimestamp (Log.scala:1705):
    'first record with ts ≥ t'.  On parquet/Delta the timestamp
    predicate is pushed to the scan and prunes row groups via min/max
    stats — the columnar analogue of the sparse time index
    (TimeIndex.scala)."""
    return df.filter(F.col(ts_col) >= F.lit(timestamp))
