"""Sink partitioner — byte-exact Kafka DefaultPartitioner routing
(Utils.java:385 murmur2; DefaultPartitioner.java:69) and the codegen
spreading variant."""

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import partitioner


def test_murmur2_known_vectors():
    """Values cross-checked against the Java Utils.murmur2 output (the
    b'21' vector is the widely-published Kafka client test value)."""
    assert partitioner.murmur2(b"21") == -973932308
    assert partitioner.murmur2(b"") == 275646681
    assert partitioner.murmur2(b"a") == -1563381124
    assert partitioner.murmur2(b"foobar") == -790332482


def test_kafka_partition_range_and_determinism():
    for n in (1, 3, 12, 64):
        parts = {partitioner.kafka_partition_for(f"k{i}".encode(), n)
                 for i in range(200)}
        assert parts <= set(range(n))
        if n > 1:
            assert len(parts) > 1  # actually spreads
    assert (partitioner.kafka_partition_for(b"x", 12)
            == partitioner.kafka_partition_for(b"x", 12))


def test_murmur2_partition_column_matches_python(spark):
    keys = [f"user-{i}" for i in range(50)] + ["", "äöü", "日本語"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r.key: r.p for r in df.withColumn(
        "p", partitioner.murmur2_partition("key", 12)).collect()}
    for k in keys:
        assert got[k] == partitioner.kafka_partition_for(
            k.encode("utf-8"), 12), k


def test_murmur2_partition_null_key_raises(spark):
    df = spark.createDataFrame([("a",), (None,)], "key string")
    with pytest.raises(Exception, match="null key"):
        df.withColumn("p", partitioner.murmur2_partition("key", 4)).collect()


def test_route_to_partitions_write_layout(spark, tmp_path):
    """partitionBy(out_col) gives one directory per routed partition —
    the columnar analogue of producing to a partitioned topic."""
    df = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40)], "key string, v int")
    routed = partitioner.route_to_partitions(df, "key", 4, exact=True)
    routed.write.mode("overwrite").partitionBy("partition").parquet(
        str(tmp_path / "out"))
    back = spark.read.parquet(str(tmp_path / "out"))
    got = {r.key: r.partition for r in back.collect()}
    for k, p in got.items():
        assert p == partitioner.kafka_partition_for(k.encode(), 4)
    # spreading variant stays in range too
    fast = partitioner.route_to_partitions(df, "key", 4).collect()
    assert {r.partition for r in fast} <= {0, 1, 2, 3}


def test_murmur2_batch_matches_scalar_exhaustive_shapes():
    """Vectorized batch hash must equal the scalar reference on every
    tail length, the empty key, high bytes, and unicode wire bytes."""
    import random
    rnd = random.Random(7)
    keys = [b"", b"21", b"a", b"foobar", "äöü".encode(), "日本語".encode(),
            bytes(range(256))]
    keys += [bytes(rnd.getrandbits(8) for _ in range(n))
             for n in range(0, 40) for _ in range(5)]
    got = partitioner.murmur2_batch(keys)
    for k, g in zip(keys, got):
        assert int(g) == partitioner.murmur2(k), k


def test_murmur2_batch_faster_than_loop():
    """The numpy path must clearly beat the per-row Python loop on a
    routing-sized batch (the point of vectorizing).  Measured ~6× on
    an idle machine; the assert leaves headroom because this runs
    inside the full suite next to Spark executors (best-of-5 each)."""
    import time
    keys = [f"user-{i}".encode() for i in range(50_000)]
    partitioner.murmur2_batch(keys[:100])  # warm

    def ratio():
        vec = loop = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            partitioner.murmur2_batch(keys)
            vec = min(vec, time.perf_counter() - t0)
            t0 = time.perf_counter()
            for k in keys:
                partitioner.murmur2(k)
            loop = min(loop, time.perf_counter() - t0)
        return loop / vec

    r = ratio()
    if r <= 2.5:  # one retry: a GC pause or core contention spike
        r = ratio()
    assert r > 2.5, r
