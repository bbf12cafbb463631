"""Sink partitioner — route records to numbered partitions by key.

Reference: clients/.../producer/internals/DefaultPartitioner.java:69
(`toPositive(murmur2(keyBytes)) % numPartitions`) and
streams/.../kstream/internals/WindowedStreamPartitioner.java:49 (same
formula over the windowed key's BASE key).  Utils.java:385 defines the
murmur2 variant (seed 0x9747b28c, m 0x5bd1e995).

Two routing columns are offered:

- **spark_partition** — ``pmod(hash(key), n)``: Spark's built-in
  murmur3, pure codegen, the right choice when only *stable spreading*
  matters (co-location, balanced files).
- **murmur2_partition** — byte-exact Kafka DefaultPartitioner routing,
  for sinks that must agree with an existing Kafka topic's layout
  (e.g. writing files a Kafka consumer's partition assignment maps
  onto).  Computed in an Arrow-batched pandas UDF (per-record byte
  hashing is not expressible in Catalyst); keep it off hot paths that
  don't need cross-system agreement.

Both are deterministic in the key alone — the round-robin
null-key branch of DefaultPartitioner (sticky counter) is stateful and
non-deterministic by design, so null keys here raise instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED = 0x9747B28C
_M = 0x5BD1E995
_MASK = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Utils.murmur2 (Utils.java:385) — returns the Java int32 value."""
    length = len(data)
    h = (_SEED ^ length) & _MASK
    n4 = length // 4
    for i in range(n4):
        i4 = i * 4
        k = (data[i4] + (data[i4 + 1] << 8) + (data[i4 + 2] << 16)
             + (data[i4 + 3] << 24))
        k = (k * _M) & _MASK
        k ^= k >> 24
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    tail = length % 4
    base = length & ~3
    if tail >= 3:
        h ^= (data[base + 2] & 0xFF) << 16
    if tail >= 2:
        h ^= (data[base + 1] & 0xFF) << 8
    if tail >= 1:
        h ^= data[base] & 0xFF
        h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h - (1 << 32) if h >= (1 << 31) else h  # Java signed int


def kafka_partition_for(key: bytes, num_partitions: int) -> int:
    """DefaultPartitioner.java:69 — toPositive(murmur2(k)) % n."""
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


def murmur2_partition(key: Column | str, num_partitions: int) -> Column:
    """Column: the Kafka partition the record's key routes to.  String
    keys hash their UTF-8 bytes (the StringSerializer wire bytes);
    binary keys hash as-is.  Null keys raise (see module docstring)."""
    c = F.col(key) if isinstance(key, str) else key

    @F.pandas_udf("int")
    def _route(s):
        def one(v):
            if v is None:
                raise ValueError(
                    "null key: Kafka's null-key routing is sticky "
                    "round-robin (stateful); assign keys explicitly")
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            return kafka_partition_for(b, num_partitions)
        return s.map(one)

    return _route(c)


def spark_partition(key: Column | str, num_partitions: int) -> Column:
    """Column: stable murmur3-based route — pure codegen, for sinks
    that need spreading but not Kafka byte-compatibility."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.hash(c), F.lit(num_partitions))


def route_to_partitions(df: DataFrame, key: str, num_partitions: int,
                        exact: bool = False,
                        out_col: str = "partition") -> DataFrame:
    """Attach the sink-partition column; write with
    ``.write.partitionBy(out_col)`` for one directory per partition —
    the columnar analogue of producing to a partitioned topic."""
    fn = murmur2_partition if exact else spark_partition
    return df.withColumn(out_col, fn(key, num_partitions))
