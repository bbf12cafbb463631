"""Warehouse/pipeline analytics beyond the reference surface, round 5
batch 4 — sketches and deterministic ordering primitives, oracle-paired.

The reference engine has neither approximate aggregation nor a global
ordering primitive (Kafka Streams state is exact and per-partition;
SURVEY.md §2.4).  These are the operations a 100 TB training-data
warehouse adds on top: cardinality sketches whose registers merge
without re-reading data, and hash-deterministic global
shuffles/samples that are stable under re-runs and data growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafkadirect_spark.functions import sketch
from kafkadirect_spark.plans.queries import query
from kafkadirect_spark.sources.batch import load_table


@query(
    "distinct_orders_hll",
    oracle=sketch.oracle_sql("lineitem", "l_orderkey"),
)
def distinct_orders_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-order count over lineitem via the
    deterministic HyperLogLog sketch (functions/sketch.py): p=10 →
    1024 integer registers, portable md5 hashing, pure-integer
    estimator — an APPROXIMATE algorithm with an EXACT cross-engine
    oracle (DuckDB replays registers and estimate bit-for-bit).

    Scale: the only exchange carries ≤ m rows per task (map-side
    partial register-min); sketches from disjoint partitions merge
    with ``sketch.hll_merge`` without touching raw data again —
    the 100 TB distinct-count primitive, vs COUNT(DISTINCT)'s full
    shuffle of every key."""
    li = load_table(spark, sf_dir, "lineitem")
    return sketch.hll_distinct(li, "l_orderkey")
