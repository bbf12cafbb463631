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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Filters/projections applied by the caller reach
    the parquet reader via Catalyst pushdown — keep this a bare scan."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
