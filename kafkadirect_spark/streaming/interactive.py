"""Interactive queries — query materialized operator state from
outside the topology.

Reference: KafkaStreams.store(name, type) + QueryableStoreTypes
(KafkaStreams.java:956,1064; state/QueryableStoreTypes.java:41-63):
a running topology exposes its KV/window stores for point/range reads.

Spark mapping: materialize the (update-mode) aggregate into a named
in-memory sink table; readers query the snapshot with plain SQL while
the stream keeps updating it.  A durable variant would target a
parquet/Delta path instead — same API, queryable by any session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


class MaterializedView:
    """Handle to a continuously-updated queryable store."""

    def __init__(self, spark: SparkSession, name: str, query: StreamingQuery):
        self.spark = spark
        self.name = name
        self.query = query

    def snapshot(self) -> DataFrame:
        """Current contents (KafkaStreams.store().all())."""
        return self.spark.sql(f"SELECT * FROM {self.name}")

    def get(self, key_col: str, key) -> list:
        """Point lookup (ReadOnlyKeyValueStore.get)."""
        return self.snapshot().filter(f"{key_col} = '{key}'").collect()

    def stop(self) -> None:
        self.query.stop()


def materialize(agg: DataFrame, name: str, mode: str = "update",
                checkpoint: str | None = None) -> MaterializedView:
    """Start maintaining ``agg`` (an unwindowed/windowed streaming
    aggregate) as the queryable store ``name``.  ``update`` mode emits
    per-key upserts each trigger (the KTable changelog shape) —
    readers see the latest row per key via the memory sink."""
    w = agg.writeStream.outputMode(mode).format("memory").queryName(name)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return MaterializedView(agg.sparkSession, name, w.start())
