"""Interactive queries — query materialized operator state from
outside the topology.

Reference: KafkaStreams.store(name, type) + QueryableStoreTypes
(KafkaStreams.java:956,1064; state/QueryableStoreTypes.java:41-63):
a running topology exposes its KV/window stores for point/range reads.

Spark mapping: materialize the aggregate into a named in-memory sink
table; readers query the snapshot with plain SQL while the stream
keeps updating it.  In **update** mode the memory sink APPENDS each
per-trigger upsert, so the view reduces to the latest row per key
(``key_cols`` + an emission ordinal) before serving — the
ReadOnlyKeyValueStore contract is "current value", not history.  A
durable variant would target a parquet/Delta path instead — same API,
queryable by any session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


class MaterializedView:
    """Handle to a continuously-updated queryable store."""

    def __init__(self, spark: SparkSession, name: str, query: StreamingQuery,
                 key_cols: list[str] | None = None):
        self.spark = spark
        self.name = name
        self.query = query
        self.key_cols = list(key_cols or [])

    def snapshot(self) -> DataFrame:
        """Current contents (KafkaStreams.store().all()): one row per
        key — the latest upsert wins.  The memory sink appends update-
        mode emissions in trigger order, so the row ordinal within the
        materialized table IS the upsert order; ``max_by`` over it
        reduces the history to the store's current value."""
        raw = self.spark.sql(f"SELECT * FROM {self.name}")
        if not self.key_cols:
            return raw
        cols = raw.columns
        return (
            raw.withColumn("_ord", F.monotonically_increasing_id())
            .groupBy(*self.key_cols)
            .agg(F.max_by(F.struct(*[c for c in cols
                                     if c not in self.key_cols]),
                          F.col("_ord")).alias("_v"))
            .select(*self.key_cols, "_v.*")
        )

    def get(self, key_col: str, key) -> list:
        """Point lookup (ReadOnlyKeyValueStore.get) — parameterized,
        never interpolated into SQL text, any key type."""
        return self.snapshot().filter(
            F.col(key_col).eqNullSafe(F.lit(key))).collect()

    def stop(self) -> None:
        self.query.stop()


def materialize(agg: DataFrame, name: str, mode: str = "update",
                checkpoint: str | None = None,
                key_cols: list[str] | None = None) -> MaterializedView:
    """Start maintaining ``agg`` (an unwindowed/windowed streaming
    aggregate) as the queryable store ``name``.  ``update`` mode emits
    per-key upserts each trigger (the KTable changelog shape); pass
    ``key_cols`` so readers see exactly the latest row per key.
    ``complete`` mode rewrites the whole table per trigger — no
    reduction needed, but O(state) emission each trigger (fine for
    small dimension stores, wrong for wide keyspaces)."""
    w = agg.writeStream.outputMode(mode).format("memory").queryName(name)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    keys = key_cols if mode == "update" else None
    return MaterializedView(agg.sparkSession, name, w.start(), key_cols=keys)
