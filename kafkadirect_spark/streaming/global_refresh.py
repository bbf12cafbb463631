"""GlobalKTable refresh — periodic re-broadcast of a dimension snapshot.

Reference: GlobalKTable.java:50-76 + GlobalStreamThread / GlobalStateUpdateTask:
the global store is continuously updated from its source topic, so a
stream⋈global join on one instance sees dimension updates shortly after
they land.  A Spark broadcast join captures the dimension ONCE at plan
time — fine in batch, silently stale in a long-running stream (SURVEY.md
§7 divergence note).

This helper restores the reference's behavior with an explicit
staleness contract: the dimension snapshot is reloaded (and
re-broadcast) at most every ``refresh_every`` triggers, so an update to
the dimension source is visible to the enrichment within
``refresh_every`` microbatches — the analogue of the global thread's
poll cadence, with the bound stated instead of implied.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def streaming_global_join(
    stream: DataFrame,
    load_dim: Callable[[SparkSession], DataFrame],
    on: Column | str | list[str],
    sink: Callable[[DataFrame, int], None],
    how: str = "inner",
    refresh_every: int = 1,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Start a stream⋈GlobalKTable enrichment whose dimension refreshes.

    ``load_dim(spark)`` builds the CURRENT dimension snapshot (e.g. a
    parquet scan of the dimension path); it is invoked on the first
    trigger and again whenever ``refresh_every`` triggers have passed
    since the last load — every other trigger reuses the cached
    snapshot, so the dimension scan cost is amortized and staleness is
    bounded by ``refresh_every`` microbatches.  ``on`` is the join
    condition — column name(s) for an equi-join, or a Column expression
    built from ``F.col`` NAMES (it must not capture a specific
    DataFrame instance: the dimension frame is rebuilt on refresh; this
    also carries the non-key KeyValueMapper join of KStream.java:846).
    The dimension is broadcast into the join (the GlobalKTable
    full-replication contract); each batch's enriched rows go to
    ``sink(df, batch_id)``.
    """
    if refresh_every < 1:
        raise ValueError("refresh_every must be >= 1")
    state: dict = {"dim": None, "loaded_at": None}

    def per_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if (state["dim"] is None
                or batch_id - state["loaded_at"] >= refresh_every):
            # Materialize the snapshot at load time (localCheckpoint):
            # a lazy scan would re-list source files on every batch —
            # no staleness bound, and a failure if the dimension path
            # was rewritten in place meanwhile.
            state["dim"] = load_dim(spark).localCheckpoint(eager=True)
            state["loaded_at"] = batch_id
        sink(batch.join(F.broadcast(state["dim"]), on, how), batch_id)

    w = stream.writeStream.outputMode("append").foreachBatch(per_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
