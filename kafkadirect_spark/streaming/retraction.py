"""KTable groupBy → aggregate with adder + subtractor (retraction).

Reference: KTable.java:584 → KTableRepartitionMap.java and
KTableAggregate.java:72-98 — on a key's value update the old value is
*subtracted* from its old group and the new value *added* to its new
group, so a re-keyed aggregate over a changing table stays correct.

Spark can't feed an aggregate's own retraction stream into another
aggregate, so the streaming path recomputes from the snapshot per
microbatch (SURVEY.md §7 "What's hard"): ``foreachBatch`` maintains
the latest-by-key table state, then re-aggregates the full snapshot —
the batch semantics, applied incrementally.  The snapshot re-agg is a
shuffle over |distinct keys| (not the changelog length), which is the
bounded-state shape at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def table_group_aggregate(
    snapshot: DataFrame,
    group_exprs: list[Column],
    aggs: list[Column],
) -> DataFrame:
    """Batch/per-batch core: re-aggregate the current latest-by-key
    snapshot.  Retraction collapses — removed/updated old values are
    simply absent from the snapshot (KTableAggregate.java:83 remove ∘
    :98 add ≙ recompute)."""
    return snapshot.groupBy(*group_exprs).agg(*aggs)


def streaming_table_group_aggregate(
    changelog: DataFrame,
    key: str,
    order_by: str,
    group_exprs: list[Column],
    aggs: list[Column],
    sink: Callable[[DataFrame, int], None],
    value_cols: list[str] | None = None,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Streaming retraction via foreachBatch: accumulate the changelog,
    rebuild the latest-by-key snapshot, re-aggregate, hand the result
    to ``sink(df, batch_id)``.

    State is kept as an in-memory accumulated batch union here (test
    scale); a deployment points this at a keyed Delta/parquet upsert
    table instead — the re-agg logic is identical.
    """
    from kafkadirect_spark.core import Table

    acc: dict[str, DataFrame] = {}

    def per_batch(batch: DataFrame, batch_id: int) -> None:
        prev = acc.get("log")
        log = batch if prev is None else prev.unionByName(batch)
        acc["log"] = log.localCheckpoint(eager=True)  # cut lineage growth
        snap = Table.from_changelog(
            acc["log"], key=key, order_by=F.col(order_by),
            value_cols=value_cols).df
        sink(table_group_aggregate(snap, group_exprs, aggs), batch_id)

    w = changelog.writeStream.outputMode("append").foreachBatch(per_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
