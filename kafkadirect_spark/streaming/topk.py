"""Streaming per-window top-k — continuous "trending keys".

The reference can count per window (KGroupedStream.windowedBy.count)
but has NO ranking primitive: selecting the top-k keys of each closed
window requires a downstream consumer that materializes every count
and sorts (the Yahoo-benchmark post-processing step, done outside the
engine).  Here it composes from pieces Spark already guarantees:

- watermarked tumbling counts in APPEND mode — a window's counts are
  emitted exactly once, all together, in the microbatch after the
  watermark passes window end + grace (final results, the
  suppress-untilWindowCloses contract);
- because arrival is all-at-once-per-window, ranking inside
  foreachBatch over just that batch is complete by construction — no
  cross-batch state, no re-emission, nothing to retract;
- the rank itself is the salted two-phase ``topk_per_group`` from
  functions/curation.py with the window start as the group: few
  windows close per trigger, so the naive single window-per-group
  rank would funnel each window's whole key space through one
  reducer — the exact low-cardinality rank shape the plan lint
  rejects in batch plans.

Scale ledger per trigger: the windowed count's one shuffle (carried
by the streaming aggregation state) + the bounded two-phase rank over
only the CLOSED windows' counts.  Driver holds nothing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def streaming_windowed_topk(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    size: str,
    k: int,
    sink: Callable[[DataFrame, int], None],
    grace: str = "0 seconds",
    checkpoint: str | None = None,
    salt_parts: int = 32,
) -> StreamingQuery:
    """Start the continuous top-k; ``sink(topk_df, batch_id)`` receives
    per trigger the final top-``k`` rows of every window that closed in
    that trigger: (window_start, window_end, key, n, rank).  Ties break
    toward the lexicographically smaller key, so the emission is
    deterministic and replay-idempotent."""
    from kafkadirect_spark.functions.curation import topk_per_group

    counts = (
        stream_df.withWatermark(ts_col, grace)
        .groupBy(F.window(F.col(ts_col), size), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def per_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        flat = batch.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(key_col), F.col("n"))
        ranked = topk_per_group(
            flat, "window_start", "n", k=k,
            tiebreak_col=key_col, salt_parts=salt_parts)
        sink(ranked.select("window_start", "window_end", key_col,
                           "n", "rank"), batch_id)

    writer = counts.writeStream.outputMode("append").foreachBatch(per_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
