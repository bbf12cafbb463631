"""Suppression — emit only final results.

Reference: kstream/Suppressed.java:40,52,76 and the eviction loop in
kstream/internals/suppress/KTableSuppressProcessor.java:71-110: buffer
updates per key, forward only when the window closes (stream time ≥
window end + grace) or on a wall-clock rate limit.

Spark mapping (SURVEY.md §2.6): ``untilWindowCloses`` IS append output
mode on a watermarked windowed aggregation — state is emitted exactly
once, when the watermark passes the window end.  ``untilTimeLimit``
maps to the trigger interval: updates within one trigger coalesce in
the state store and emit at most once per interval.

Note: checkpoint *recovery* (exactly-once restart) requires a durable
sink (parquet/Delta/Kafka); Spark's ``memory`` sink — used in tests —
accepts a checkpoint for state but refuses to restart from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def until_window_closes(windowed_agg: DataFrame, path_or_format: str = "memory",
                        query_name: str = "suppressed",
                        checkpoint: str | None = None) -> DataStreamWriter:
    """Suppressed.untilWindowCloses(unbounded()) — KTableSuppressProcessor
    .java:71-110.  Returns a writer in **append** mode: each window's
    final aggregate is emitted exactly once, after the watermark
    (grace) passes its end.  The upstream aggregation must carry
    ``withWatermark`` (Windows(..., grace=...) does this)."""
    w = windowed_agg.writeStream.outputMode("append").queryName(query_name)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.format(path_or_format)


def until_time_limit(windowed_agg: DataFrame, interval: str,
                     query_name: str = "rate_limited",
                     checkpoint: str | None = None) -> DataStreamWriter:
    """Suppressed.untilTimeLimit(d, maxRecords/maxBytes) — rate-limit
    emission: **update** mode + processingTime trigger ``interval``;
    repeated updates to one key within the interval coalesce in the
    state store (the reference's buffer) and emit once per trigger."""
    w = (windowed_agg.writeStream.outputMode("update")
         .trigger(processingTime=interval).queryName(query_name))
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.format("memory")
