"""Timestamp extraction policies for invalid/missing event times.

Reference: the TimestampExtractor surface applied at
RecordQueue.java:178 —
- FailOnInvalidTimestamp.java: throw StreamsException;
- LogAndSkipOnInvalidTimestamp.java: drop the record;
- UsePartitionTimeOnInvalidTimestamp.java (née UsePreviousTime):
  substitute the highest valid timestamp seen so far in the partition
  (stream time), throwing if none exists yet;
- WallclockTimestampExtractor.java: ignore record time entirely, use
  processing time.

"Invalid" in Kafka is a negative broker timestamp; here the default
predicate is NULL-or-pre-epoch on the event-time column, overridable.

Spark mapping: each policy is a declarative column transform —
``raise_error`` keeps fail-fast lazy and distributed, ``skip`` is a
filter the scan can push, ``previous`` is a running ``last(ignorenulls)``
window over the record order (pass ``partition_by`` so the fill is
per-partition at scale — a global order is a single-reducer sort,
exactly like the reference's per-partition stream time vs a fictional
global one), and ``wallclock`` is ``current_timestamp()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

POLICIES = ("fail", "skip", "previous", "wallclock")


def _default_invalid(ts: Column) -> Column:
    return ts.isNull() | (ts < F.lit("1970-01-01").cast("timestamp"))


def with_timestamp_policy(
    df: DataFrame,
    ts_col: str,
    on_invalid: str = "fail",
    order_by: str | None = None,
    partition_by: str | Column | None = None,
    invalid: Column | None = None,
) -> DataFrame:
    """Apply a TimestampExtractor policy to ``ts_col``.

    ``on_invalid`` ∈ {fail, skip, previous, wallclock}; ``previous``
    requires ``order_by`` (the record order — offset/sequence column)
    and raises (like UsePartitionTimeOnInvalidTimestamp when no
    partition time exists) if a record precedes every valid timestamp.
    ``invalid`` overrides the NULL-or-pre-epoch predicate.
    """
    if on_invalid not in POLICIES:
        raise ValueError(f"on_invalid must be one of {POLICIES}, got "
                         f"{on_invalid!r}")
    ts = F.col(ts_col)
    bad = invalid if invalid is not None else _default_invalid(ts)

    if on_invalid == "skip":
        return df.filter(~bad)
    if on_invalid == "wallclock":
        return df.withColumn(ts_col, F.current_timestamp())
    if on_invalid == "fail":
        return df.withColumn(
            ts_col,
            F.when(bad, F.raise_error(F.concat(
                F.lit(f"invalid timestamp in '{ts_col}' (extractor policy "
                      "fail, FailOnInvalidTimestamp): "),
                F.coalesce(ts.cast("string"), F.lit("NULL"))))).otherwise(ts),
        )
    # previous: running stream-time fill
    if order_by is None:
        raise ValueError("on_invalid='previous' requires order_by")
    w = Window.orderBy(order_by) if partition_by is None else \
        Window.partitionBy(partition_by).orderBy(order_by)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = F.last(F.when(~bad, ts), ignorenulls=True).over(w)
    return df.withColumn(
        ts_col,
        F.when(filled.isNull(), F.raise_error(F.lit(
            f"no prior valid timestamp in '{ts_col}' to substitute "
            "(extractor policy previous, UsePartitionTimeOnInvalidTimestamp)"
        ))).otherwise(filled),
    )
