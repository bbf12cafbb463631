"""Streaming windowed distinct-count — HyperLogLog registers as the
window-fold state.

Exact windowed COUNT(DISTINCT) in streaming needs per-key state
proportional to the number of distinct values seen (Spark refuses
``dropDuplicates`` + windowed count in one query for this reason).
The sketch caps state at ``m = 2^p`` small integers per open window
regardless of stream volume, and its register-min fold is commutative
— record order across microbatch chunks cannot change the result
(the ordering caveat of streaming/window_fold.py does not apply).

Built on ``streaming_windowed_aggregate`` (tumbling/hopping, grace →
watermark, exactly-once final emission per closed window), with the
arithmetic shared with ``functions/sketch.py`` so a streaming window's
``est_distinct`` equals the batch ``hll_distinct`` over the same rows
bit-for-bit (golden-tested in tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafkadirect_spark.functions import sketch
from kafkadirect_spark.streaming.window_fold import streaming_windowed_aggregate


def windowed_distinct_hll(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    advance: str | None = None,
    grace: str = "0 seconds",
    p: int = sketch.P_DEFAULT,
) -> DataFrame:
    """Append-mode streaming DataFrame ``(*key_cols, window_start,
    window_end, est_distinct, nonzero_buckets)`` — the approximate
    number of distinct ``value_col`` values per window, final-on-close.
    Null values are skipped (engine-wide null-key contract)."""

    def aggregator(regs: dict, row: dict) -> dict:
        v = row[value_col]
        if v is not None:
            b, bl = sketch.py_bucket_bitlen(v, p)
            k = str(b)  # JSON state: string keys
            if k not in regs or bl < regs[k]:
                regs[k] = bl
        return regs

    def finisher(regs: dict) -> dict:
        est = sketch.py_estimate({int(k): v for k, v in regs.items()}, p)
        return {"est_distinct": est["est_distinct"],
                "nonzero_buckets": est["nonzero_buckets"]}

    return streaming_windowed_aggregate(
        stream_df, key_cols, ts_col, size,
        initializer=dict, aggregator=aggregator, finisher=finisher,
        agg_fields="est_distinct long, nonzero_buckets long",
        advance=advance, grace=grace)
