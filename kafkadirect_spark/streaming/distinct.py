"""Streaming windowed distinct counts — the portable HLL sketch
(functions/sketch.py) folded inside watermarked per-key state: one
row per (key, tumbling window) with the SAME integer registers and
estimate the batch ``hll_distinct`` produces over that window's rows,
emitted exactly once when the watermark closes the window.

This is the streaming half of the sketch contract: the state holds
``{bucket: min_bitlen}`` registers (≤ m = 2^p entries per open
window, the mergeable-partials shape), arrivals fold with a
per-bucket min — so duplicate values across micro-batches, replays
and out-of-order arrivals all land on the same register and the
closed-window numbers are IDENTICAL to a batch sketch of the same
rows (pinned by the goldens against ``sketch.hll_distinct``).  The
per-value md5 runs in Python inside the state function — the same
portable-hash contract the batch path evaluates JVM-side; the cost
is bounded per micro-batch and the registers, not the values, are
what state carries.

Late records behind a closed window are dropped (the engine-wide
watermark policy); a key's state is removed the moment it has no
open windows left (the ``state.remove()`` discipline of
sessions/window_fold/anomaly).

Reference analogue: windowed counts are SURVEY.md §2.4/§2.5 surface;
the sketch-valued window state is beyond parity (the reference has
no approximate aggregation at all).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from kafkadirect_spark.functions.sketch import (P_DEFAULT, _m,
                                                py_bucket_bitlen,
                                                py_estimate)
from kafkadirect_spark.streaming.util import interval_ms as _interval_ms


def streaming_windowed_distinct(stream_df: DataFrame, key_col: str,
                                ts_col: str, value_col: str,
                                window: str = "1 minute",
                                p: int = P_DEFAULT,
                                grace: str = "0 seconds") -> DataFrame:
    """Append-mode stream of closed-window sketch estimates
    ``(key_col, window_start, nonzero_buckets, sum_pow,
    est_distinct)`` — the exact integer columns of
    ``sketch.hll_estimate``, one row per (key, tumbling window) with
    at least one non-null value, when the watermark passes its end.
    """
    import pandas as pd

    _m(p)                     # range-check p (int64 overflow audit)
    win_ms = _interval_ms(window)
    ktype = stream_df.schema[key_col].dataType.simpleString()
    out_fields = (f"`{key_col}` {ktype}, window_start timestamp, "
                  "nonzero_buckets long, sum_pow long, "
                  "est_distinct long")

    def fn(key, pdf_iter, state):
        st = json.loads(state.get[0]) if state.exists else {"open": {}}
        wm = state.getCurrentWatermarkMs()

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                w0s = (pdf[ts_col].astype("datetime64[ns]")
                       .astype("int64") // 1_000_000
                       // win_ms * win_ms)
                for ts_w0, v in zip(w0s, pdf[value_col]):
                    if v is None:
                        continue          # null values never sketch
                    w0 = int(ts_w0)
                    if w0 + win_ms <= wm:
                        continue          # late: window already closed
                    # v is already Spark's cast-to-string rendering
                    # (see the select below) — str(v) is a no-op, so
                    # the md5 input is byte-identical to the batch
                    # path's JVM-side cast
                    b, bl = py_bucket_bitlen(v, p)
                    regs = st["open"].setdefault(str(w0), {})
                    bk = str(b)
                    regs[bk] = min(regs.get(bk, bl), bl)

        rows = []
        for k in sorted(st["open"], key=int):
            w0 = int(k)
            if w0 + win_ms > wm:
                continue
            regs = {int(b): bl for b, bl in st["open"].pop(k).items()}
            est = py_estimate(regs, p)
            rows.append({
                key_col: key[0],
                "window_start": pd.Timestamp(w0, unit="ms"),
                "nonzero_buckets": est["nonzero_buckets"],
                "sum_pow": est["sum_pow"],
                "est_distinct": est["est_distinct"]})

        if st["open"]:
            state.update((json.dumps(st),))
            next_due = min(int(k) + win_ms for k in st["open"])
            state.setTimeoutTimestamp(max(next_due, wm + 1))
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(rows)

    # cast the value to STRING before it crosses into pandas: a
    # nullable long column would arrive as float64 (str(5.0) != "5")
    # — casting JVM-side makes the md5 input Spark's own canonical
    # rendering for every type, the exact batch-path bytes
    return (stream_df
            .filter(F.col(key_col).isNotNull())
            .select(key_col, ts_col,
                    F.col(value_col).cast("string").alias(value_col))
            .withWatermark(ts_col, grace)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_fields, "state string", "append",
                GroupStateTimeout.EventTimeTimeout))
