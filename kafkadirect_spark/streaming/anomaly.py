"""Streaming rate-anomaly alerts — per-key tumbling-window event
counts scored against the key's OWN recent history the moment the
watermark closes each window: the alerting pipeline (error-rate
spike, traffic collapse) that pairs with the batch diagnostics
(`diagnostics.mad_outliers`, `histogram_drift`).

Everything is event-time and integer: windows close exactly once
(append semantics), the baseline is the exact median of the last
``history`` CLOSED window counts, and the deviation is the
truncating ``1000·|count − median| DIV max(median, 1)``.  A window
with no history yet (the first ``min_history`` windows of a key)
reports ``dev_permille`` against whatever history exists and never
alerts — cold keys don't page anyone.

State per key is bounded: open-window partial counts (closed by the
watermark, the same envelope as streaming/window_fold.py) plus a
``history``-length deque of closed counts.

Reference analogue: stream-time windowed counts are §2.4/§2.5
surface; the history-scored alerting on top is beyond parity.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from kafkadirect_spark.streaming.util import interval_ms as _interval_ms


def streaming_rate_alerts(stream_df: DataFrame, key_col: str,
                          ts_col: str, window: str = "1 minute",
                          history: int = 8, min_history: int = 3,
                          threshold_permille: int = 500,
                          grace: str = "0 seconds") -> DataFrame:
    """Append-mode stream of scored window closures
    ``(key_col, window_start, n_events, baseline_median,
    dev_permille, is_alert)`` — one row per (key, tumbling window)
    when the watermark passes its end.  ``is_alert`` is true iff at
    least ``min_history`` closed windows back the median AND the
    deviation exceeds ``threshold_permille``.
    """
    import pandas as pd

    if history < 1 or min_history < 1 or min_history > history:
        raise ValueError("need 1 <= min_history <= history")
    if threshold_permille < 1:
        raise ValueError("threshold_permille must be >= 1")
    win_ms = _interval_ms(window)
    ktype = stream_df.schema[key_col].dataType.simpleString()
    out_fields = (f"`{key_col}` {ktype}, window_start timestamp, "
                  "n_events long, baseline_median long, "
                  "dev_permille long, is_alert boolean")

    def fn(key, pdf_iter, state):
        st = (json.loads(state.get[0]) if state.exists
              else {"open": {}, "hist": []})
        wm = state.getCurrentWatermarkMs()

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                for ts in pdf[ts_col]:
                    ts_ms = int(pd.Timestamp(ts).value // 1_000_000)
                    w0 = ts_ms - ts_ms % win_ms
                    if w0 + win_ms <= wm:
                        continue            # late: window already closed
                    k = str(w0)
                    st["open"][k] = st["open"].get(k, 0) + 1

        rows = []
        for k in sorted(st["open"], key=int):
            w0 = int(k)
            if w0 + win_ms > wm:
                continue
            n = st["open"].pop(k)
            h = sorted(st["hist"])
            med = (h[len(h) // 2] if len(h) % 2
                   else (h[len(h) // 2 - 1] + h[len(h) // 2]) // 2) \
                if h else 0
            dev = 1000 * abs(n - med) // max(med, 1)
            rows.append({
                key_col: key[0],
                "window_start": pd.Timestamp(w0, unit="ms"),
                "n_events": n, "baseline_median": med,
                "dev_permille": dev,
                "is_alert": (len(st["hist"]) >= min_history
                             and dev > threshold_permille)})
            st["hist"] = (st["hist"] + [n])[-history:]

        state.update((json.dumps(st),))
        if st["open"]:
            next_due = min(int(k) + win_ms for k in st["open"])
            state.setTimeoutTimestamp(max(next_due, wm + 1))
        if rows:
            yield pd.DataFrame(rows)

    return (stream_df
            .filter(F.col(key_col).isNotNull())
            .select(key_col, ts_col)
            .withWatermark(ts_col, grace)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_fields, "state string", "append",
                GroupStateTimeout.EventTimeTimeout))
