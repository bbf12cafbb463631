"""Streaming session windows with an ARBITRARY fold — the
Initializer + Aggregator + Merger surface of
SessionWindowedKStream.aggregate (SessionWindowedKStreamImpl.java;
merge loop KStreamSessionWindowAggregate.java:94-141) for folds the
expression aggregates can't express.

Spark's native ``F.session_window`` covers expression folds (see
core.WindowedGroupedStream); batch custom folds go through
``aggregate_with``.  This module is the remaining quadrant: streaming
+ custom fold.  State lives executor-side in
``applyInPandasWithState`` — per key, a list of OPEN sessions, each
carrying the user's running aggregate:

- a record merges every open session it overlaps (ts within ``gap``
  of the session bounds) into one — the reference's findMergedWindow
  loop — combining aggregates with ``merger``;
- a session emits when the watermark passes ``last_event + gap``
  (nothing can extend it anymore); window end is ``last + gap``, the
  F.session_window convention used across this engine;
- records whose whole session window is already past the watermark
  are dropped (the reference's late-record drop,
  KStreamSessionWindowAggregate.java:107-141).

The user aggregate must be JSON-serializable (it rides in the state
store); per-row Python cost is the same contract as the reference's
user lambdas — this is the escape hatch, not the hot path.  Pandas
dtype caveat for aggregators that string-render or hash values: see
streaming/window_fold.py's module docstring (a null-mixed Arrow
batch widens longs to float64; cast to string JVM-side first).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from kafkadirect_spark.streaming.util import interval_ms as _interval_ms


def streaming_session_aggregate(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str,
    initializer: Callable[[], dict],
    aggregator: Callable[[dict, dict], dict],
    merger: Callable[[dict, dict], dict],
    finisher: Callable[[dict], dict],
    agg_fields: str,
    grace: str = "0 seconds",
) -> DataFrame:
    """Streaming session aggregation with a custom fold.

    ``initializer() → agg``; ``aggregator(agg, row_dict) → agg`` folds
    one record (Aggregator.apply); ``merger(a, b) → agg`` combines two
    sessions' aggregates (Merger.apply); ``finisher(agg) → dict``
    materializes the output columns declared in ``agg_fields`` (e.g.
    ``"best_value int, n long"``).  Returns an append-semantics
    streaming DataFrame with columns
    ``*key_cols, window_start, window_end, *agg_fields``.
    """
    import pandas as pd

    gap_ms = _interval_ms(gap)
    keys = list(key_cols)
    out_fields = ", ".join(
        [f"`{k}` {stream_df.schema[k].dataType.simpleString()}"
         for k in keys]
        + ["window_start timestamp", "window_end timestamp", agg_fields])
    in_cols = stream_df.columns

    def fn(key, pdf_iter, state):
        sessions = json.loads(state.get[0]) if state.exists else []
        wm = state.getCurrentWatermarkMs()
        closed = []

        if not state.hasTimedOut:
            # one sort across ALL arrow chunks of the trigger: a
            # per-chunk sort would still feed a non-commutative
            # aggregator cross-chunk out-of-order folds
            chunks = [c for c in pdf_iter if len(c)]
            for pdf in ([pd.concat(chunks).sort_values(
                    ts_col, kind="stable")] if chunks else []):
                for row in pdf.itertuples(index=False):
                    rd = dict(zip(in_cols, row))
                    ts_ms = int(pd.Timestamp(rd[ts_col]).value // 1_000_000)
                    # findMergedWindow: collect every open session this
                    # record touches (inclusive gap boundary, matching
                    # F.session_window / the batch oracle convention).
                    touch = [s for s in sessions
                             if s["s"] - gap_ms <= ts_ms <= s["e"] + gap_ms]
                    lo = min([ts_ms, *(s["s"] for s in touch)])
                    hi = max([ts_ms, *(s["e"] for s in touch)])
                    if hi + gap_ms <= wm:
                        # The MERGED window is already closed — the
                        # reference drops the record after computing
                        # the merge (mergedWindow.end < closeTime,
                        # KStreamSessionWindowAggregate.java:107-141);
                        # touched stale sessions close unmodified below.
                        continue
                    rest = [s for s in sessions if s not in touch]
                    agg = initializer()
                    for s in sorted(touch, key=lambda s: s["s"]):
                        agg = merger(agg, s["a"])
                    agg = aggregator(agg, rd)
                    sessions = rest + [{"s": lo, "e": hi, "a": agg}]

        still_open = []
        for s in sessions:
            if s["e"] + gap_ms <= wm:
                closed.append(s)
            else:
                still_open.append(s)

        if still_open:
            state.update((json.dumps(still_open),))
            next_due = min(s["e"] + gap_ms for s in still_open)
            state.setTimeoutTimestamp(max(next_due, wm + 1))
        else:
            state.remove()

        if closed:
            rows = []
            for s in sorted(closed, key=lambda s: s["s"]):
                out = dict(zip(keys, key))
                out["window_start"] = pd.Timestamp(s["s"], unit="ms")
                out["window_end"] = pd.Timestamp(s["e"] + gap_ms, unit="ms")
                out.update(finisher(s["a"]))
                rows.append(out)
            yield pd.DataFrame(rows)

    return (
        stream_df.withWatermark(ts_col, grace)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn, out_fields, "sessions string", "append",
            GroupStateTimeout.EventTimeTimeout)
    )
