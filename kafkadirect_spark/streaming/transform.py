"""Custom processors — the reference's Transformer / ValueTransformer /
Processor escape hatch (KStream.java:576,667,737,865; punctuation via
processor timers, StreamTask.java:819).

Spark mapping: ``applyInPandasWithState`` gives keyed state + event/
processing-time timeouts (≙ state stores + punctuation);
``mapInPandas`` covers the stateless transform/flatTransform shapes.
Both are Arrow-batched — the only Python boundaries in the engine.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def transform_values(df: DataFrame, fn: Callable[[Any], Any], schema: str) -> DataFrame:
    """Stateless transform — KStreamTransformValues.java shape: batch
    function over Arrow record batches (``fn``: pandas.DataFrame →
    pandas.DataFrame), key preserved by convention."""
    def gen(it: Iterator) -> Iterator:
        for pdf in it:
            yield fn(pdf)

    return df.mapInPandas(gen, schema=schema)


def process_with_state(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable,
    state_schema: str,
    output_schema: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Stateful processor — Processor API ≙ applyInPandasWithState
    (SURVEY.md §2.6).  ``fn(key, pdf_iter, state: GroupState) →
    Iterator[pandas.DataFrame]``; timers ≙ ``timeout`` in
    {NoTimeout, ProcessingTimeTimeout, EventTimeTimeout}.

    Works on streaming DataFrames (full state semantics).  For batch
    DataFrames Spark has no applyInPandasWithState; we degrade to
    applyInPandas with a fresh per-key no-op state — same fn, same
    output, single-pass semantics (documented divergence: no timers in
    batch)."""
    mode = getattr(GroupStateTimeout, timeout)

    if df.isStreaming:
        return (
            df.groupBy(*key_cols)
            .applyInPandasWithState(fn, output_schema, state_schema,
                                    "update", mode)
        )

    class _BatchState:
        """Minimal GroupState stand-in for the batch path."""

        def __init__(self):
            self._opt = None

        @property
        def exists(self) -> bool:
            return self._opt is not None

        @property
        def get(self):
            if self._opt is None:
                raise ValueError("state is not set")
            return self._opt

        @property
        def getOption(self):
            # property, matching pyspark.sql.streaming.state.GroupState
            return self._opt

        def update(self, v) -> None:
            self._opt = tuple(v)

        def remove(self) -> None:
            self._opt = None

        @property
        def hasTimedOut(self) -> bool:
            return False

        def setTimeoutDuration(self, *_):
            pass

        def setTimeoutTimestamp(self, *_):
            pass

    def batch_fn(key, pdf_iter):
        yield from fn(key, pdf_iter, _BatchState())

    return df.groupBy(*key_cols).applyInPandas(
        lambda key, pdf: _concat(batch_fn(key, iter([pdf]))), output_schema)


def _concat(frames: Iterator):
    import pandas as pd

    out = list(frames)
    return pd.concat(out) if out else pd.DataFrame()
