"""Structured-Streaming equivalents of the reference's stateful
machinery (SURVEY.md §2.6):

- ``suppress``     Suppressed.untilWindowCloses / untilTimeLimit
- ``retraction``   KTable groupBy re-aggregation (adder/subtractor)
- ``transform``    Transformer/Processor API ≙ applyInPandasWithState
- ``sessions``     SessionWindowedKStream.aggregate custom fold
- ``window_fold``  TimeWindowedKStream.aggregate custom fold
- ``interactive``  queryable state (KafkaStreams.store)
- ``asof``         time-correct stream⋈stream as-of enrichment
"""

from kafkadirect_spark.streaming import (  # noqa: F401
    asof, interactive, retraction, sessions, suppress, transform,
    window_fold,
)
