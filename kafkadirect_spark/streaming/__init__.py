"""Structured-Streaming equivalents of the reference's stateful
machinery (SURVEY.md §2.6):

- ``suppress``     Suppressed.untilWindowCloses / untilTimeLimit
- ``retraction``   KTable groupBy re-aggregation (adder/subtractor)
- ``transform``    Transformer/Processor API ≙ applyInPandasWithState
- ``sessions``     SessionWindowedKStream.aggregate custom fold
- ``window_fold``  TimeWindowedKStream.aggregate custom fold
- ``interactive``  queryable state (KafkaStreams.store)
- ``asof``         time-correct stream⋈stream as-of enrichment
- ``sketch``       windowed distinct-count (HLL) + space-saving heavy hitters
- ``dedup``        streaming MinHash-LSH near-duplicate candidates
- ``topk``         per-window top-k (salted two-phase rank)
- ``funnel``       event-time ordered-funnel milestones (watermark
                   seal ≙ the batch min-ts cascade for non-late rows)
- ``anomaly``      per-key windowed rate alerts scored against the
                   key's own exact-median history at window close
"""

from kafkadirect_spark.streaming import (  # noqa: F401
    anomaly, asof, dedup, funnel, interactive, retraction, sessions,
    sketch, suppress, topk, transform, window_fold,
)
