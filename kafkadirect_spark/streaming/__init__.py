"""Structured-Streaming equivalents of the reference's stateful
machinery (SURVEY.md §2.6):

- ``suppress``    Suppressed.untilWindowCloses / untilTimeLimit
- ``retraction``  KTable groupBy re-aggregation (adder/subtractor)
- ``transform``   Transformer/Processor API ≙ applyInPandasWithState
"""

from kafkadirect_spark.streaming import retraction, suppress, transform  # noqa: F401
